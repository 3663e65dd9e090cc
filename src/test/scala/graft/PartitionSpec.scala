package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{IcebergBucket, IcebergHash}
import graft.partition.{PartitionHint, Transforms}

/** Ports of test_partition_builder.py (transform x type matrix, invalid
  * combos raise) + Iceberg-spec hash fidelity vectors. */
class PartitionTransformSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    graft.functions.GraftFunctions.register(s)
    s
  }
  import spark.implicits._

  // --- hash fidelity: published test vectors from the Iceberg table spec,
  // Appendix B ("32-bit Hash Requirements") ---

  test("iceberg hash matches spec vectors") {
    assert(IcebergHash.hashInt(34) == 2017239379)
    assert(IcebergHash.hashLong(34L) == 2017239379)
    assert(IcebergHash.hashString("iceberg") == 1210000089)
    // date 2017-11-16 = 17486 days since epoch
    assert(IcebergHash.hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert(IcebergHash.hashLong(1510871468000000L) == -2047944441)
    // decimal 14.20 hashes minimal two's-complement of unscaled 1420
    assert(IcebergHash.hashDecimal(new java.math.BigDecimal("14.20")) == -500754589)
  }

  test("bucket expression assigns spec-faithful buckets, codegen and eval agree") {
    val df = Seq(34L, 1L, 2L, 1000L).toDF("k")
      .withColumn("b", IcebergBucket(16, col("k")))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(34L) == (2017239379 & Int.MaxValue) % 16)
    // string bucketing
    val sdf = Seq("iceberg").toDF("s").withColumn("b", IcebergBucket(16, col("s")))
    assert(sdf.collect()(0).getInt(1) == (1210000089 & Int.MaxValue) % 16)
  }

  // --- parse (partition_builder.py:52-78) ---

  test("parse hint: parameterized and simple") {
    assert(Transforms.parseHint("bucket[10]") == ("bucket", Some(10)))
    assert(Transforms.parseHint("truncate[4]") == ("truncate", Some(4)))
    assert(Transforms.parseHint("month") == ("month", None))
    assert(Transforms.parseHint("identity") == ("identity", None))
  }

  // --- validation matrix (partition_builder.py:81-133) ---

  test("temporal transforms only on timestamp/date") {
    Transforms.validate("month", None, TimestampType, "ts")
    Transforms.validate("day", None, DateType, "d")
    Transforms.validate("hour", None, TimestampNTZType, "ts")
    intercept[IllegalArgumentException] {
      Transforms.validate("year", None, StringType, "s")
    }
    intercept[IllegalArgumentException] {
      Transforms.validate("month", None, LongType, "x")
    }
  }

  test("bucket: positive param required, binary rejected") {
    Transforms.validate("bucket", Some(10), LongType, "k")
    Transforms.validate("bucket", Some(5), StringType, "k")
    intercept[IllegalArgumentException] { Transforms.validate("bucket", None, LongType, "k") }
    intercept[IllegalArgumentException] { Transforms.validate("bucket", Some(0), LongType, "k") }
    intercept[IllegalArgumentException] { Transforms.validate("bucket", Some(4), BinaryType, "b") }
  }

  test("truncate: positive param, only string/int/long/decimal/binary") {
    Transforms.validate("truncate", Some(4), StringType, "s")
    Transforms.validate("truncate", Some(10), LongType, "x")
    Transforms.validate("truncate", Some(2), DecimalType(10, 2), "d")
    Transforms.validate("truncate", Some(2), BinaryType, "b")
    intercept[IllegalArgumentException] { Transforms.validate("truncate", Some(0), StringType, "s") }
    intercept[IllegalArgumentException] { Transforms.validate("truncate", Some(4), DoubleType, "f") }
    intercept[IllegalArgumentException] { Transforms.validate("truncate", Some(4), TimestampType, "t") }
  }

  test("unknown transform raises") {
    intercept[IllegalArgumentException] { Transforms.validate("zigzag", None, LongType, "x") }
  }

  // --- spec building + defaults (partition_builder.py:136-286) ---

  private val schema = StructType(Seq(
    StructField("event_date", DateType),
    StructField("region", StringType),
    StructField("user_id", LongType),
    StructField("amount", DoubleType)))

  test("spec builder: explicit transforms, default names, custom names") {
    val spec = Transforms.buildSpec(Seq(
      PartitionHint.day("event_date"),
      PartitionHint.identity("region"),
      PartitionHint.bucket(10, "user_id")), schema)
    assert(spec.map(_.name) == Seq("event_date_day", "region_identity", "user_id_bucket_10"))
    assert(spec.map(_.transform) == Seq("day", "identity", "bucket"))
    assert(spec(2).param.contains(10))

    val custom = Transforms.buildSpec(
      Seq(PartitionHint.month("event_date", "event_month")), schema)
    assert(custom.head.name == "event_month")
  }

  test("defaults: temporal->month, discrete->identity, other->identity") {
    val spec = Transforms.buildSpec(Seq(
      PartitionHint("event_date"), PartitionHint("region"), PartitionHint("amount")), schema)
    assert(spec.map(_.transform) == Seq("month", "identity", "identity"))
  }

  test("unknown partition column is skipped, like the reference") {
    val spec = Transforms.buildSpec(Seq(PartitionHint("nope")), schema)
    assert(spec.isEmpty)
  }

  // --- transform expressions produce the right values ---

  test("temporal + truncate expressions evaluate correctly") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-03-15 13:45:00"), "abcdef", 1234L)
    ).toDF("ts", "s", "n")
    val specs = Transforms.buildSpec(Seq(
      PartitionHint.year("ts"), PartitionHint.month("ts"),
      PartitionHint.day("ts"), PartitionHint.hour("ts"),
      PartitionHint.truncate(3, "s"), PartitionHint.truncate(100, "n")),
      df.schema.asInstanceOf[StructType])
    val out = specs.foldLeft(df) { (d, sp) =>
      d.withColumn(sp.name, Transforms.expression(sp, df.schema(sp.source).dataType))
    }.collect()(0)
    assert(out.getAs[Int]("ts_year") == 2024)
    assert(out.getAs[String]("ts_month") == "2024-03")
    assert(out.getAs[java.sql.Date]("ts_day").toString == "2024-03-15")
    assert(out.getAs[String]("ts_hour") == "2024-03-15-13")
    assert(out.getAs[String]("s_truncate_3") == "abc")
    assert(out.getAs[Long]("n_truncate_100") == 1200L)
  }

  test("iceberg ordinal transforms match the spec's epoch arithmetic") {
    val df = Seq((java.sql.Timestamp.valueOf("2017-11-16 22:31:08"), 1L))
      .toDF("ts", "x")
    val specs = Transforms.buildSpec(Seq(
      PartitionHint.year("ts", "y"), PartitionHint.month("ts", "m"),
      PartitionHint.day("ts", "d"), PartitionHint.hour("ts", "h")),
      df.schema.asInstanceOf[org.apache.spark.sql.types.StructType])
    val out = specs.foldLeft(df) { (d, sp) =>
      d.withColumn(sp.name, Transforms.icebergOrdinalExpression(sp,
        df.schema(sp.source).dataType))
    }.collect()(0)
    // Iceberg table-spec examples for 2017-11-16T22:31:08
    assert(out.getAs[Int]("y") == 47)      // years since 1970
    assert(out.getAs[Int]("m") == 574)     // months since 1970-01
    assert(out.getAs[Int]("d") == 17486)   // days since epoch
    assert(out.getAs[Int]("h") == 419686)  // hours since epoch (17486*24+22)
  }
}
