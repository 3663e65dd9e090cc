package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.types.TypeLattice
import graft.cast.{CastValidator, CastingError, SafeCast}
import graft.schema.{SchemaEvolution, SchemaEvolutionError}

/** Ports of the reference's schema-machinery unit tiers:
  * test_schema_converter.py (lattice), test_schema_casting.py (loss
  * matrix, strict/non-strict, null-fill, required), test_sparse_schema.py
  * + test_schema_evolution.py (evolution decision tree). */
class SchemaMachinerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // --- TypeLattice (schema_converter.py semantics) ---

  test("narrow ints widen to IntegerType; char/varchar collapse to string") {
    assert(TypeLattice.normalize(ByteType) == IntegerType)
    assert(TypeLattice.normalize(ShortType) == IntegerType)
    assert(TypeLattice.normalize(VarcharType(10)) == StringType)
    assert(TypeLattice.normalize(CharType(4)) == StringType)
    assert(TypeLattice.normalize(LongType) == LongType)
  }

  test("normalization recurses through array/map/struct") {
    val in = StructType(Seq(
      StructField("a", ArrayType(ShortType)),
      StructField("m", MapType(StringType, ByteType)),
      StructField("s", StructType(Seq(StructField("x", ShortType))))))
    val out = TypeLattice.normalize(in)
    assert(out("a").dataType == ArrayType(IntegerType))
    assert(out("m").dataType == MapType(StringType, IntegerType))
    assert(out("s").dataType == StructType(Seq(StructField("x", IntegerType))))
  }

  test("promotions: int->long, float->double, decimal widening only") {
    assert(TypeLattice.canPromote(IntegerType, LongType))
    assert(TypeLattice.canPromote(FloatType, DoubleType))
    assert(TypeLattice.canPromote(DecimalType(10, 2), DecimalType(12, 4)))
    assert(!TypeLattice.canPromote(LongType, IntegerType))
    assert(!TypeLattice.canPromote(DoubleType, FloatType))
    assert(!TypeLattice.canPromote(DecimalType(12, 4), DecimalType(10, 2)))
    assert(!TypeLattice.canPromote(StringType, LongType))
    assert(TypeLattice.canPromote(StringType, StringType))
  }

  // --- CastValidator (schema_casting.py loss matrix) ---

  private def s(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nl) => StructField(n, t, nl) })

  test("float->int is an error; int widening is safe; narrowing is an error") {
    val r1 = CastValidator.validateCast(
      s(("x", DoubleType, true)), s(("x", LongType, true)))
    assert(!r1.isSafe && r1.errors.exists(_.contains("float to integer")))

    val r2 = CastValidator.validateCast(
      s(("x", IntegerType, true)), s(("x", LongType, true)))
    assert(r2.isSafe)

    val r3 = CastValidator.validateCast(
      s(("x", LongType, true)), s(("x", IntegerType, true)))
    assert(!r3.isSafe && r3.errors.exists(_.contains("64-bit integer to 32-bit")))
  }

  test("tz-aware->naive is an error, naive->aware is a warning") {
    val aware2naive = CastValidator.validateCast(
      s(("t", TimestampType, true)), s(("t", TimestampNTZType, true)))
    assert(!aware2naive.isSafe)

    val naive2aware = CastValidator.validateCast(
      s(("t", TimestampNTZType, true)), s(("t", TimestampType, true)))
    assert(naive2aware.isSafe && naive2aware.warnings.nonEmpty)
  }

  test("decimal narrowing errors; widening is safe") {
    val narrow = CastValidator.validateCast(
      s(("d", DecimalType(12, 4), true)), s(("d", DecimalType(10, 2), true)))
    assert(narrow.errors.size == 2) // precision + scale

    val widen = CastValidator.validateCast(
      s(("d", DecimalType(10, 2), true)), s(("d", DecimalType(12, 4), true)))
    assert(widen.isSafe)
  }

  test("string->long errors; binary->string warns; string->binary safe") {
    val s2l = CastValidator.validateCast(
      s(("x", StringType, true)), s(("x", LongType, true)))
    assert(!s2l.isSafe)

    val b2s = CastValidator.validateCast(
      s(("x", BinaryType, true)), s(("x", StringType, true)))
    assert(b2s.isSafe && b2s.warnings.nonEmpty)

    val s2b = CastValidator.validateCast(
      s(("x", StringType, true)), s(("x", BinaryType, true)))
    assert(s2b.isSafe)
  }

  test("source-only field is an error; target-only nullable warns, required errors") {
    val extra = CastValidator.validateCast(
      s(("a", LongType, true), ("b", LongType, true)), s(("a", LongType, true)))
    assert(!extra.isSafe)

    val sparseNullable = CastValidator.validateCast(
      s(("a", LongType, true)), s(("a", LongType, true), ("b", LongType, true)))
    assert(sparseNullable.isSafe && sparseNullable.warnings.nonEmpty)

    val sparseRequired = CastValidator.validateCast(
      s(("a", LongType, true)), s(("a", LongType, true), ("b", LongType, false)))
    assert(!sparseRequired.isSafe)
  }

  // --- SafeCast execution on real DataFrames ---

  import scala.jdk.CollectionConverters._

  test("safe cast null-fills sparse columns and reorders to target order") {
    val df = spark.createDataFrame(
      List(Row(1L, "a"), Row(2L, "b")).asJava,
      s(("id", LongType, true), ("name", StringType, true)))
    val target = s(("score", DoubleType, true), ("id", LongType, true),
      ("name", StringType, true))
    val out = SafeCast(df, target)
    assert(out.columns.toSeq == Seq("score", "id", "name"))
    val rows = out.collect()
    assert(rows.forall(_.isNullAt(0)))
    assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
  }

  test("missing required target column fails even in non-strict mode") {
    val df = spark.createDataFrame(
      List(Row(1L)).asJava, s(("id", LongType, true)))
    val target = s(("id", LongType, true), ("req", StringType, false))
    intercept[CastingError] { SafeCast(df, target, strict = false) }
  }

  test("strict mode blocks lossy casts; non-strict proceeds") {
    val df = spark.createDataFrame(
      List(Row(1.5), Row(2.7)).asJava, s(("x", DoubleType, true)))
    val target = s(("x", LongType, true))
    intercept[CastingError] { SafeCast(df, target, strict = true) }
    val out = SafeCast(df, target, strict = false).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L)) // truncated
  }

  test("int->long promotion casts cleanly in strict mode") {
    val df = spark.createDataFrame(
      List(Row(7), Row(8)).asJava, s(("x", IntegerType, true)))
    val out = SafeCast(df, s(("x", LongType, true)), strict = true)
    assert(out.schema("x").dataType == LongType)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
  }

  // --- SchemaEvolution decision tree ---

  test("added nullable column evolves the schema") {
    val existing = s(("id", LongType, true), ("et", StringType, true))
    val incoming = s(("id", LongType, true), ("et", StringType, true),
      ("new_field", StringType, true))
    val r = SchemaEvolution.evolve(existing, incoming)
    assert(r.evolved && r.schema.fieldNames.contains("new_field"))
  }

  test("type promotion int->long evolves; string->long raises") {
    val existing = s(("id", IntegerType, true))
    val r = SchemaEvolution.evolve(existing, s(("id", LongType, true)))
    assert(r.evolved && r.schema("id").dataType == LongType)

    intercept[SchemaEvolutionError] {
      SchemaEvolution.evolve(s(("id", StringType, true)), s(("id", LongType, true)))
    }
  }

  test("sparse batch (nullable column absent): schema kept, not evolved") {
    // test_sparse_schema.py:80-106 — wide table receives narrow batch
    val existing = s(("id", LongType, true), ("name", StringType, true),
      ("score", DoubleType, true))
    val incoming = s(("id", LongType, true), ("name", StringType, true))
    val r = SchemaEvolution.evolve(existing, incoming, allowColumnDrops = false)
    assert(!r.evolved && r.schema == existing)
  }

  test("allow_column_drops drops the absent column") {
    // test_sparse_schema.py:268-311
    val existing = s(("id", LongType, true), ("score", DoubleType, true))
    val incoming = s(("id", LongType, true))
    val r = SchemaEvolution.evolve(existing, incoming, allowColumnDrops = true)
    assert(r.evolved && r.schema.fieldNames.toSeq == Seq("id"))
  }

  test("absent required column raises even without drops allowed") {
    // test_sparse_schema.py:182-217
    val existing = s(("id", LongType, false), ("req", StringType, false))
    val incoming = s(("id", LongType, false))
    intercept[SchemaEvolutionError] {
      SchemaEvolution.evolve(existing, incoming, allowColumnDrops = false)
    }
  }

  test("mixed add+sparse: evolves with both kept, sparse retained") {
    val existing = s(("id", LongType, true), ("old", StringType, true))
    val incoming = s(("id", LongType, true), ("fresh", DoubleType, true))
    val r = SchemaEvolution.evolve(existing, incoming)
    assert(r.evolved)
    assert(r.schema.fieldNames.toSeq == Seq("id", "old", "fresh"))
  }

  // --- Nested-struct evolution (schema_casting.py:63-69 recursion) ---

  private def nested(fields: (String, DataType, Boolean)*): StructType =
    StructType(fields.map { case (n, t, nl) => StructField(n, t, nl) })

  test("nested: adding a nullable field inside a struct evolves field-wise") {
    val existing = s(("id", LongType, true),
      ("meta", nested(("a", IntegerType, true)), true))
    val incoming = s(("id", LongType, true),
      ("meta", nested(("a", IntegerType, true), ("b", StringType, true)), true))
    val r = SchemaEvolution.evolve(existing, incoming)
    assert(r.evolved)
    assert(r.schema("meta").dataType ==
      nested(("a", IntegerType, true), ("b", StringType, true)))
  }

  test("nested: sparse struct batch (missing nullable nested field) is no evolution") {
    val existing = s(("id", LongType, true),
      ("meta", nested(("a", IntegerType, true), ("b", StringType, true)), true))
    val incoming = s(("id", LongType, true),
      ("meta", nested(("a", IntegerType, true)), true))
    val r = SchemaEvolution.evolve(existing, incoming)
    assert(!r.evolved && r.schema == existing)
  }

  test("nested: int->long promotion inside a struct; unsafe nested change raises") {
    val existing = s(("meta", nested(("a", IntegerType, true)), true))
    val good = s(("meta", nested(("a", LongType, true)), true))
    val r = SchemaEvolution.evolve(existing, good)
    assert(r.evolved && r.schema("meta").dataType == nested(("a", LongType, true)))
    val bad = s(("meta", nested(("a", StringType, true)), true))
    intercept[SchemaEvolutionError] { SchemaEvolution.evolve(existing, bad) }
  }

  test("nested: missing required nested field raises") {
    val existing = s(("meta", nested(("a", IntegerType, false)), true))
    val incoming = s(("meta", nested(("b", StringType, true)), true))
    intercept[SchemaEvolutionError] { SchemaEvolution.evolve(existing, incoming) }
  }

  test("nested: safe cast rebuilds structs by name — null-fill, promote, keep NULLs") {
    import org.apache.spark.sql.functions.col
    val srcSchema = s(("id", LongType, true),
      ("meta", nested(("a", IntegerType, true)), true))
    val target = s(("id", LongType, true),
      ("meta", nested(("a", LongType, true), ("b", StringType, true)), true))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, Row(7)))
    rows.add(Row(2L, null)) // struct-level NULL must survive the rebuild
    val df = spark.createDataFrame(rows, srcSchema)
    val out = SafeCast(df, target)
    assert(out.schema == target)
    val got = out.orderBy(col("id")).collect()
    assert(got(0).getStruct(1) == Row(7L, null))
    assert(got(1).isNullAt(1), "NULL struct became non-null in the rebuild")
  }

  test("nested: optional->required is not a promotion; map keys cast on promote") {
    // a null-bearing nested field cannot become required retroactively
    val opt = nested(("a", IntegerType, true))
    val req = nested(("a", IntegerType, false))
    assert(!TypeLattice.canPromote(opt, req))
    assert(TypeLattice.canPromote(req, opt), "required->optional is safe")

    // map KEY promotion must actually cast the keys, not just validate
    val srcSchema = s(("m", MapType(IntegerType, StringType), true))
    val target = s(("m", MapType(LongType, StringType), true))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(Map(1 -> "x")))
    val out = SafeCast(spark.createDataFrame(rows, srcSchema), target)
    assert(out.schema == target)
    assert(out.collect()(0).getMap[Long, String](0) == Map(1L -> "x"))
  }

  test("nested: array-of-struct element evolution casts through transform") {
    val srcSchema = s(("xs", ArrayType(nested(("a", IntegerType, true))), true))
    val target = s(("xs",
      ArrayType(nested(("a", LongType, true), ("b", DoubleType, true))), true))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(Seq(Row(1), Row(2))))
    val out = SafeCast(spark.createDataFrame(rows, srcSchema), target)
    assert(out.schema == target)
    assert(out.collect()(0).getSeq[Row](0) == Seq(Row(1L, null), Row(2L, null)))
  }

  // --- TIME (the reference's last type-lattice row: Arrow time →
  //     Iceberg micros TIME — schema_converter.py:134-135, the
  //     time32→time64(us) compat rule at schema_casting.py:47-48) ---

  test("TIME normalizes to micros; precision widening promotes, narrowing errors") {
    assert(TypeLattice.normalize(TimeType(3)) == TimeType(6))
    assert(TypeLattice.normalize(TimeType(0)) == TimeType(6))
    assert(TypeLattice.normalize(TimeType(6)) == TimeType(6))
    assert(TypeLattice.canPromote(TimeType(3), TimeType(6)))
    assert(!TypeLattice.canPromote(TimeType(6), TimeType(3)))
    val down = CastValidator.validateCast(
      s(("t", TimeType(6), true)), s(("t", TimeType(0), true)))
    assert(!down.isSafe && down.errors.exists(_.contains("fractional seconds")))
    val up = CastValidator.validateCast(
      s(("t", TimeType(0), true)), s(("t", TimeType(6), true)))
    assert(up.isSafe)
    // string->time stays an error (the general string rule)
    assert(!CastValidator.validateCast(
      s(("t", StringType, true)), s(("t", TimeType(6), true))).isSafe)
  }

  test("TIME round-trips through the engine write path with micros-of-day stats") {
    spark.conf.set("spark.sql.timeType.enabled", "true")
    val wh = java.nio.file.Files.createTempDirectory("graft-time-").toString
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    val w = new graft.write.GraftWriter(cat)
    val df = spark.sql(
      """SELECT id, make_time(CAST(id % 24 AS INT), CAST(id % 60 AS INT),
        |  CAST(id % 60 AS DOUBLE) + 0.25) AS t
        |FROM range(0, 100)""".stripMargin)
    w.writeTable("main", "tt", Seq(df), graft.write.Append,
      graft.write.WriteConfig(retryUnitMs = 1), "l1")
    val t = cat.loadTable("main", "tt")
    assert(t.metadata.schema("t").dataType == TimeType(6))
    val back = t.read().collect().map(r =>
      (r.getLong(0), r.getAs[java.time.LocalTime](1))).sortBy(_._1)
    assert(back.length == 100)
    assert(back(1)._2 == java.time.LocalTime.of(1, 1, 1, 250000000))
    // stats encoded as micros-of-day (min row: id=0 -> 00:00:00.25),
    // aggregated across staged files — staging may split the batch
    val sts = t.metadata.currentFiles.flatMap(_.stats.get("t"))
    assert(sts.nonEmpty)
    assert(sts.flatMap(_.min).map(_.toLong).min == 250000L)
    assert(sts.flatMap(_.max).map(_.toLong).max < 86400L * 1000000L)
    // partitioning by TIME refuses loudly
    intercept[IllegalArgumentException] {
      graft.partition.Transforms.validate("identity", None, TimeType(6), "t")
    }
  }
}
