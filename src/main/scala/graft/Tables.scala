package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Base-table access for the driver-provided parquet test tables
  * (TESTDATA.md). Mirrors the reference's per-query view registration
  * (`sql_client.py:101-149` registers a fresh view per table before each
  * query); here the "view" is just `spark.read.parquet` + a temp view.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The driver's 2026-08-13 testdata regen writes parquet timestamps
    * without the adjusted-to-UTC flag, which Spark 4 infers as
    * TIMESTAMP_NTZ. Structured Streaming watermarks and `unix_micros`
    * reject NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE — this silently
    * dropped s1/s4/s5/s6/q34 from CORRECTNESS_r07). The session time
    * zone is pinned to UTC, so casting NTZ→TIMESTAMP preserves every
    * wall-clock value; rounds 1-6 ran green with TimestampType
    * throughout, making this the proven representation. */
  private[graft] def ntzToUtc(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name != "events") ntzToUtc(spark.read.parquet(s"$dir/$name.parquet"))
    else {
      // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
      // reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long (legacy
      // conf) and rebuild a proper µs TimestampType column — microsecond
      // truncation matches the reference's own precision cap (timestamp
      // precision 6, destination_client.py:1581). The conf only matters
      // during the eager schema conversion inside `spark.read.parquet`
      // (verified: execution after restore still reads fine), so save and
      // restore it — library code must not leave global session state
      // flipped under user code sharing the session.
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      val raw =
        try spark.read.parquet(s"$dir/$name.parquet")
        finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      if (raw.schema("ts").dataType == LongType)
        ntzToUtc(raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
      else ntzToUtc(raw)
    }

  // Re-registering 10 parquet tables (footer reads + schema inference) per
  // query call costs seconds; cache per (session, dir). "Always replace
  // view" in the reference (sql_client.py:51-55) exists to pick up new
  // snapshots — the driver test tables are immutable, so caching is sound.
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  /** Register every base table as a temp view so `spark.sql` can run the
    * same ANSI SQL text that the DuckDB oracle runs. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    registeredDir.synchronized {
      if (registeredDir.put(System.identityHashCode(spark), dir) != dir)
        all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    }
}
