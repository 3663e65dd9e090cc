package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Input timestamp-representation pin. The driver's 2026-08-13 testdata
  * regen switched parquet timestamps from TIMESTAMP(NANOS) to plain
  * TIMESTAMP(MICROS) without the adjusted-to-UTC flag — Spark 4 infers
  * TIMESTAMP_NTZ, which Structured Streaming watermarks
  * (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and `unix_micros` reject; five
  * driver queries silently dropped out of CORRECTNESS_r07 this way.
  * These cases synthesize an NTZ events table and pin that every loader
  * normalizes to TimestampType with UTC-identical wall-clock values,
  * whatever representation the next regen picks. */
class NtzInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A tiny events.parquet whose ts is TIMESTAMP_NTZ. */
  private lazy val ntzDir: String = {
    val dir = Files.createTempDirectory("graft-ntz-").toString
    import spark.implicits._
    (0 until 256).map(i =>
      (i.toLong, s"2026-01-0${1 + i % 7} 0${i % 10}:1${i % 6}:00",
        (i % 17).toLong, if (i % 3 == 0) "view" else "purchase", i / 10.0,
        "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("to_timestamp_ntz(ts_s)")).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/stage")
    // single canonical file name, like the driver's layout
    val part = graft.catalog.PathIO.list(java.nio.file.Paths.get(s"$dir/stage"))
      .filter(_.getFileName.toString.endsWith(".parquet")).head
    Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  test("Tables.t normalizes NTZ columns to TimestampType, values intact") {
    val raw = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType) // fixture honest
    val normalized = Tables.t(spark, ntzDir, "events")
    assert(normalized.schema("ts").dataType == TimestampType)
    // session TZ is UTC: wall-clock strings must be bit-identical
    val a = raw.select(col("event_id"), col("ts").cast("string"))
      .orderBy("event_id").collect().map(_.getString(1))
    val b = normalized.select(col("event_id"), col("ts").cast("string"))
      .orderBy("event_id").collect().map(_.getString(1))
    assert(a.sameElements(b))
  }

  test("file stream over NTZ input supports event-time watermarks") {
    val src = graft.streaming.StreamingLoader.eventsStream(spark, ntzDir)
    assert(src.schema("ts").dataType == TimestampType)
    val q = graft.streaming.StreamingLoader.dailyRollup(src)
      .writeStream.queryName("ntz_spec_out").outputMode("complete")
      .format("memory").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ntz_spec_out")
    assert(streamed.count() > 0)
    // parity with the batch rollup over the normalized table
    val batch = graft.streaming.StreamingLoader
      .dailyRollup(Tables.t(spark, ntzDir, "events"))
    assert(streamed.orderBy("event_type", "event_day").collect()
      .sameElements(batch.orderBy("event_type", "event_day").collect()))
  }

  test("chunked stream stages NTZ input as watermark-compatible chunks") {
    val src = graft.streaming.StreamingLoader
      .eventsChunkedStream(spark, ntzDir, chunks = 2)
    assert(src.schema("ts").dataType == TimestampType)
  }
}
