package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.GraftCatalog
import graft.streaming.StreamingLoader
import graft.write.WriteConfig

/** Streaming veneer: micro-batches inherit the commit protocol — one
  * snapshot per batch, results identical to the batch path. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("windowed streaming agg equals the batch aggregation") {
    val q = StreamingLoader.dailyRollup(StreamingLoader.eventsStream(spark, sf))
      .writeStream.queryName("st_spec_out").outputMode("complete")
      .format("memory").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("st_spec_out")
      .orderBy("event_type", "event_day").collect()
    // withWatermark is a no-op on a batch frame, so the same rollup runs both ways
    val batch = StreamingLoader.dailyRollup(Tables.t(spark, sf, "events"))
      .orderBy("event_type", "event_day").collect()
    assert(streamed.sameElements(batch))
  }

  test("foreachBatch sink commits snapshots readable mid-stream") {
    val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-ss-").toString)
    val loader = new StreamingLoader(cat)
    val q = loader.start(StreamingLoader.eventsStream(spark, sf),
      "main", "ev", cfg = WriteConfig(retryUnitMs = 1), queryName = "ss",
      checkpoint = Some(Files.createTempDirectory("graft-ck-").toString))
    try q.awaitTermination() finally q.stop()
    val t = cat.loadTable("main", "ev")
    assert(t.read().count() == Tables.t(spark, sf, "events").count())
    assert(t.metadata.snapshots.nonEmpty)
    assert(t.metadata.snapshots.forall(_.loadId.get.startsWith("ss-batch-")))
  }
}
