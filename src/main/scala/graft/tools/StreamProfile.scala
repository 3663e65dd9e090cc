package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.GraftCatalog
import graft.streaming.StreamingLoader
import graft.write.{Merge, WriteConfig}

/** Per-micro-batch duration breakdown (queryPlanning / addBatch / state
  * commit / walCommit) for the s4-shaped stream — attributes the wall-time
  * gap that job-level profiling cannot see. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.entry(spark).count()

    val parts = sys.env.getOrElse("SP_PARTS", "8")
    (1 to 2).foreach { run =>
      val t0 = System.nanoTime()
      val prevP = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val cat = new GraftCatalog(spark, Files.createTempDirectory("graft-sp-").toString)
      val loader = new StreamingLoader(cat)
      val src = StreamingLoader.eventsChunkedStream(spark, dir, chunks = 4)
      val q = loader.start(StreamingLoader.dailyRollup(src),
        "main", "daily_rollup", disposition = Merge("upsert"),
        cfg = WriteConfig(retryUnitMs = 10,
          primaryKey = Seq("event_type", "event_day")),
        queryName = s"sp$run",
        checkpoint = Some(Files.createTempDirectory("graft-spck-").toString),
        outputMode = Some("update"))
      try q.awaitTermination() finally q.stop()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"RUN$run total=$total%.2f s")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"triggerExecution=${d.get("triggerExecution")} " +
          s"queryPlanning=${d.get("queryPlanning")} " +
          s"addBatch=${d.get("addBatch")} " +
          s"walCommit=${d.get("walCommit")} " +
          s"commitOffsets=${d.get("commitOffsets")} " +
          s"getBatch=${d.get("getBatch")} " +
          s"latestOffset=${d.get("latestOffset")}")
      }
      spark.conf.set("spark.sql.shuffle.partitions", prevP)
    }
    spark.stop()
  }
}
