package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Per-job wall-time profile of one driver query: prints every Spark job's
  * duration and callsite so fixed per-load action overhead is attributable
  * (which writer/stream phase pays it), instead of guessed. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.SparkEntry.entry(spark).count() // warmup

    val starts = TrieMap.empty[Int, (Long, String)]
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .orElse(Option(js.properties.getProperty("callSite.short")))
            .getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, site) =>
          rows.add((je.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
    })

    args.foreach { q =>
      rows.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener events drain
      val all = scala.jdk.CollectionConverters.IteratorHasAsScala(rows.iterator()).asScala.toSeq
      println(f"PROFILE $q total=$total%.2f s jobs=${all.size} jobTime=${all.map(_._2).sum}%.2f s")
      all.sortBy(_._1).foreach { case (id, t, site) =>
        println(f"  job $id%3d $t%6.3f s  $site")
      }
    }
    spark.stop()
  }
}
