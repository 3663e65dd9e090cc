package graft.tools
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        classOf[graft.catalog.GraftSqlExtensions].getName)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.SparkEntry.entry(spark).count()
    args.foreach { q =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).count()
        println(f"QTIME $q run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
