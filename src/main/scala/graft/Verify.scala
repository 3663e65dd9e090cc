package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated entry-name subset (the sf10
    // scale gate runs the expensive tail without paying for all 137)
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        classOf[graft.catalog.GraftSqlExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Queries are independent (scratch catalogs are per-call, temp-view
    // registration is guarded); run them on a small pool so Spark can
    // overlap scheduling gaps — cuts wall time roughly in half.
    val parallelism = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    val failures = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val tasks = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            failures.put(name, String.valueOf(e.getMessage))
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // subset mode: record which entries actually ran so check_oracle
    // judges only those (the sf10 scale gate runs the expensive tail)
    only.foreach { names =>
      Files.writeString(Paths.get(s"$outDir/_verify_ran.json"),
        names.toSeq.sorted.map(q).mkString("[", ",", "]"))
    }
    // full run: a STALE subset marker from an earlier run into the same
    // outDir would make check_oracle silently judge only that subset —
    // remove it so a full run is always judged in full
    if (only.isEmpty)
      Files.deleteIfExists(Paths.get(s"$outDir/_verify_ran.json"))
    // A thrown query leaves NO output dir, which the driver's compare
    // reports by omission — round 7 lost 5 entries this way without any
    // visible signal. Persist the failure map (empty {} on a clean run)
    // and shout on stdout so a dropped query is always loud.
    val failJson = failures.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_verify_failures.json"), failJson)
    if (!failures.isEmpty)
      println(s"[verify] ${failures.size} QUERIES FAILED: " +
        failures.asScala.keys.toSeq.sorted.mkString(", "))
    spark.stop()
  }
}
