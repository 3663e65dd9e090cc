package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** Runtime join filtering over catalog scans: Spark's InjectRuntimeFilter
  * turns `fact ⋈ σ(dim)` into a bloom-filtered fact scan when both sides
  * shuffle — the 100 TB shape where the dim filter is selective but the
  * dim is too big to broadcast. This must keep working through the graft
  * V2 catalog's parquet delegation (it would silently stop if the scan
  * ever became a stats-less black box to the optimizer). */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bloom runtime filter fires on a shuffle join of two catalog tables") {
    val wh = Files.createTempDirectory("graft-rtf-").toString
    spark.conf.set("spark.sql.catalog.grtf",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.grtf.warehouse", wh)
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    val cfg = WriteConfig(retryUnitMs = 1)
    w.writeTable("main", "fact",
      Seq((1 to 20000).map(i => (i.toLong % 500, i.toLong)).toDF("k", "v")),
      Append, cfg, "l1")
    w.writeTable("main", "dim",
      Seq((1 to 500).map(i => (i.toLong, s"d$i", i % 7)).toDF("k", "name", "grp")),
      Append, cfg, "l2")

    val conf = spark.conf
    val savedThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedRowThresh = conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    try {
      // force the shuffle-join shape (no broadcast) and let the bloom
      // filter build on the filtered dim side regardless of its size
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val q = spark.sql(
        """SELECT f.v, d.name FROM grtf.main.fact f
          |JOIN grtf.main.dim d ON f.k = d.k
          |WHERE d.grp = 3""".stripMargin)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
          optimized.contains("BloomFilterMightContain") ||
          optimized.toLowerCase.contains("mightcontain"),
        s"no runtime bloom filter injected:\n$optimized")
      assert(q.count() > 0)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedThresh)
      savedRowThresh.foreach(v => conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", v))
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10GB")
    }
  }
}
