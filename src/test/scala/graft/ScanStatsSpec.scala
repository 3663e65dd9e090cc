package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** Scan statistics through the V1 shim (ScanStats.scala): Spark's join
  * planning must see the engine's exact footer-stat footprint for
  * merge-on-read reads and metadata tables instead of the stats-less
  * `V1ScanWrapper` default (Long.MaxValue = "never broadcast"). At
  * cluster scale a statless small MoR dimension forces a sort-merge
  * join that shuffles the entire fact side — these pins keep the
  * broadcast plan reachable. */
class ScanStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(name: String): GraftCatalog = {
    val wh = Files.createTempDirectory(s"graft-stats-$name-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new GraftCatalog(spark, wh)
  }

  private val cfg = WriteConfig(primaryKey = Seq("id"),
    retryUnitMs = 1, mergeOnRead = true)

  /** A small table with OUTSTANDING equality deletes, so SQL reads take
    * the MoR V1 fallback scan (raw parquet would resurrect rows). */
  private def morTable(cat: GraftCatalog, w: GraftWriter): Unit = {
    w.writeTable("main", "dim",
      Seq((1 to 40).map(i => (i.toLong, s"n$i")).toDF("id", "name")),
      Merge("upsert"), cfg, "l1")
    w.writeTable("main", "dim",
      Seq(Seq((3L, "n3b"), (7L, "n7b")).toDF("id", "name")),
      Merge("upsert"), cfg, "l2")
    val t = cat.loadTable("main", "dim")
    assert(t.metadata.currentSnapshot.exists(_.deletes.nonEmpty),
      "setup: expected outstanding MoR delete files")
  }

  test("MoR fallback scan reports exact footer stats, not Long.MaxValue") {
    val cat = freshCatalog("gst1")
    morTable(cat, new GraftWriter(cat))
    val stats = spark.sql("SELECT * FROM gst1.main.dim")
      .queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes < 1024L * 1024,
      s"MoR scan statless: sizeInBytes=${stats.sizeInBytes}")
    val t = cat.loadTable("main", "dim")
    val expectBytes =
      t.metadata.currentSnapshot.get.dataFiles.map(_.sizeBytes).sum
    assert(stats.sizeInBytes == BigInt(expectBytes),
      s"expected exact $expectBytes, got ${stats.sizeInBytes}")
  }

  test("small MoR table broadcasts in a join without a hint") {
    val cat = freshCatalog("gst2")
    morTable(cat, new GraftWriter(cat))
    val fact = (1 to 5000).map(i => (i.toLong % 40 + 1, i * 10L))
      .toDF("id", "v")
    fact.createOrReplaceTempView("fact_gst2")
    val joined = spark.sql(
      """SELECT f.id, f.v, d.name FROM fact_gst2 f
        |JOIN gst2.main.dim d ON f.id = d.id""".stripMargin)
    assert(joined.count() == 5000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
      s"MoR join did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"sort-merge join chosen:\n$plan")
  }

  test("metadata tables report local-relation stats and broadcast") {
    val cat = freshCatalog("gst3")
    morTable(cat, new GraftWriter(cat))
    val stats = spark.sql("SELECT * FROM gst3.main.dim.history")
      .queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes < 1024L * 1024,
      s"metadata table statless: sizeInBytes=${stats.sizeInBytes}")
    assert(stats.rowCount.contains(BigInt(2)),
      s"history rowCount: ${stats.rowCount}")
  }

  test("rule registration is idempotent per session") {
    V1ScanStatsRule.register(spark)
    V1ScanStatsRule.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ eq V1ScanStatsRule) == 1)
  }
}
