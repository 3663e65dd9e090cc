package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog._
import graft.write._

/** Filter overwrite: one snapshot removes the matching rows and appends
  * the new batch, restaging ONLY the files that held matches. */
class OverwriteWhereSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(name: String): GraftCatalog = {
    val wh = Files.createTempDirectory(s"graft-ow-$name-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new GraftCatalog(spark, wh)
  }

  test("REPLACE WHERE swaps one key range in one snapshot; others survive by path") {
    val cat = freshCatalog("gow")
    val w = new GraftWriter(cat)
    // two loads -> two files with disjoint key ranges
    w.writeTable("main", "t",
      Seq((1 to 50).map(i => (i.toLong, s"old$i")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1, clusterByKeys = false), "l1")
    w.writeTable("main", "t",
      Seq((51 to 100).map(i => (i.toLong, s"old$i")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1, clusterByKeys = false), "l2")
    val before = cat.loadTable("main", "t").metadata
    val lowFiles = before.currentFiles.filter(f =>
      f.stats.get("id").exists(_.max.exists(_.toLong <= 50)))
    assert(lowFiles.nonEmpty && lowFiles.size < before.currentFiles.size)

    (101 to 110).map(i => (i.toLong, s"new$i")).toDF("id", "v")
      .createOrReplaceTempView("ow_src")
    spark.sql(
      "INSERT INTO gow.main.t REPLACE WHERE id > 50 SELECT id, v FROM ow_src")

    val after = cat.loadTable("main", "t").metadata
    assert(after.snapshots.size == before.snapshots.size + 1,
      "filter overwrite must be ONE snapshot")
    // the low-range files survive by identity; the high-range ones went
    val afterPaths = after.currentFiles.map(_.path).toSet
    assert(lowFiles.forall(f => afterPaths.contains(f.path)),
      "files with no matching rows must carry by path")
    val got = spark.sql("SELECT id, v FROM gow.main.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = (1 to 50).map(i => (i.toLong, s"old$i")) ++
      (101 to 110).map(i => (i.toLong, s"new$i"))
    assert(got.toSeq == want)
  }

  test("static INSERT OVERWRITE PARTITION rewrites exactly that partition") {
    val cat = freshCatalog("gow2")
    val w = new GraftWriter(cat)
    w.writeTable("main", "p",
      Seq(Seq((1L, "a", "x1"), (2L, "a", "x2"), (3L, "b", "x3"))
        .toDF("id", "grp", "v")),
      Append, WriteConfig(retryUnitMs = 1,
        partitions = Seq(graft.partition.PartitionHint.identity("grp"))), "l1")
    Seq((10L, "a", "fresh")).toDF("id", "grp", "v")
      .createOrReplaceTempView("ow_src2")
    spark.sql("INSERT OVERWRITE gow2.main.p PARTITION (grp = 'a') " +
      "SELECT id, v FROM ow_src2")
    val got = spark.sql("SELECT id, grp, v FROM gow2.main.p ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((3L, "b", "x3"), (10L, "a", "fresh")), got.toSeq)
  }

  test("overwrite after a merge-on-read delete keeps only live rows") {
    val cat = freshCatalog("gow3")
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    // MoR delete of id=1 (delete file, no rewrite)
    w.deleteWhere("main", "t", col("id") === 1L,
      WriteConfig(retryUnitMs = 1, mergeOnRead = true), "d1")
    Seq((100L, "n")).toDF("id", "v").createOrReplaceTempView("ow_src3")
    spark.sql(
      "INSERT INTO gow3.main.t REPLACE WHERE id >= 8 SELECT id, v FROM ow_src3")
    val got = spark.sql("SELECT id FROM gow3.main.t ORDER BY id").collect()
      .map(_.getLong(0))
    // 1 deleted (MoR), 8..10 overwritten away, 100 inserted
    assert(got.toSeq == Seq(2L, 3L, 4L, 5L, 6L, 7L, 100L), got.toSeq)
  }
}
