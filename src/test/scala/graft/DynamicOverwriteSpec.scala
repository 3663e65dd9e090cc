package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** Dynamic partition overwrite: INSERT OVERWRITE under
  * partitionOverwriteMode=dynamic replaces exactly the partitions
  * present in the batch — one snapshot, removal set from value-exact
  * partition stats, untouched partitions' files survive by path. */
class DynamicOverwriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("only the batch's partitions are replaced; others survive by path") {
    val wh = Files.createTempDirectory("graft-dyn-").toString
    spark.conf.set("spark.sql.catalog.gdyn",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdyn.warehouse", wh)
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    w.writeTable("main", "p",
      Seq(Seq((1L, "a", "x1"), (2L, "b", "x2"), (3L, "c", "x3"))
        .toDF("id", "grp", "v")),
      Append, WriteConfig(retryUnitMs = 1,
        partitions = Seq(graft.partition.PartitionHint.identity("grp"))), "l1")
    val before = cat.loadTable("main", "p").metadata
    val untouched = before.currentFiles.filter(f =>
      f.stats.get("grp").exists(_.min.exists(m => m == "b" || m == "c")))
    assert(untouched.size == 2)

    val iso = spark.newSession()
    iso.conf.set("spark.sql.catalog.gdyn", classOf[GraftSparkCatalog].getName)
    iso.conf.set("spark.sql.catalog.gdyn.warehouse", wh)
    iso.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    locally {
      import iso.implicits._
      Seq((10L, "a", "fresh"), (11L, "d", "new")).toDF("id", "grp", "v")
        .createOrReplaceTempView("dyn_src")
    }
    iso.sql("INSERT OVERWRITE gdyn.main.p SELECT id, grp, v FROM dyn_src")

    val after = cat.loadTable("main", "p").metadata
    assert(after.snapshots.size == before.snapshots.size + 1,
      "dynamic overwrite must be ONE snapshot")
    val afterPaths = after.currentFiles.map(_.path).toSet
    assert(untouched.forall(f => afterPaths.contains(f.path)),
      "partitions absent from the batch must survive by path")
    val got = spark.sql("SELECT id, grp, v FROM gdyn.main.p ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((2L, "b", "x2"), (3L, "c", "x3"),
      (10L, "a", "fresh"), (11L, "d", "new")), got.toSeq)

    // static mode (the default) keeps the existing truncate semantics
    val stat = spark.newSession()
    stat.conf.set("spark.sql.catalog.gdyn", classOf[GraftSparkCatalog].getName)
    stat.conf.set("spark.sql.catalog.gdyn.warehouse", wh)
    locally {
      import stat.implicits._
      Seq((20L, "z", "only")).toDF("id", "grp", "v")
        .createOrReplaceTempView("dyn_src2")
    }
    stat.sql("INSERT OVERWRITE gdyn.main.p SELECT id, grp, v FROM dyn_src2")
    assert(spark.sql("SELECT count(*) FROM gdyn.main.p")
      .collect()(0).getLong(0) == 1)
  }

  test("unpartitioned table degenerates to replace; DataFrame API works") {
    val wh = Files.createTempDirectory("graft-dyn2-").toString
    spark.conf.set("spark.sql.catalog.gdyn2",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdyn2.warehouse", wh)
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    w.writeTable("main", "u",
      Seq(Seq((1L, "a")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    // DataFrameWriterV2.overwritePartitions on an unpartitioned table
    Seq((2L, "b"), (3L, "c")).toDF("id", "v")
      .writeTo("gdyn2.main.u").overwritePartitions()
    val got = spark.sql("SELECT id FROM gdyn2.main.u ORDER BY id")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L, 3L))
  }

  test("evolved-spec table degrades to predicate routing: matching slices restaged, old-vintage non-matching files survive") {
    val wh = Files.createTempDirectory("graft-dyn3-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    // two old-vintage (pre-spec) files: one straddling a/b/c, one pure d
    w.writeTable("main", "e",
      Seq(Seq((1L, "a", "x1"), (2L, "b", "x2"), (3L, "c", "x3"))
        .toDF("id", "grp", "v").coalesce(1)),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    w.writeTable("main", "e",
      Seq(Seq((4L, "d", "x4")).toDF("id", "grp", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l2")
    cat.loadTable("main", "e").updatePartitionSpec(
      Seq(graft.partition.PartitionHint.identity("grp")))
    val before = cat.loadTable("main", "e").metadata
    val dFile = before.currentFiles.filter(f =>
      f.stats.get("grp").exists(_.min.contains("d")))
    assert(dFile.size == 1)

    // dynamic overwrite of partition 'a' — the metadata removal set
    // cannot attribute the pre-spec files, so this must route through
    // the predicate fallback instead of refusing
    w.overwriteDynamic("main", "e",
      Seq((10L, "a", "fresh")).toDF("id", "grp", "v"),
      WriteConfig(retryUnitMs = 1), "dyn-evolved")

    val after = cat.loadTable("main", "e").metadata
    val got = cat.loadTable("main", "e").read().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq == Seq((2L, "b", "x2"), (3L, "c", "x3"),
      (4L, "d", "x4"), (10L, "a", "fresh")), got.toSeq)
    // the pure-'d' old-vintage file held no matching rows: survives by path
    assert(after.currentFiles.map(_.path).toSet
      .contains(dFile.head.path),
      "non-matching old-vintage file must survive by path")
    assert(after.snapshots.last.operation == "overwrite")
  }
}
