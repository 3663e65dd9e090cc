package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** Write-audit-publish branches (Iceberg-style named refs): branch
  * commits advance a ref instead of main; `publish` fast-forwards main
  * onto an audited head and refuses divergence; tags are refs nobody
  * commits to; expiry keeps ref heads alive. */
class BranchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(): GraftCatalog =
    new GraftCatalog(spark, Files.createTempDirectory("graft-br-").toString)

  private def users(rows: (Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("user_id", "username", "score")

  private val cfg = WriteConfig(primaryKey = Seq("user_id"), retryUnitMs = 1)

  test("write-audit-publish: branch isolates, publish fast-forwards, ref drops") {
    val w = new GraftWriter(freshCatalog())
    val t = w.writeTable("main", "u", Seq(users((1, "a", 10))), Append, cfg, "l1")
    t.createBranch("audit")
    w.writeTable("main", "u", Seq(users((2, "b", 20))), Append,
      cfg.copy(toBranch = Some("audit")), "l2")

    // audit sees both loads; main still sees only l1
    assert(t.readBranch("audit").count() == 2)
    assert(t.read().count() == 1)

    t.publish("audit")
    assert(t.read().count() == 2)
    assert(t.metadata.refId("audit").isEmpty, "publish drops the ref")
  }

  test("publish refuses a diverged main; branch MoR merge works") {
    val w = new GraftWriter(freshCatalog())
    val t = w.writeTable("main", "u",
      Seq(users((1, "a", 10), (2, "b", 20))), Append, cfg, "l1")
    t.createBranch("audit")
    // MoR upsert lands on the branch only
    w.writeTable("main", "u", Seq(users((2, "b2", 21))), Merge("upsert"),
      cfg.copy(toBranch = Some("audit"), mergeOnRead = true), "l2")
    assert(t.readBranch("audit").select("username")
      .as[String].collect().toSet == Set("a", "b2"))
    assert(t.read().select("username").as[String].collect().toSet == Set("a", "b"))

    // CoW merge to a branch is rejected loudly
    intercept[ValidationError] {
      w.writeTable("main", "u", Seq(users((3, "c", 30))), Merge("upsert"),
        cfg.copy(toBranch = Some("audit")), "l3")
    }

    // main advances independently -> publish must refuse
    w.writeTable("main", "u", Seq(users((9, "z", 90))), Append, cfg, "l4")
    intercept[ValidationError] { t.publish("audit") }
    t.dropBranch("audit")
    assert(t.metadata.refId("audit").isEmpty)
  }

  test("publish still fast-forwards after expiry trims the branch chain's age class") {
    val w = new GraftWriter(freshCatalog())
    val t = w.writeTable("main", "u", Seq(users((1, "a", 10))), Append, cfg, "l1")
    t.createBranch("audit")
    // 12 branch commits: more than keepLast, so mid-chain snapshots
    // would age out without the branch-chain retention rule
    (2 to 13).foreach(i =>
      w.writeTable("main", "u", Seq(users((i.toLong, s"u$i", i * 10L))),
        Append, cfg.copy(toBranch = Some("audit")), s"l$i"))
    Maintenance.expireSnapshots(t, keepLast = 3, retryUnitMs = 1)
    t.publish("audit")
    assert(t.read().count() == 13)
  }

  test("ALTER TABLE cannot drop a column outstanding MoR deletes key on") {
    val cat = freshCatalog()
    val wh = cat.warehousePath.toString
    spark.conf.set("spark.sql.catalog.gbr",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbr.warehouse", wh)
    val w = new GraftWriter(cat)
    val mcfg = cfg.copy(primaryKey = Seq("user_id"), mergeOnRead = true)
    w.writeTable("main", "u", Seq(users((1, "a", 10), (2, "b", 20))),
      Merge("upsert"), mcfg, "l1")
    val t = w.writeTable("main", "u", Seq(users((2, "b2", 21))),
      Merge("upsert"), mcfg, "l2")
    assert(t.metadata.currentSnapshot.get.deletes.nonEmpty)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gbr.main.u DROP COLUMN user_id")
    }
    assert(e.getMessage.contains("applyDeletes"),
      s"wrong error: ${e.getMessage}")
    // after physical apply, the drop goes through
    Maintenance.applyDeletes(t, retryUnitMs = 1)
    spark.sql("ALTER TABLE gbr.main.u DROP COLUMN user_id")
    assert(!cat.loadTable("main", "u").metadata.schema.fieldNames.contains("user_id"))
  }

  test("tags pin history through expiry") {
    val w = new GraftWriter(freshCatalog())
    val t = w.writeTable("main", "u", Seq(users((1, "a", 10))), Append, cfg, "l1")
    val v1 = t.metadata.currentSnapshotId.get
    t.createBranch("v1.0", Some(v1))
    (2 to 5).foreach(i =>
      w.writeTable("main", "u", Seq(users((i.toLong, s"u$i", i * 10L))),
        Append, cfg, s"l$i"))
    Maintenance.expireSnapshots(t, keepLast = 1, retryUnitMs = 1)
    // the tag's snapshot survived expiry and still reads
    assert(t.readBranch("v1.0").count() == 1)
    assert(t.read().count() == 5)
  }

  test("auto-compact never fires on a WAP-branch MoR merge (main-line only)") {
    val cat = freshCatalog()
    val w = new GraftWriter(cat)
    // trickle enough small files past the threshold so the compaction
    // signal is armed, THEN opt in to auto-compact
    (1 to 6).foreach(i =>
      w.writeTable("main", "u", Seq(users((i.toLong, s"u$i", i * 10L))),
        Append, cfg, s"l$i"))
    cat.loadTable("main", "u").commit(m => m.copy(properties = m.properties +
      (Maintenance.AutoCompactProp -> "true") +
      (Maintenance.MaxSmallFilesProp -> "3")), unitMs = 1)
    val t = cat.loadTable("main", "u")
    t.createBranch("audit")
    // a MoR merge routed to the audit branch must NOT trigger a main-line
    // compaction: the branch backlog is invisible to main readers until
    // publish (regression: a brace-less if once guarded only autoApply)
    w.writeTable("main", "u", Seq(users((1, "a2", 11))), Merge("upsert"),
      cfg.copy(toBranch = Some("audit"), mergeOnRead = true), "l7")
    val afterBranch = cat.loadTable("main", "u")
    assert(!afterBranch.metadata.snapshots.exists(_.operation == "compact"),
      "branch MoR merge must not fire a main-line auto-compaction")
    // publish routes through a main-line commit that re-evaluates the
    // signal; a subsequent main-line MoR merge pays the backlog down
    afterBranch.publish("audit")
    w.writeTable("main", "u", Seq(users((2, "b2", 21))), Merge("upsert"),
      cfg.copy(mergeOnRead = true), "l8")
    val t2 = cat.loadTable("main", "u")
    assert(t2.metadata.snapshots.exists(_.operation == "compact"),
      "main-line MoR merge must fire the armed auto-compaction")
    assert(t2.read().select("username").as[String].collect().toSet ==
      Set("a2", "b2", "u3", "u4", "u5", "u6"))
  }

  test("all-numeric ref names are rejected (would shadow snapshot ids)") {
    val w = new GraftWriter(freshCatalog())
    val t = w.writeTable("main", "u", Seq(users((1, "a", 10))), Append, cfg, "l1")
    intercept[IllegalArgumentException] { t.createBranch("123") }
    t.createBranch("v123") // digits allowed when not ALL digits
    assert(t.metadata.refId("v123").isDefined)
  }
}
