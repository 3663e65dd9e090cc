package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** Atomic CTAS / RTAS through the StagingTableCatalog protocol: the
  * SELECT's output stages invisibly (data files without a referencing
  * snapshot are dead bytes), publish is one metadata CAS, failure leaves
  * no table and no residue. */
class CtasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(name: String): GraftCatalog = {
    val wh = Files.createTempDirectory(s"graft-ctas-$name-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new GraftCatalog(spark, wh)
  }

  test("CTAS plans atomic, commits one snapshot, content matches") {
    val cat = freshCatalog("gcts")
    // the staging protocol is actually engaged (not create-then-write)
    val planned = spark.sql(
      "EXPLAIN CREATE TABLE gcts.main.squares AS SELECT id, id * id AS sq FROM RANGE(100)")
      .collect()(0).getString(0)
    assert(planned.contains("AtomicCreateTableAsSelect"), planned)

    spark.sql(
      "CREATE TABLE gcts.main.squares AS SELECT id, id * id AS sq FROM RANGE(100)")
    val m = cat.loadTable("main", "squares").metadata
    assert(m.snapshots.size == 1 && m.snapshots.head.operation == "append")
    assert(spark.sql("SELECT sum(sq) FROM gcts.main.squares")
      .collect()(0).getLong(0) == (0 until 100).map(i => i.toLong * i).sum)
    // duplicate create fails loudly, table untouched
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE gcts.main.squares AS SELECT 1 AS x"))
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
    assert(cat.loadTable("main", "squares").metadata.snapshots.size == 1)
  }

  test("partitioned CTAS records the spec and stages value-exact") {
    val cat = freshCatalog("gctp")
    spark.sql("CREATE TABLE gctp.main.parted PARTITIONED BY (bucket(4, id)) " +
      "AS SELECT id, CAST(id % 7 AS STRING) AS v FROM RANGE(200)")
    val m = cat.loadTable("main", "parted").metadata
    assert(m.partitionSpec.map(s => (s.transform, s.param)) ==
      Seq(("bucket", Some(4))))
    // fanout layout: every staged file carries a single-valued derived
    // stat (min == max) — the SPJ eligibility contract from birth
    val derived = m.partitionSpec.head.name
    val files = m.currentFiles
    assert(files.nonEmpty)
    assert(files.forall(f => f.stats.get(derived).exists(s =>
      s.min.isDefined && s.min == s.max)), files.map(_.stats.get(derived)))
    assert(spark.sql("SELECT count(*) FROM gctp.main.parted")
      .collect()(0).getLong(0) == 200)
  }

  test("failed CTAS leaves no table and no staged residue") {
    val cat = freshCatalog("gctf")
    spark.udf.register("boom_ctas", (i: Long) =>
      if (i == 37L) throw new RuntimeException("ctas boom") else i)
    intercept[Exception](spark.sql(
      "CREATE TABLE gctf.main.never AS SELECT boom_ctas(id) AS id FROM RANGE(100)"))
    assert(!cat.tableExists("main", "never"))
    // the staged directory tree was aborted away
    val dir = cat.tableLocation("main", "never")
    assert(!Files.exists(dir) || PathIO.walk(dir).forall(Files.isDirectory(_)),
      s"staged residue under $dir")
  }

  test("RTAS swaps the definition atomically and keeps history") {
    val cat = freshCatalog("gctr")
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq(Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    val before = cat.loadTable("main", "t").metadata
    assert(before.snapshots.size == 1)

    spark.sql("REPLACE TABLE gctr.main.t AS " +
      "SELECT CAST(id AS STRING) AS label, id * 10 AS score FROM RANGE(5)")
    val after = cat.loadTable("main", "t").metadata
    // definition replaced wholesale...
    assert(after.schema.fieldNames.toSeq == Seq("label", "score"))
    assert(spark.sql("SELECT sum(score) FROM gctr.main.t")
      .collect()(0).getLong(0) == 100)
    // ...but lineage survives: one more snapshot, and time travel to the
    // pre-replace snapshot resolves under the OLD schema with old rows
    assert(after.snapshots.size == 2)
    val oldSnap = after.snapshots.head.snapshotId
    val old = spark.sql(s"SELECT * FROM gctr.main.t VERSION AS OF $oldSnap")
    assert(old.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(old.count() == 2)

    // REPLACE of a missing table refuses; CREATE OR REPLACE creates
    val e = intercept[Exception](spark.sql(
      "REPLACE TABLE gctr.main.nope AS SELECT 1 AS x"))
    assert(e.getMessage.toUpperCase.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
    spark.sql("CREATE OR REPLACE TABLE gctr.main.fresh AS SELECT 1 AS x")
    assert(spark.sql("SELECT * FROM gctr.main.fresh").count() == 1)
  }

  test("CTAS carries table properties through the staged commit") {
    val cat = freshCatalog("gctq")
    spark.sql("CREATE TABLE gctq.main.keyed " +
      "TBLPROPERTIES ('graft.primary-key' = 'id') " +
      "AS SELECT id, CAST(id AS STRING) AS v FROM RANGE(10)")
    val m = cat.loadTable("main", "keyed").metadata
    assert(m.properties.get("graft.primary-key").contains("id"))
    // a primary-key claim over a column the SELECT does not produce
    // fails at stage time, before anything is written
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE gctq.main.bad TBLPROPERTIES ('graft.primary-key' = 'zz') " +
        "AS SELECT id FROM RANGE(3)"))
    assert(e.getMessage.contains("zz"), e.getMessage)
    assert(!cat.tableExists("main", "bad"))
  }

  test("CTAS applies a declared write sort-order from the first load") {
    val cat = freshCatalog("gcso")
    spark.sql("CREATE TABLE gcso.main.sorted " +
      "TBLPROPERTIES ('graft.write.sort-order' = 'v') " +
      "AS SELECT id, CAST((id * 48271) % 10000 AS BIGINT) AS v " +
      "FROM RANGE(4000) DISTRIBUTE BY id % 8")
    val t = cat.loadTable("main", "sorted")
    val files = t.metadata.currentFiles.filter(_.stats.contains("v"))
    // AQE may coalesce the tiny range shuffle to one task/file; when it
    // leaves several, their v-ranges must be disjoint (the layout claim)
    val ranges = files.map(f => (f.stats("v").min.get.toLong,
      f.stats("v").max.get.toLong)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"CTAS sorted files must not overlap: $ranges")
      case _ => ()
    }
    assert(spark.sql("SELECT count(*) FROM gcso.main.sorted")
      .collect()(0).getLong(0) == 4000L)
    // a sort-order claim over a column the SELECT does not produce
    // fails at stage time, atomically
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE gcso.main.bad " +
        "TBLPROPERTIES ('graft.write.sort-order' = 'nope') " +
        "AS SELECT id FROM RANGE(3)"))
    assert(e.getMessage.contains("nope"), e.getMessage)
    assert(!cat.tableExists("main", "bad"))
  }
}
