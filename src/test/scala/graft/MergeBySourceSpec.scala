package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** `MERGE INTO ... WHEN NOT MATCHED BY SOURCE` (Spark 4 full merge):
  * target rows absent from the source can be deleted or updated, in both
  * row-level modes — the SQL form of a full-sync load. */
class MergeBySourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def setup(name: String, delta: Boolean): GraftCatalog = {
    val wh = Files.createTempDirectory(s"graft-mbs-$name-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    if (delta)
      spark.sql(s"ALTER TABLE $name.main.t SET TBLPROPERTIES (" +
        "'graft.delete.mode' = 'merge-on-read', 'graft.primary-key' = 'id')")
    cat
  }

  private def fullSync(name: String): Unit = {
    // source: keys 5..12 (updates 5..10, inserts 11..12; 1..4 vanish)
    (5 to 12).map(i => (i.toLong, s"s$i")).toDF("id", "v")
      .createOrReplaceTempView(s"mbs_src_$name")
    spark.sql(
      s"""MERGE INTO $name.main.t AS t USING mbs_src_$name AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET t.v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    val got = spark.sql(s"SELECT id, v FROM $name.main.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == (5 to 12).map(i => (i.toLong, s"s$i")), got.toSeq)
  }

  test("full sync merge, copy-on-write mode") {
    setup("gmbs_cow", delta = false); fullSync("gmbs_cow")
  }

  test("full sync merge, merge-on-read delta mode") {
    setup("gmbs_mor", delta = true); fullSync("gmbs_mor")
  }
}
