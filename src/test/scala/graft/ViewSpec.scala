package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** Persisted SQL views through the V2 ViewCatalog: CREATE VIEW writes a
  * durable definition into the warehouse, SELECT re-resolves it in any
  * session, SHOW/DESCRIBE/DROP work, and the definition is one
  * atomically-written JSON (never a torn read). */
class ViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(name: String): (GraftCatalog, String) = {
    val wh = Files.createTempDirectory(s"graft-view-$name-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (new GraftCatalog(spark, wh), wh)
  }

  test("CREATE VIEW persists; SELECT resolves; SHOW/DROP work") {
    val (cat, _) = freshCatalog("gview")
    val w = new GraftWriter(cat)
    w.writeTable("main", "sales",
      Seq((1 to 40).map(i => (i.toLong, i % 4, i * 2.5)).toDF("id", "grp", "amt")),
      Append, WriteConfig(retryUnitMs = 1), "l1")

    spark.sql("CREATE VIEW gview.main.grp_totals AS " +
      "SELECT grp, count(*) AS n, sum(amt) AS total " +
      "FROM gview.main.sales GROUP BY grp")
    val rows = spark.sql(
      "SELECT * FROM gview.main.grp_totals ORDER BY grp").collect()
    assert(rows.length == 4 && rows.map(_.getLong(1)).forall(_ == 10))

    // the view tracks the base table: new data shows up on re-read
    w.writeTable("main", "sales",
      Seq(Seq((100L, 0, 1000.0)).toDF("id", "grp", "amt")),
      Append, WriteConfig(retryUnitMs = 1), "l2")
    val n0 = spark.sql(
      "SELECT n FROM gview.main.grp_totals WHERE grp = 0").collect()(0).getLong(0)
    assert(n0 == 11, s"view must re-resolve against the current snapshot: $n0")

    assert(spark.sql("SHOW VIEWS IN gview.main").collect()
      .map(_.getString(1)).toSeq == Seq("grp_totals"))
    spark.sql("DROP VIEW gview.main.grp_totals")
    assert(spark.sql("SHOW VIEWS IN gview.main").collect().isEmpty)
  }

  test("views survive a fresh session (durable, not session state)") {
    val (cat, wh) = freshCatalog("gview2")
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq(Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    spark.sql("CREATE VIEW gview2.main.tv AS " +
      "SELECT upper(v) AS uv FROM gview2.main.t WHERE id = 2")

    // a stored view names its catalog: the reading session must register
    // that catalog name (same rule as any name-based catalog object)
    val other = spark.newSession()
    other.conf.set("spark.sql.catalog.gview2",
      classOf[GraftSparkCatalog].getName)
    other.conf.set("spark.sql.catalog.gview2.warehouse", wh)
    val got = other.sql("SELECT * FROM gview2.main.tv").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("B"))
  }

  test("CREATE OR REPLACE swaps the definition; name collisions refuse") {
    val (cat, _) = freshCatalog("gview3")
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    spark.sql("CREATE VIEW gview3.main.v AS SELECT id FROM gview3.main.t")
    // duplicate create refuses
    val e = intercept[Exception](spark.sql(
      "CREATE VIEW gview3.main.v AS SELECT x FROM gview3.main.t"))
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
    // a view may not shadow a table
    val e2 = intercept[Exception](spark.sql(
      "CREATE VIEW gview3.main.t AS SELECT 1 AS one"))
    assert(e2.getMessage.toLowerCase.contains("exists"), e2.getMessage)
    // replace swaps atomically
    spark.sql("CREATE OR REPLACE VIEW gview3.main.v AS " +
      "SELECT sum(x) AS sx FROM gview3.main.t")
    assert(spark.sql("SELECT * FROM gview3.main.v").collect()(0)
      .getDouble(0) == 30.0)
    // view properties round-trip through ALTER VIEW
    spark.sql("ALTER VIEW gview3.main.v SET TBLPROPERTIES ('k' = 'val1')")
    val props = spark.sql("SHOW TBLPROPERTIES gview3.main.v").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.get("k").contains("val1"), props)
    spark.sql("ALTER VIEW gview3.main.v UNSET TBLPROPERTIES ('k')")
    val props2 = spark.sql("SHOW TBLPROPERTIES gview3.main.v").collect()
      .map(_.getString(0)).toSet
    assert(!props2.contains("k"), props2)
  }

  test("nested views expand recursively; cycles are named errors") {
    val (cat, _) = freshCatalog("gview4")
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq((1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "x")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    spark.sql("CREATE VIEW gview4.main.a AS " +
      "SELECT id, x FROM gview4.main.t WHERE id > 5")
    spark.sql("CREATE VIEW gview4.main.b AS " +
      "SELECT sum(x) AS sx FROM gview4.main.a")
    assert(spark.sql("SELECT * FROM gview4.main.b").collect()(0)
      .getDouble(0) == (6 to 10).map(_.toDouble).sum)
    // a cycle can only arise via replace (create analyzes the old defs);
    // reading it must fail with the chain named, not an analyzer loop
    spark.sql("CREATE OR REPLACE VIEW gview4.main.a AS " +
      "SELECT sx AS x, 1 AS id FROM gview4.main.b")
    val e = intercept[Exception](spark.sql("SELECT * FROM gview4.main.a").collect())
    assert(e.getMessage.contains("recursive view"), e.getMessage)
  }

  test("two-part references in a view body bind to the view's saved catalog, not the reader's") {
    val (cat, wh) = freshCatalog("gview5")
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    // author the view UNDER the gview5 catalog with a TWO-part body
    // reference (main.t) — the saved currentCatalog must qualify it
    val author = spark.newSession()
    author.conf.set("spark.sql.catalog.gview5",
      classOf[GraftSparkCatalog].getName)
    author.conf.set("spark.sql.catalog.gview5.warehouse", wh)
    author.sql("USE gview5")
    author.sql("CREATE VIEW gview5.main.two_part AS " +
      "SELECT sum(x) AS sx FROM main.t")
    // reader session: current catalog is the DEFAULT (spark_catalog),
    // where main.t does not exist — the view must still resolve
    val reader = spark.newSession()
    reader.conf.set("spark.sql.catalog.gview5",
      classOf[GraftSparkCatalog].getName)
    reader.conf.set("spark.sql.catalog.gview5.warehouse", wh)
    assert(reader.sql("SELECT sx FROM gview5.main.two_part")
      .collect()(0).getDouble(0) == 30.0)
  }

  test("explicit non-graft catalog in view DDL passes through, never hijacked") {
    val (_, wh) = freshCatalog("gview6")
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.gview6",
      classOf[GraftSparkCatalog].getName)
    s.conf.set("spark.sql.catalog.gview6.warehouse", wh)
    s.sql("USE gview6")
    // current catalog is the graft one, but the statement names the
    // SESSION catalog explicitly: it must create a session temp/catalog
    // view there, NOT a graft view under a namespace literally called
    // "spark_catalog"
    s.sql("CREATE VIEW spark_catalog.default.vnat AS SELECT 7 AS x")
    try {
      assert(s.sql("SELECT x FROM spark_catalog.default.vnat")
        .collect()(0).getInt(0) == 7)
      // and it is NOT in the graft view store (the namespace not even
      // existing there is equally conclusive)
      val inGraft =
        try s.sql("SHOW VIEWS IN gview6.spark_catalog")
          .collect().map(_.getString(1)).toSet
        catch { case _: Exception => Set.empty[String] }
      assert(!inGraft.contains("vnat"))
      // DROP through the explicit catalog removes the session view
      s.sql("DROP VIEW spark_catalog.default.vnat")
      assert(s.sql("SHOW VIEWS IN spark_catalog.default").collect()
        .forall(r => r.getString(1) != "vnat"))
    } finally {
      try s.sql("DROP VIEW IF EXISTS spark_catalog.default.vnat")
      catch { case _: Throwable => () }
    }
  }
}
