package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** Column statistics for cost-based optimization: `CALL system.analyze`
  * computes NDVs in one pass; scans report them through the DSv2
  * `columnStats` surface when CBO is on; default sessions see identical
  * plans and no column stats. */
class CboStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("analyze persists NDV/null stats; CBO sessions see attribute stats") {
    val wh = Files.createTempDirectory("graft-cbo-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    // 1000 rows, 10 distinct grp values, 100 nulls in v
    w.writeTable("main", "t",
      Seq((1 to 1000).map(i =>
        (i.toLong, i % 10, if (i % 10 == 0) null else s"s$i"))
        .toDF("id", "grp", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")

    val iso = spark.newSession()
    iso.conf.set("spark.sql.catalog.gcbo",
      classOf[GraftSparkCatalog].getName)
    iso.conf.set("spark.sql.catalog.gcbo.warehouse", wh)
    val res = iso.sql("CALL gcbo.system.analyze('main.t')").collect()
    assert(res(0).getLong(0) == 1000 && res(0).getInt(1) == 3, res.toSeq)

    val props = cat.loadTable("main", "t").metadata.properties
    assert(props.contains("graft.stats.grp") &&
      props.contains("graft.stats.snapshot-id"), props)

    // CBO on: catalyst attribute stats carry the analyzed NDVs and the
    // footer-exact null counts
    iso.conf.set("spark.sql.cbo.enabled", "true")
    val stats = iso.sql("SELECT id, grp, v FROM gcbo.main.t")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(1000)), stats.rowCount)
    val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
    val grp = byName.getOrElse("grp", fail(s"no grp stats in $byName"))
    val ndv = grp.distinctCount.getOrElse(fail("no ndv"))
    assert(ndv >= BigInt(9) && ndv <= BigInt(11), ndv) // HLL ~10
    val vStat = byName.getOrElse("v", fail(s"no v stats in $byName"))
    assert(vStat.nullCount.contains(BigInt(100)), vStat.nullCount)
    // exact numeric min/max from footer stats
    val idStat = byName.getOrElse("id", fail("no id stats"))
    assert(idStat.min.contains(1L) && idStat.max.contains(1000L),
      (idStat.min, idStat.max))

    // CBO off (fresh default session): no column stats, identical scans
    val plain = spark.newSession()
    plain.conf.set("spark.sql.catalog.gcbo",
      classOf[GraftSparkCatalog].getName)
    plain.conf.set("spark.sql.catalog.gcbo.warehouse", wh)
    val off = plain.sql("SELECT id, grp, v FROM gcbo.main.t")
      .queryExecution.optimizedPlan.stats
    assert(off.attributeStats.isEmpty, off.attributeStats)
  }

  test("equi-height histograms: skewed-predicate estimates follow the data, CBO-off plans identical") {
    val wh = Files.createTempDirectory("graft-cboh-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    // heavy skew: 90% of rows have k=1, the rest spread over 2..1000
    val rows = (1 to 9000).map(i => (i.toLong, 1L)) ++
      (1 to 1000).map(i => (9000L + i, i.toLong))
    w.writeTable("main", "sk", Seq(rows.toDF("id", "k")),
      Append, WriteConfig(retryUnitMs = 1), "l1")

    val iso = spark.newSession()
    iso.conf.set("spark.sql.catalog.gch", classOf[GraftSparkCatalog].getName)
    iso.conf.set("spark.sql.catalog.gch.warehouse", wh)
    // histogram generation mirrors Spark's own ANALYZE gate
    iso.conf.set("spark.sql.statistics.histogram.enabled", "true")
    org.apache.spark.sql.SparkSession.setActiveSession(iso)
    try iso.sql("CALL gch.system.analyze('main.sk')").collect()
    finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    val props = cat.loadTable("main", "sk").metadata.properties
    assert(props.contains("graft.hist.k"), props.keys)

    iso.conf.set("spark.sql.cbo.enabled", "true")
    // plan stats are computed under the THREAD-ACTIVE conf — pin iso
    def estimate(sql: String): BigInt = {
      org.apache.spark.sql.SparkSession.setActiveSession(iso)
      try {
        val plan = iso.sql(sql).queryExecution.optimizedPlan
        plan.stats.rowCount.getOrElse(fail(s"no rowCount for $sql:\n$plan"))
      } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
    // without a histogram, uniformity says ~rows/ndv ≈ 10 for ANY point
    // predicate; the histogram must pull the hot key's estimate toward
    // its real 9000 and keep a cold key's estimate small
    val hot = estimate("SELECT * FROM gch.main.sk WHERE k = 1")
    val cold = estimate("SELECT * FROM gch.main.sk WHERE k = 700")
    assert(hot > BigInt(2000),
      s"hot-key estimate should follow the histogram, got $hot")
    assert(cold < BigInt(500), s"cold-key estimate should stay small: $cold")
    assert(hot > cold * 10,
      s"skew must be visible in the estimates: hot=$hot cold=$cold")

    // CBO off: byte-identical plan, no attribute stats
    val plain = spark.newSession()
    plain.conf.set("spark.sql.catalog.gch", classOf[GraftSparkCatalog].getName)
    plain.conf.set("spark.sql.catalog.gch.warehouse", wh)
    val off = plain.sql("SELECT * FROM gch.main.sk WHERE k = 1")
      .queryExecution.optimizedPlan.stats
    assert(off.attributeStats.isEmpty)
  }

  test("CBO end-value: analyzed stats flip the join ORDER; CBO-off plans stay identical") {
    val wh = Files.createTempDirectory("graft-cboj-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    val cfg = WriteConfig(retryUnitMs = 1)
    // fact(40k) ⋈ dimb(2k, fat payload) ⋈ dimc(50): the SQL names dimb
    // first, but (fact ⋈ dimc) is the cheap intermediate — NDV-based
    // cardinality says 40000·50/2000 = 1000 rows vs 40000 through dimb
    w.writeTable("main", "fact",
      Seq((1 to 40000).map(i => (i.toLong, i.toLong % 2000, i.toLong % 2000))
        .toDF("id", "bk", "ck")), Append, cfg, "l1")
    w.writeTable("main", "dimb",
      Seq((0 until 2000).map(k => (k.toLong, "b" * 200 + k))
        .toDF("bk", "blabel")), Append, cfg, "l2")
    w.writeTable("main", "dimc",
      Seq((0 until 50).map(k => (k.toLong, s"c$k")).toDF("ck", "cval")),
      Append, cfg, "l3")

    val q = """SELECT f.id, b.blabel, c.cval
              |FROM gcbj.main.fact f
              |JOIN gcbj.main.dimb b ON f.bk = b.bk
              |JOIN gcbj.main.dimc c ON f.ck = c.ck""".stripMargin
    def session(): org.apache.spark.sql.SparkSession = {
      val s = spark.newSession()
      s.conf.set("spark.sql.catalog.gcbj", classOf[GraftSparkCatalog].getName)
      s.conf.set("spark.sql.catalog.gcbj.warehouse", wh)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s
    }
    // leaf order of the optimized join tree, by table name; expression
    // ids vary across sessions, so plan-string compares normalize them
    def leafOrder(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
        Seq[String] =
      p.collectLeaves().map(_.toString).map { s =>
        Seq("fact", "dimb", "dimc").find(t => s.contains(s"main.$t"))
          .getOrElse("?")
      }
    def norm(p: Any): String = p.toString.replaceAll("#\\d+", "#")

    val offBefore = session().sql(q).queryExecution.optimizedPlan
    assert(leafOrder(offBefore) == Seq("fact", "dimb", "dimc"),
      s"CBO-off follows the syntactic order: ${leafOrder(offBefore)}")
    val offBeforeStr = norm(offBefore)
    val offResult = session().sql(q).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)

    val iso = session()
    org.apache.spark.sql.SparkSession.setActiveSession(iso)
    try {
      Seq("fact", "dimb", "dimc").foreach(t =>
        iso.sql(s"CALL gcbj.system.analyze('main.$t')").collect())
      iso.conf.set("spark.sql.cbo.enabled", "true")
      iso.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val onPlan = iso.sql(q).queryExecution.optimizedPlan
      val order = leafOrder(onPlan)
      assert(order != Seq("fact", "dimb", "dimc"),
        s"CBO must reorder the join, still syntactic: $onPlan")
      assert(order.indexOf("dimc") < order.indexOf("dimb"),
        s"the 50-row dimc must join before the fat dimb: $order")
      val onResult = iso.sql(q).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
      assert(onResult.sameElements(offResult),
        "reordered plan must return identical rows")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)

    // the analyze must NOT leak into CBO-off sessions: same plan, modulo
    // expression ids
    val offAfter = norm(session().sql(q).queryExecution.optimizedPlan)
    assert(offAfter == offBeforeStr,
      s"CBO-off plan changed after analyze:\nBEFORE $offBeforeStr\nAFTER $offAfter")
  }

  test("stats stay sound after later loads: null counts track files") {
    val wh = Files.createTempDirectory("graft-cbo2-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq((1 to 100).map(i => (i.toLong, if (i <= 10) null else "x"))
        .toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    val iso = spark.newSession()
    iso.conf.set("spark.sql.catalog.gcb2",
      classOf[GraftSparkCatalog].getName)
    iso.conf.set("spark.sql.catalog.gcb2.warehouse", wh)
    iso.sql("CALL gcb2.system.analyze('main.t')").collect()
    // a second load adds 5 more nulls AFTER the analyze
    w.writeTable("main", "t",
      Seq((101 to 110).map(i => (i.toLong, if (i <= 105) null else "y"))
        .toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l2")
    iso.conf.set("spark.sql.cbo.enabled", "true")
    val stats = iso.sql("SELECT id, v FROM gcb2.main.t")
      .queryExecution.optimizedPlan.stats
    val vStat = stats.attributeStats.collectFirst {
      case (a, s) if a.name == "v" => s
    }.getOrElse(fail("no v stats"))
    // null count is footer-exact over the CURRENT file set (15), not the
    // stale analyzed value (10)
    assert(vStat.nullCount.contains(BigInt(15)), vStat.nullCount)
  }

  test("per-file HLL sketches: NDV tracks appends and compaction with zero rescans (Puffin parity)") {
    val wh = Files.createTempDirectory("graft-cbo3-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    val cfg = WriteConfig(retryUnitMs = 1, sketchColumns = Seq("grp"))
    // load 1: 500 distinct grp values
    w.writeTable("main", "t",
      Seq((1 to 1000).map(i => (i.toLong, (i % 500).toLong))
        .toDF("id", "grp")),
      Append, cfg, "l1")
    val m1 = cat.loadTable("main", "t").metadata
    assert(m1.properties(GraftWriter.SketchColumnsProperty) == "grp")
    assert(m1.currentFiles.forall(_.stats.get("grp").exists(_.hll.isDefined)),
      "every staged file must carry its grp sketch")

    val iso = spark.newSession()
    iso.conf.set("spark.sql.catalog.gcb3",
      classOf[GraftSparkCatalog].getName)
    iso.conf.set("spark.sql.catalog.gcb3.warehouse", wh)
    iso.conf.set("spark.sql.cbo.enabled", "true")
    def ndv(): BigInt = iso.sql("SELECT id, grp FROM gcb3.main.t")
      .queryExecution.optimizedPlan.stats.attributeStats.collectFirst {
        case (a, s) if a.name == "grp" => s.distinctCount.getOrElse(BigInt(-1))
      }.getOrElse(BigInt(-1))
    val n1 = ndv()
    assert((n1 - 500).abs.toDouble <= 500 * 0.03, s"NDV $n1 vs exact 500")

    // append 300 NEW distinct values — NO analyze ran, yet the unioned
    // sketch NDV moves to ~800 (a stored ANALYZE number would still say
    // 500; the sketches updated with zero reads of load-1 data)
    w.writeTable("main", "t",
      Seq((1 to 600).map(i => (10000 + i.toLong, 500L + (i % 300)))
        .toDF("id", "grp")),
      Append, cfg, "l2")
    val n2 = ndv()
    assert((n2 - 800).abs.toDouble <= 800 * 0.03, s"NDV $n2 vs exact 800")

    // compaction restages files and rebuilds their sketches from the
    // table property: the estimate survives maintenance
    assert(Maintenance.compact(cat.loadTable("main", "t"), retryUnitMs = 1))
    val m2 = cat.loadTable("main", "t").metadata
    assert(m2.currentFiles.forall(_.stats.get("grp").exists(_.hll.isDefined)),
      "compacted files must carry rebuilt sketches")
    val n3 = ndv()
    assert((n3 - 800).abs.toDouble <= 800 * 0.03, s"post-compact NDV $n3")

    // a column with NO sketches (id was not declared) falls back to the
    // ANALYZE-less default: no NDV reported, nothing throws
    val idNdv = iso.sql("SELECT id, grp FROM gcb3.main.t")
      .queryExecution.optimizedPlan.stats.attributeStats.collectFirst {
        case (a, s) if a.name == "id" => s.distinctCount
      }.flatten
    assert(idNdv.isEmpty, s"unsketched column must not invent an NDV: $idNdv")
  }
}
