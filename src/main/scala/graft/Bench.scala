package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":"total","value":N,"unit":"sec",...}.
  * Driver runs per-round → BENCH_r{N}.json.
  *
  * Each query is timed best-of-2 (`value`/`queries` are the per-query
  * minima; `queries_raw` carries every run) — a single pass conflates
  * plan cost with JIT/page-cache/machine-contention noise, which made
  * round signals untrustworthy (r1: 137.8 s contended vs 57.9 s idle on
  * the identical commit). */
object Bench {

  /** 1-minute system load average from /proc/loadavg (linux), -1 when
    * unreadable. Recorded around the run so a contended machine is
    * self-evident in the artifact instead of needing a re-measurement
    * (round-6 adjudication: driver bench showed 3-6x inflation on w14/
    * w7/w15 purely from machine contention). */
  private def loadavg1m(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadBefore = loadavg1m()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        classOf[graft.catalog.GraftSqlExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM + parquet-footer + catalyst warmup so per-query numbers measure
    // the plan, not first-touch classloading.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // Optional entry subset (comma-separated names): isolated idle
    // re-measures of specific entries without paying for the full suite.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      // several operators cache intermediates (shingle sets, LSH buckets)
      // that stay referenced for the session: without clearing, 127
      // queries accumulate executor-memory pressure and the LATER
      // entries' numbers measure GC debt, not their plans (sf1: q26
      // printed 18.5 s inside the suite vs 8.7 s isolated). Clearing
      // between entries makes each number a cold-cache measurement of
      // that query alone.
      spark.catalog.clearCache()
      name -> times
    }
    val qs = results.map { case (k, ts) => "\"" + k + "\":" + ts.min }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, ts) => "\"" + k + "\":[" + ts.mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2.min).sum else 0.0
    val loadAfter = loadavg1m()
    // loadavg above ~1.5x the worker count means external contention:
    // numbers are not comparable across rounds (threshold in BASELINE.md).
    //
    // The stdout contract is ONE compact JSON line, LAST on stdout, and it
    // must fit the driver's 2,000-char capture tail — at 150+ entries the
    // full per-query map no longer does (rounds 8-10 stored unparseable
    // tails). So the line carries the totals plus the ten slowest
    // entries, and the FULL per-query map (minima + every raw run) goes
    // to a JSON file in the repo whose path the line names.
    val perQueryFile = new java.io.File(
      sys.props.getOrElse("user.dir", "."), "BENCH_FULL.json").getAbsolutePath
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_raw":$raw,"sf":"$sfDir","runs":$runs,"loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"cpus":$cpus}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(perQueryFile),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val slowest = results.sortBy(-_._2.min).take(10)
      .map { case (k, ts) => "\"" + k + "\":" + ts.min }
      .mkString("{", ",", "}")
    System.err.println(s"""{"queries_raw":$raw}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"slowest":$slowest,"per_query_file":"$perQueryFile","sf":"$sfDir","runs":$runs,"loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"cpus":$cpus}""")
    spark.stop()
  }
}
