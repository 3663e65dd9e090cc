package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** Measures the r13 incremental near-dedup design point: per-batch cost
  * of deduping an incoming batch against a COMMITTED corpus, with the
  * corpus side served by (a) the bucket-partitioned band index read
  * through the DSv2 catalog (one-sided SPJ: corpus map-only, only the
  * batch shuffles) vs (b) the pre-r13 shape that re-derives and
  * re-shuffles the committed signature table's band keys on every batch.
  * One-time corpus commit cost is reported separately — it amortizes
  * over every future batch, the per-batch number is what a continuous
  * ingest pays forever.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.NearDedupBench
  * Prints one JSON line.
  */
object NearDedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-near-dedup-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    // corpus = all but the last `1/denom` of ids; batch = that slice +
    // planted near-copies of every `plantEvery`-th corpus doc. The
    // template-saturated sf100 corpus carries huge NATURAL near-dup
    // clusters, so candidate mass grows with batch size × cluster
    // structure regardless of index design — size the batch to the
    // node's spill room (a cluster spreads the same spill over N disks)
    val denom = sys.env.getOrElse("GRAFT_NDB_BATCH_DENOM", "100").toLong
    val plantEvery = sys.env.getOrElse("GRAFT_NDB_PLANT_EVERY", "50").toLong
    val cut = n - math.max(1L, n / denom)
    val corpus = docs.filter(col("doc_id") < cut)
    val batch = docs.filter(col("doc_id") >= cut)
      .union(corpus.filter(col("doc_id") % plantEvery === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat(col("text"), lit(" graftmarker")).as("text")))

    val wh = java.nio.file.Files.createTempDirectory("graft-ndb-").toString
    val iso = spark.newSession()
    iso.conf.set("spark.sql.catalog.g_ndb",
      classOf[graft.catalog.GraftSparkCatalog].getName)
    iso.conf.set("spark.sql.catalog.g_ndb.warehouse", wh)
    iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    iso.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    val cat = new graft.catalog.GraftCatalog(spark, wh)
    val w = new graft.write.GraftWriter(cat)
    val cfg = graft.write.WriteConfig(retryUnitMs = 10)
    val (_, tSigs) = timed(w.writeTable("main", "sigs",
      Seq(Dedup.minHashSignatures(corpus)), graft.write.Append, cfg, "seed"))
    val (_, tBands) = timed(w.writeTable("main", "bands",
      Seq(Dedup.sigBandKeys(cat.loadTable("main", "sigs").read())),
      graft.write.Append, cfg.copy(partitions =
        Seq(graft.partition.PartitionHint.bucket(64, "bkey"))), "seed"))

    val committed = iso.table("g_ndb.main.sigs")
    val committedIdx = iso.table("g_ndb.main.bands")
    val batchSigs = Dedup.minHashSignatures(batch).persist()
    batchSigs.count()

    def run(idx: Option[org.apache.spark.sql.DataFrame]): (Long, Double) = {
      // best-of-2: first run pays page-cache/JIT
      val times = (1 to 2).map { _ =>
        val (kept, t) = timed(
          Dedup.incrementalNearDedup(batchSigs, committed,
            committedBandKeys = idx)
            .filter(col("is_new")).count())
        (kept, t)
      }
      (times.head._1, times.map(_._2).min)
    }
    val (keptIdx, tIdx) = run(Some(committedIdx))
    val (keptDer, tDer) = run(None)
    require(keptIdx == keptDer,
      s"paths disagree: indexed kept $keptIdx, derived kept $keptDer")
    println(s"""{"metric":"near_dedup_batch","unit":"sec",""" +
      s""""sf":"$sfDir","corpus_docs":$cut,"batch_docs":${batchSigs.count()},""" +
      s""""commit_sigs_sec":${f"$tSigs%.2f"},"commit_bands_sec":${f"$tBands%.2f"},""" +
      s""""batch_indexed_sec":${f"$tIdx%.2f"},"batch_derived_sec":${f"$tDer%.2f"},""" +
      s""""kept":$keptIdx}""")
    spark.stop()
  }
}
