package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.SemanticDedup

/** The SemDeDup k-axis at corpus scale — the r14 centerpiece measured.
  *
  * The within-cluster candidate mass of incremental semantic dedup is
  * `incoming × corpus / k`: holding the corpus fixed, k IS the knob
  * that keeps verification near-linear, and the broadcast-frame argmin
  * (plan size O(1) in k) is what makes large k runnable at all — the
  * literal plan at k=512, dim=64 would inline 32,768 doubles into one
  * projection. This bench runs BOTH k values over the same corpus:
  *
  *   - assignment-only cost, full corpus, k=8 (literal plan) vs k=512
  *     (frame plan) — the map-side pass whose cost must stay flat;
  *   - per-batch incremental dedup (candidates + exact-cosine verify)
  *     at equal-candidate-mass batch sizes, reporting docs/s — the
  *     per-doc cost ∝ corpus/k claim, measured;
  *   - planted exact copies must be absorbed under both k (the
  *     structural recall contract is k-independent).
  *
  * Centroids are hash-spread corpus vectors (the IVF bootstrap), not
  * Lloyd's — cluster geometry quality is irrelevant to the cost shape
  * being measured, and the driver-side collect stays k rows.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/repo/testdata-sf100 \
  *   sbt "runMain graft.tools.SemDedupScaleBench" */
object SemDedupScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/testdata-sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-semdedup-scale-bench")
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
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val half = n / 2
    val corpus = e.filter(col("vec_id") < half).cache()
    val corpusN = corpus.count()
    println(s"SEMSCALE corpus=$corpusN of $n vectors ($sfDir)")

    def seededCentroids(k: Int): Array[Array[Double]] = {
      val ids = SemanticDedup.seedIds(corpus, k)
      val byId = corpus.filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .toMap
      ids.map(byId).toArray
    }

    for (k <- Seq(8, 512)) {
      val cents = seededCentroids(k)
      val plan = if (k.toLong * 64 <= graft.llmops.Similarity.LiteralPlanMax)
        "literal" else "frame"
      // 1. assignment-only: one map pass over the full corpus
      val (_, tAssign) = timed {
        SemanticDedup.assign(corpus, cents).select(max(col("cluster")))
          .collect()
      }
      println(f"SEMSCALE k=$k%4d plan=$plan%-7s assign_full_corpus " +
        f"${tAssign}%.2f s (${corpusN / tAssign}%.0f vec/s)")
      // 2. per-batch dedup at ~equal candidate mass across k:
      //    batch = base * k / 8 so candidates ~ batch * corpus / k stays
      //    fixed — seconds/doc is then the honest per-doc cost at that k
      val batchN = math.min(n - half, 2000L * k / 8)
      val batch = e.filter(col("vec_id") >= half &&
          col("vec_id") < half + batchN)
        .union(corpus.filter(col("vec_id") % 9 === 0)
          .limit(500)
          .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding")))
      val assignTbl = SemanticDedup.assign(corpus, cents)
      val (cand, tCand) = timed {
        SemanticDedup.incrementalSemanticCandidates(batch, assignTbl, cents)
          .count()
      }
      val (res, tDedup) = timed {
        val r = SemanticDedup.incrementalSemanticDedup(batch, assignTbl, cents)
          .cache()
        val absorbed = r.filter(col("vec_id") >= 5000000L && !col("is_new"))
          .count()
        val planted = r.filter(col("vec_id") >= 5000000L).count()
        require(planted > 0 && absorbed == planted,
          s"k=$k: planted exact copies must all absorb ($absorbed/$planted)")
        val out = r.count()
        r.unpersist()
        out
      }
      val batchTotal = batchN + 500
      println(f"SEMSCALE k=$k%4d batch=$batchTotal%6d candidates=$cand%10d " +
        f"(${cand.toDouble / batchTotal}%.0f/doc) cand_pass ${tCand}%.2f s " +
        f"dedup_pass ${tDedup}%.2f s (${batchTotal / tDedup}%.0f doc/s)")
    }
    spark.stop()
  }
}
