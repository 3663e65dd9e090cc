package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.SemanticDedup

/** Pins the SemDeDup pipeline (l39): k-means has no SQL oracle, so the
  * distributed implementation is held to (1) an exact driver-side Lloyd
  * replay, (2) run-to-run determinism, (3) 100% recall of planted exact
  * duplicates, (4) pruning precision — every pruned id really has a
  * lower-id within-cluster partner at or above the cosine threshold. */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.01"
  private def emb = graft.Tables.t(spark, dir, "embeddings")

  private def quantize(x: Double): Double = math.rint(x * 1e6) / 1e6

  /** Exact driver-side Lloyd with the same seeds / iteration count /
    * centroid quantization as the distributed path — only the iteration
    * math itself is independently re-implemented. */
  private def driverLloyd(vecs: Map[Long, Array[Double]], seeds: Seq[Long],
      iters: Int): Array[Array[Double]] = {
    var centroids = seeds.map(id => vecs(id).map(quantize)).toArray
    for (_ <- 1 to iters) {
      val assigned = vecs.toSeq.map { case (id, v) =>
        val d = centroids.map(c =>
          c.map(x => x * x).sum - 2.0 * c.zip(v).map { case (a, b) => a * b }.sum)
        (d.indexOf(d.min), v)
      }
      val byC = assigned.groupBy(_._1)
      centroids = centroids.zipWithIndex.map { case (prev, ci) =>
        byC.get(ci).fold(prev) { members =>
          val dim = prev.length
          val s = Array.ofDim[Double](dim)
          members.foreach { case (_, v) =>
            var i = 0; while (i < dim) { s(i) += v(i); i += 1 }
          }
          s.map(x => quantize(x / members.size))
        }
      }
    }
    centroids
  }

  test("distributed k-means matches the exact driver-side Lloyd replay") {
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val expected = driverLloyd(vecs, SemanticDedup.seedIds(emb, 8), iters = 5)
    val got = SemanticDedup.kmeansCentroids(emb, k = 8, iters = 5)
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), ci) =>
      assert(g.toSeq == e.toSeq, s"centroid $ci diverged from the exact replay")
    }
    // assignments under those centroids agree with the driver argmin
    val assigned = SemanticDedup.assign(emb, got)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      val d = expected.map(c =>
        c.map(x => x * x).sum - 2.0 * c.zip(v).map { case (a, b) => a * b }.sum)
      assert(assigned(id) == d.indexOf(d.min), s"assignment diverged for vec $id")
    }
  }

  test("semanticDedup is deterministic across runs") {
    val r1 = SemanticDedup.clusterStats(emb, k = 8, iters = 5, threshold = 0.4)
      .collect().map(_.toSeq).toSeq
    val r2 = SemanticDedup.clusterStats(emb, k = 8, iters = 5, threshold = 0.4)
      .collect().map(_.toSeq).toSeq
    assert(r1 == r2)
    assert(r1.map(_(1).asInstanceOf[Long]).sum == emb.count())
  }

  test("planted exact duplicates are pruned with 100% recall") {
    // copy vectors 3, 7, 11 under new ids: identical vectors must land in
    // the copied vector's cluster and be pruned (cosine 1.0 >= threshold,
    // copy id > original id)
    val originals = Seq(3L, 7L, 11L)
    val copies = emb.filter(col("vec_id").isin(originals: _*))
      .withColumn("vec_id", col("vec_id") + lit(100000L))
    val withDups = emb.unionByName(copies)
    val result = SemanticDedup.semanticDedup(withDups, k = 8, iters = 5,
      threshold = 0.4)
    val prunedIds = result.filter(col("pruned"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    originals.foreach { id =>
      assert(prunedIds.contains(id + 100000L), s"planted copy of $id not pruned")
    }
  }

  test("pruning precision: every pruned id has a lower-id within-cluster partner") {
    val result = SemanticDedup.semanticDedup(emb, k = 8, iters = 5, threshold = 0.4)
    val rows = result.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byCluster = rows.groupBy(_._2)
    var nPruned = 0
    rows.filter(_._3).foreach { case (id, cl, _) =>
      nPruned += 1
      val partners = byCluster(cl).filter(_._1 < id)
      assert(partners.exists(p => cos(vecs(p._1), vecs(id)) >= 0.4 - 1e-9),
        s"pruned $id has no qualifying partner in cluster $cl")
    }
    assert(nPruned > 0, "threshold 0.4 should prune at least one vector at sf0.01")
  }
}
