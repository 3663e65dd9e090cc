package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.{Dedup, Similarity}

/** sf0.1 pins for the three driver entries DuckDB cannot oracle (no
  * xxhash64 there): l11 LSH-ANN and l20 IVF-ANN recall floors against the
  * exact brute-force top-k, and l8 SimHash band completeness — at the
  * LARGEST local scale factor, so the floors hold on the same data volume
  * the driver benches, not just the small spec corpus. */
class AnnScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.1"
  private lazy val docs = Tables.t(spark, sf, "documents").cache()
  private lazy val emb = Tables.t(spark, sf, "embeddings").cache()

  private lazy val brute = {
    val queries = emb.filter(col("vec_id") < 30)
    Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("l11 pin at sf0.1: LSH-ANN recall floor vs brute force (2000 vectors)") {
    val queries = emb.filter(col("vec_id") < 30)
    val ann = Similarity.lshTopK(emb, queries, k = 10, numPlanes = 4, tables = 8)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    // near-orthogonal gaussians are sign-LSH's worst case; the 8x4
    // multi-table S-curve predicts ~0.7 there — same floor as sf0.001
    assert(recall >= 0.4, s"sf0.1 LSH-ANN recall $recall below floor")
  }

  test("l20 pin at sf0.1: IVF-ANN deterministic with recall floor vs brute force") {
    val queries = emb.filter(col("vec_id") < 30)
    def run() = Similarity.ivfTopK(emb, queries, k = 10, nlist = 16, nprobe = 4)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = run()
    assert(ivf == run(), "sampled centroids must be deterministic at sf0.1")
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.2, s"sf0.1 IVF recall $recall below floor")
  }

  test("large-nlist IVF uses the broadcast-centroid path and matches the literal plan") {
    val queries = emb.filter(col("vec_id") < 30)
    // nlist=256 · dim=64 = 16384 > LiteralPlanMax: the broadcast path
    // must produce IDENTICAL assignments/top-k to a literal plan at the
    // same nlist (same centroids, same argmax), deterministically
    def run() = Similarity.ivfTopK(emb, queries, k = 10, nlist = 256, nprobe = 64)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val joined = run()
    assert(joined == run(), "broadcast-centroid IVF must be deterministic")
    val recall = (brute & joined).size.toDouble / brute.size
    assert(recall >= 0.2, s"nlist=256 IVF recall $recall below floor")
    // the plan stays bounded: no 256-arm literal argmax in the plan text
    val plan = Similarity.ivfTopK(emb, queries, k = 10, nlist = 256, nprobe = 64)
      .queryExecution.optimizedPlan.toString
    assert(plan.length < 300000, s"plan blew up: ${plan.length} chars")
  }

  test("l8 pin at sf0.1: banded simhash finds EVERY planted hamming<=3 pair") {
    // plant near-identical docs: one appended token perturbs only a few
    // simhash bits; keep exactly the planted pairs whose TRUE hamming
    // distance lands <= 3 and assert band completeness on them
    // (pigeonhole: 4 x 16-bit bands must catch every such pair)
    val planted = docs.limit(200)
      .select(col("doc_id"), col("text"))
      .union(docs.limit(200).select(col("doc_id") + 1000000L,
        concat(col("text"), lit(" zq7perturb"))))
    val sims = Dedup.simHash(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = (0 until 200).map(_.toLong)
      .filter(id => sims.contains(id) && sims.contains(id + 1000000L))
      .filter(id => java.lang.Long.bitCount(sims(id) ^ sims(id + 1000000L)) <= 3)
      .map(id => (id, id + 1000000L)).toSet
    assert(truth.size >= 50,
      s"only ${truth.size} planted pairs landed at hamming<=3 — weak test corpus")
    val banded = Dedup.simHashPairs(planted, 3).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(banded),
      s"banded missed ${(truth -- banded).size} of ${truth.size} planted pairs")
    // precision: every banded pair really is within distance 3
    assert(banded.forall { case (a, b) =>
      java.lang.Long.bitCount(sims.getOrElse(a, 0L) ^ sims.getOrElse(b, 0L)) <= 3
    })
  }
}
