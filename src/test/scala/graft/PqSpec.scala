package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.{Pq, Similarity}

/** Pins for l41 PQ-ANN (rows-only at the driver — the codebook k-means
  * is not portable SQL): determinism, the compressed-index shape, ADC
  * recall vs exact brute force at sf0.1, and reconstruction-cosine
  * sanity. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.1"
  private lazy val emb = Tables.t(spark, sf, "embeddings").cache()
  private lazy val queries = emb.filter(col("vec_id") < 30)

  test("encode is deterministic and emits m small codes per vector") {
    val books = Pq.codebooks(emb, m = 8, ksub = 16, iters = 4)
    val books2 = Pq.codebooks(emb, m = 8, ksub = 16, iters = 4)
    assert(books.flatten.flatten.toSeq == books2.flatten.flatten.toSeq,
      "codebook k-means must replay bit-identically")
    val enc = Pq.encode(emb, books).cache()
    val codes = enc.select(explode(col("codes"))).as[Int].collect()
    assert(enc.count() == emb.count())
    assert(enc.select(size(col("codes"))).distinct().as[Int].collect().toSeq == Seq(8))
    assert(codes.forall(c => c >= 0 && c < 16),
      "codes must index the ksub=16 codebook (4 bits/subspace)")
  }

  test("l43 at nlist=256: broadcast coarse centroids + ksub=64 broadcast codebooks") {
    // nlist·dim and ksub·dim both exceed LiteralPlanMax → both the
    // coarse assignment and the subspace encode take the broadcast
    // paths; recall floor and determinism must hold exactly as at
    // literal sizes
    val queries = emb.filter(col("vec_id") < 30)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Pq.ivfPqTopK(emb, queries, k = 10, nlist = 256, nprobe = 64,
      ksub = 64, iters = 1)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run()
    assert(got == run(), "broadcast-path IVF-PQ must replay bit-identically")
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF-PQ nlist=256 recall $recall below floor")
  }

  test("non-long id columns are accepted (cast to long at collect)") {
    val intIds = emb.limit(200)
      .withColumn("vec_id", col("vec_id").cast("int"))
    val q = intIds.filter(col("vec_id") < 5)
    val out = Pq.adcTopK(intIds, q, k = 3, iters = 1)
    assert(out.count() > 0, "IntegerType vec_id must not throw at collect")
  }

  test("l41 pin at sf0.1: ADC top-k recall floor vs brute force, deterministic") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Pq.adcTopK(emb, queries, k = 10)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = run()
    assert(pq == run(), "ADC top-k must be deterministic")
    val recall = (brute & pq).size.toDouble / brute.size
    // near-orthogonal gaussians are quantization's worst case; exact
    // re-ranking of the ADC shortlist (rerank=4) lifts recall well above
    // the code-only ~0.20
    assert(recall >= 0.3, s"sf0.1 PQ-ADC recall $recall below floor")
    info(s"PQ-ADC recall@10 = $recall")
  }

  test("l43 pin at sf0.1: IVF-PQ recall floor, deterministic, candidates bounded") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Pq.ivfPqTopK(emb, queries, k = 10)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run()
    assert(got == run(), "IVF-PQ must be deterministic")
    val recall = (brute & got).size.toDouble / brute.size
    // two approximations stack (list pruning x 4-bit codes) on the
    // worst-case near-orthogonal corpus; rerank recovers most of PQ's
    // loss, IVF keeps what lands in probed lists
    assert(recall >= 0.15, s"sf0.1 IVF-PQ recall $recall below floor")
    info(s"IVF-PQ recall@10 = $recall")
  }

  test("ADC cosine approximates the exact cosine within quantization error") {
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select(col("query_id"), col("nbr_id"), col("cosine").as("c_exact"))
    val approx = Pq.adcTopK(emb, queries, k = 10)
      .select(col("query_id"), col("nbr_id"), col("cosine").as("c_pq"))
    val joined = exact.join(approx, Seq("query_id", "nbr_id"))
      .select(abs(col("c_exact") - col("c_pq"))).as[Double].collect()
    assert(joined.nonEmpty)
    val meanErr = joined.sum / joined.size
    assert(meanErr < 0.25, s"mean |cos_exact - cos_pq| $meanErr too large")
  }
}
