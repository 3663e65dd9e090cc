package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity operators (SURVEY §2.11 ★): brute-force cosine
  * top-k as the exactness baseline, cosine near-dup pairs, and a
  * random-hyperplane LSH bucketed ANN as the scale path.
  *
  * Vector math uses the `zip_with`/`aggregate` higher-order functions —
  * codegen'd, no UDFs, arrays stay columnar.
  */
object Similarity {

  private def ensureRegistered(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession); df
  }

  /** Σ aᵢ·bᵢ as a fold over arbitrary-length arrays. NOTE: Spark's
    * higher-order functions are CodegenFallback (interpreted per row) —
    * fine off the hot path, but pairwise scoring should use
    * [[dotUnrolled]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Σ aᵢ·bᵢ via the native ArrayDot expression (tight codegen loop —
    * see graft.functions.ArrayDot for why neither higher-order folds nor
    * unrolled element_at chains survive on the hot path). Requires
    * GraftFunctions.register on the session (ensureRegistered below). */
  def fastDot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  def fastNorm(a: Column): Column = sqrt(fastDot(a, a))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force cosine top-k neighbors for each query vector.
    *
    * The query set is broadcast (small side), so the candidate scoring is
    * a map-only pass over the N embeddings; the only shuffle is the
    * per-query top-k window over N·|Q| scored rows. For very large N the
    * LSH variant below bounds the candidate set instead. */
  def bruteForceTopK(embeddings0: DataFrame, queries: DataFrame, k: Int = 10,
      dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    val e = embeddings.select(col(idCol).as("nbr_id"),
      asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", fastNorm(col("v")))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
      .withColumn("qnrm", fastNorm(col("qv")))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        fastDot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** Advisory floor below which the LSH-bucketed plan is pointless: at low
    * thresholds the per-plane agreement probability p = 1 - θ/π of a
    * boundary pair is so low (t=0.4 ⇒ θ≈66° ⇒ p≈0.63) that any
    * (planes, tables) choice with candidate volume below all-pairs
    * (T < 2^(P-1)) misses boundary pairs with near-certainty — LSH prunes
    * only when a similarity gap exists. Measured on the driver data:
    * qualifying pairs sit at 0.401-0.601, i.e. zero gap above t=0.4. */
  val BucketedMinThreshold = 0.8

  /** All pairs with cosine similarity above `threshold` (embedding-space
    * near-dup detection). EXACT by default: the approximate plan drops
    * genuine pairs (per-pair recall at cosine 0.8 with 12 planes × 8
    * tables is ≈0.41), so it must never be silently substituted for a
    * result a caller treats as exact. Opt in with `approx = true` to get
    * [[cosineNearDupPairsBucketed]] — LSH-bucketed candidates + exact
    * verification, the corpus-scale plan for high thresholds. */
  def cosineNearDupPairs(embeddings0: DataFrame, threshold: Double,
      dim: Int = 64, approx: Boolean = false,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    if (approx) {
      require(threshold >= BucketedMinThreshold,
        s"approx plan needs a similarity gap: threshold $threshold < " +
          s"$BucketedMinThreshold cannot be pruned by LSH without missing " +
          "boundary pairs — use the exact plan (approx = false)")
      cosineNearDupPairsBucketed(embeddings0, threshold,
        dim = dim, idCol = idCol, vecCol = vecCol)
    } else cosineNearDupPairsExact(embeddings0, threshold, dim, idCol, vecCol)

  /** Exact all-pairs formulation — the oracle for the bucketed plan, and
    * the only correct plan when the threshold leaves no similarity gap. */
  def cosineNearDupPairsExact(embeddings0: DataFrame, threshold: Double,
      dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    val e = embeddings.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", fastNorm(col("v")))
    e.as("x").join(e.as("y"), col(s"x.$idCol") < col(s"y.$idCol"))
      .withColumn("cosine",
        fastDot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")))
      .filter(col("cosine") > threshold)
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Corpus-scale near-dup pairs: multi-table sign-bit LSH buckets
    * generate candidates (self-join on (table, bucket), never all-pairs),
    * then candidates are verified with the exact cosine — precision is
    * always 1; recall is 1 - (1 - p^P)^T per pair with p = 1 - θ/π
    * (identical vectors share every bucket of every table, so exact
    * duplicates are found with certainty). Candidate volume scales with
    * T · Σ_buckets occ², not N² — per-bucket occupancy is the knob:
    * more planes ⇒ smaller buckets ⇒ cheaper join, lower recall. */
  def cosineNearDupPairsBucketed(embeddings0: DataFrame, threshold: Double,
      numPlanes: Int = 12, tables: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    verifyCosineCandidates(
      cosineNearDupCandidatesBucketed(embeddings0, numPlanes, tables, dim,
        idCol, vecCol), threshold)

  /** The candidate half of [[cosineNearDupPairsBucketed]]: LSH-bucketed
    * pairs WITH their vectors, pre-verification — exposed so callers can
    * stage the candidate set (the approximate, non-SQL-portable step)
    * for an oracle that re-derives the exact verification over it. */
  def cosineNearDupCandidatesBucketed(embeddings0: DataFrame,
      numPlanes: Int = 12, tables: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    val b = lshBuckets(embeddings, numPlanes, tables, dim, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("table"), col("bucket"))
    // candidate pairs share a bucket in ANY table; dedupe across tables
    // while carrying the vectors so verification needs no further join
    b.as("x").join(b.as("y"),
        col("x.table") === col("y.table") &&
        col("x.bucket") === col("y.bucket") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        col(s"x.$vecCol").as("va0"), col(s"y.$vecCol").as("vb0"))
      .dropDuplicates("a", "b")
  }

  /** Exact-cosine verification over a candidate-pair frame — precision is
    * always 1 regardless of how candidates were generated. */
  def verifyCosineCandidates(cand: DataFrame, threshold: Double): DataFrame =
    cand
      .withColumn("va", asDouble(col("va0")))
      .withColumn("vb", asDouble(col("vb0")))
      .withColumn("cosine",
        fastDot(col("va"), col("vb")) / (fastNorm(col("va")) * fastNorm(col("vb"))))
      .filter(col("cosine") > threshold)
      .select(col("a"), col("b"), round(col("cosine"), 4).as("cosine"))

  /** Per-vector int8 (0..255) quantization with reconstruction-error
    * stats — the standard 4× memory lever for corpus-scale ANN (float32
    * embeddings dominate index RAM; scalar quantization keeps recall
    * within ~1-2% at 1/4 the footprint). Codes use floor() rather than
    * round() so the arithmetic is bit-portable across engines (no
    * half-even/half-up divergence), and the output carries scalar
    * summaries (code checksum, mean abs error) rather than the code
    * array. Map-only — scales as a full-scan transform. */
  def quantizeInt8(embeddings0: DataFrame, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    val withRange = embeddings
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
    // degenerate (constant) vectors have mx == mn: every component maps to
    // code 0 with zero reconstruction error, never NaN from the 0/0
    val codes = transform(col("v"),
      x => when(col("mx") === col("mn"), lit(0.0))
        .otherwise(floor((x - col("mn")) * lit(255.0) / (col("mx") - col("mn")))))
    withRange
      .withColumn("q", codes)
      .withColumn("recon_err", transform(col("v"),
        x => when(col("mx") === col("mn"), lit(0.0))
          .otherwise(abs(x - (col("mn") + floor((x - col("mn")) * lit(255.0) /
            (col("mx") - col("mn"))) * (col("mx") - col("mn")) / lit(255.0))))))
      .select(col(idCol),
        round(col("mn") + lit(1e-9), 4).as("qmin"),
        round(col("mx") + lit(1e-9), 4).as("qmax"),
        aggregate(col("q"), lit(0.0), _ + _).cast("long").as("q_checksum"),
        round(aggregate(col("recon_err"), lit(0.0), _ + _) / lit(dim.toDouble)
          + lit(1e-9), 6).as("mean_abs_err"))
  }

  /** Deterministic random hyperplanes for sign-bit LSH; `seed` varies per
    * hash table. */
  private def hyperplanes(numPlanes: Int, dim: Int, seed: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket ids, one per hash table: bit p of table t =
    * sign(v . plane_tp). Output: (id, vec, table, bucket) — one row per
    * table. Multi-table LSH is the standard recall lever: a true neighbor
    * is a candidate if it shares a bucket in ANY table. */
  def lshBuckets(embeddings0: DataFrame, numPlanes: Int, tables: Int, dim: Int,
      idCol: String, vecCol: String): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    val v = asDouble(col(vecCol))
    val tableCols = (0 until tables).map { t =>
      val bucket = hyperplanes(numPlanes, dim, seed = 42 + t).zipWithIndex.map {
        case (p, i) =>
          val planeArr = array(p.map(lit): _*)
          when(fastDot(v, planeArr) >= 0, lit(1L << i)).otherwise(0L)
      }.reduce[Column](_.bitwiseOR(_))
      struct(lit(t).as("table"), bucket.as("bucket"))
    }
    embeddings.select(col(idCol), col(vecCol),
      explode(array(tableCols: _*)).as("tb"))
      .select(col(idCol), col(vecCol),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  /** Above this `nlist·dim` (or `ksub·dim` for PQ codebooks) product,
    * centroid assignment switches from plan-literal arrays to a
    * broadcast one-row centroid frame: literal plans codegen a flat
    * argmax (fastest at small nlist) but grow the plan — and the
    * generated method bodies — linearly with nlist·dim, which breaks
    * down at the thousands-of-lists scale a 100 TB corpus needs. */
  val LiteralPlanMax = 4096

  /** ONE-row frame carrying the whole centroid set as an array column —
    * attached to any frame via a broadcast single-row join (no row
    * multiplication, no literals in the plan). Fields: `_1` list id,
    * `_2` centroid vector, `_3` its norm. */
  private[llmops] def centroidFrame(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Int, Seq[Double], Double)]): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(cents)).toDF("__cents")
  }

  /** Argmax-cosine list id of `v` against the broadcast centroid array:
    * a single `aggregate()` pass over `__cents` — per-row work identical
    * to the literal argmax, plan size O(1). */
  private[llmops] def argmaxList(v: Column): Column =
    aggregate(col("__cents"),
      struct(lit(-1).as("list"), lit(Double.MinValue).as("score")),
      (acc, c) => {
        val score = fastDot(v, c.getField("_2")) /
          (fastNorm(v) * c.getField("_3"))
        when(score > acc.getField("score"),
          struct(c.getField("_1").as("list"), score.as("score")))
          .otherwise(acc)
      }).getField("list")

  /** IVF (inverted-file) ANN top-k: coarse quantization into `nlist`
    * centroid lists, queries probe their `nprobe` nearest lists, exact
    * scoring on the probed candidates only.
    *
    * Centroids are a deterministic uniform sample of corpus vectors (the
    * `nlist` smallest `xxhash64(id)` values) — the standard IVF bootstrap
    * without an iterative k-means pass, collected driver-side
    * (metadata-scale: `nlist` rows). Assignment: below [[LiteralPlanMax]]
    * they bake into the plan as literals (codegen'd argmax of `nlist`
    * ArrayDot scores); above it the corpus argmaxes against a broadcast
    * one-row centroid frame instead — same semantics, bounded plan.
    * Per-query candidate count scales with corpus/nlist x nprobe,
    * not corpus size; the corpus shuffles once on its list id. */
  def ivfTopK(embeddings0: DataFrame, queries: DataFrame, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nprobe <= nlist, "nprobe must not exceed nlist")
    val embeddings = ensureRegistered(embeddings0)
    val cents: Seq[(Int, Seq[Double], Double)] = embeddings
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy(col("__h"), col(idCol)).limit(nlist)
      .collect().zipWithIndex.map { case (r, i) =>
        val v = r.getSeq[Double](r.fieldIndex("v"))
        (i, v, math.sqrt(v.map(x => x * x).sum))
      }.toSeq

    // argmax/arg-top-nprobe of cosine against the literal centroids
    def probeLists(v: Column, take: Int): Column = {
      val scored = cents.map { case (idx, c, nrm) =>
        val cArr = array(c.map(lit): _*)
        struct((fastDot(v, cArr) / (fastNorm(v) * lit(nrm))).as("score"),
          lit(idx).as("list"))
      }
      slice(sort_array(array(scored: _*), asc = false), 1, take)
    }

    val spark = embeddings.sparkSession
    val literal = nlist.toLong * dim <= LiteralPlanMax
    val corpus =
      if (literal)
        embeddings
          .select(col(idCol).as("nbr_id"), asDouble(col(vecCol)).as("v"))
          .withColumn("list", probeLists(col("v"), 1).getItem(0).getField("list"))
      else
        embeddings
          .select(col(idCol).as("nbr_id"), asDouble(col(vecCol)).as("v"))
          .crossJoin(broadcast(centroidFrame(spark, cents)))
          .withColumn("list", argmaxList(col("v")))
          .drop("__cents")
    val qs0 = ensureRegistered(queries)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val qs =
      if (literal)
        qs0.withColumn("pl", explode(probeLists(col("qv"), nprobe)))
          .select(col("query_id"), col("qv"), col("pl.list").as("list"))
      else {
        // queries are broadcast-sized by contract: explode the centroid
        // array and window-rank the |Q|·nlist scores for the top-nprobe
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("list"))
        qs0.crossJoin(broadcast(centroidFrame(spark, cents)))
          .select(col("query_id"), col("qv"), explode(col("__cents")).as("c"))
          .withColumn("list", col("c._1"))
          .withColumn("score", fastDot(col("qv"), col("c._2")) /
            (fastNorm(col("qv")) * col("c._3")))
          .withColumn("__r", row_number().over(w))
          .filter(col("__r") <= nprobe)
          .select(col("query_id"), col("qv"), col("list"))
      }
    val scored = corpus.join(broadcast(qs), Seq("list"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        fastDot(col("v"), col("qv")) / (fastNorm(col("v")) * fastNorm(col("qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** The (query_id, nbr_id) candidate pairs [[ivfTopK]] scores — the
    * probed-list join without the scoring tail. Staged as parquet, an
    * external oracle can verify the exact top-k over the SAME candidate
    * sets (and any drift between this derivation and [[ivfTopK]]'s shows
    * up as a result mismatch, so the check is self-sealing). */
  def ivfCandidatePairs(embeddings: DataFrame, queries: DataFrame,
      nlist: Int = 16, nprobe: Int = 4, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopK(embeddings, queries, k = Int.MaxValue, nlist, nprobe, dim,
      idCol, vecCol)
      .select(col("query_id"), col("nbr_id"))

  /** ANN top-k via multi-table LSH: candidates = union over tables of
    * same-bucket vectors, scored exactly, per-query top-k. Recall versus
    * `bruteForceTopK` follows the multi-table S-curve (pinned in the
    * spec); per-query work scales with bucket occupancy x tables, not
    * corpus size. */
  def lshTopK(embeddings0: DataFrame, queries: DataFrame, k: Int = 10,
      numPlanes: Int = 4, tables: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    val eb = lshBuckets(embeddings, numPlanes, tables, dim, idCol, vecCol)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("ev"),
        col("table"), col("bucket"))
    val qb = lshBuckets(queries, numPlanes, tables, dim, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv0"),
        col("table"), col("bucket"))
    val candidates = eb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"), col("ev"), col("qv0"))
      .distinct() // union over tables
    val scored = candidates
      .withColumn("v", asDouble(col("ev")))
      .withColumn("qv", asDouble(col("qv0")))
      .withColumn("cosine",
        fastDot(col("v"), col("qv")) / (fastNorm(col("v")) * fastNorm(col("qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** The (query_id, nbr_id) candidate pairs [[lshTopK]] scores — union
    * over tables of same-bucket pairs. Same self-sealing staged-oracle
    * role as [[ivfCandidatePairs]]. */
  def lshCandidatePairs(embeddings: DataFrame, queries: DataFrame,
      numPlanes: Int = 4, tables: Int = 8, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lshTopK(embeddings, queries, k = Int.MaxValue, numPlanes, tables, dim,
      idCol, vecCol)
      .select(col("query_id"), col("nbr_id"))

  /** Reciprocal-rank fusion of N retrieval rankings (hybrid search: e.g.
    * BM25 lexical ranks fused with embedding-cosine ranks). Each input
    * carries (idCol, "rank"); a document's fused score is
    * Σ 1/(rrfK + rank) over the lists it appears in — the standard RRF
    * formula, robust to incomparable score scales.
    *
    * Scale: the inputs are already top-k-truncated rankings (k rows per
    * list, not corpora), so the union + groupBy is list-sized; fusion
    * adds no corpus-scale work to the underlying retrievers. */
  def rrf(rankings: Seq[DataFrame], k: Int = 15, rrfK: Int = 60,
      idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val tagged = rankings.map(_.select(col(idCol), col("rank")))
      .reduce(_ unionAll _)
    tagged.groupBy(idCol)
      .agg(round(sum(lit(1.0) / (lit(rrfK.toDouble) + col("rank"))) + lit(1e-9), 6)
          .as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }
}
