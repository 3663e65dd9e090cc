package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (SURVEY §2.11 ★): deterministic
  * k-means over the embedding column partitions the corpus into clusters,
  * then near-duplicate pruning runs WITHIN each cluster only — the
  * quadratic pair search that is impossible corpus-wide at 100 TB becomes
  * k independent cluster-local searches (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540 — method only; no code consulted).
  *
  * Scale design:
  *  - centroids live on the driver as literals (k·dim doubles), so every
  *    assignment pass is ONE map-side codegen scan — no join, no shuffle;
  *  - the update step shuffles k·dim·partitions partial sums (posexplode
  *    + two-level agg with map-side combine), independent of corpus size;
  *  - iteration count is FIXED (no convergence data-dependence), keeping
  *    the whole pipeline deterministic and replayable;
  *  - at corpus scale k is chosen large (10⁴-10⁵) so clusters stay small
  *    and the within-cluster pair join stays near-linear.
  *
  * Determinism: centroids quantize to 6 decimals after every update, so
  * shuffle-order float noise (~1e-12 relative) cannot leak into
  * assignments; initial centroids are the vectors at evenly spaced ids.
  */
object SemanticDedup {

  private def ensureRegistered(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession); df
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Squared distance to a centroid literal via the codegen'd dot:
    * ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is shared across the k
    * distances and cancels in the argmin, so only -2x·c + ||c||² is
    * computed per centroid. */
  private def argminCluster(v: Column, centroids: Array[Array[Double]]): Column = {
    val scores = centroids.map { c =>
      val c2 = c.map(x => x * x).sum
      lit(c2) - lit(2.0) * Similarity.fastDot(v, typedlit(c.toSeq))
    }
    val arr = array(scores: _*)
    // first index of the min — deterministic tie-break by centroid index
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  private def quantize(x: Double): Double = math.rint(x * 1e6) / 1e6

  /** Deterministic seed selection: the k vectors with the smallest
    * xxhash64(id) — a pseudo-random but replayable spread, robust to
    * sparse/clustered id spaces, and scale-safe (global top-k is a
    * per-partition heap + driver merge, never a full sort). */
  def seedIds(embeddings0: DataFrame, k: Int,
      idCol: String = "vec_id"): Seq[Long] = {
    val embeddings = ensureRegistered(embeddings0)
    embeddings.select(col(idCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(k).collect().map(_.getLong(0)).toSeq
  }

  /** Fixed-iteration deterministic Lloyd's k-means. Returns the final
    * centroids; assignments follow from one more map pass. Initial
    * centroids are the vectors at [[seedIds]]. */
  def kmeansCentroids(embeddings0: DataFrame, k: Int = 8, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] = {
    val embeddings = ensureRegistered(embeddings0)
    val e = embeddings.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))

    val ids = seedIds(embeddings, k, idCol)
    val byId = e.filter(col("id").isin(ids: _*)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray.map(quantize)).toMap
    val seeds = ids.map(byId).toArray
    require(seeds.length == k,
      s"k-means init found ${seeds.length} of $k seeds (ids $ids)")

    (1 to iters).foldLeft(seeds) { (centroids, _) =>
      val assigned = e.withColumn("cluster", argminCluster(col("v"), centroids))
      // k·dim·partitions partial sums — corpus-size-independent shuffle
      val rows = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = rows.groupBy(_.getAs[Int]("cluster"))
      centroids.zipWithIndex.map { case (prev, ci) =>
        byCluster.get(ci).fold(prev) { rs => // empty cluster keeps its centroid
          val dim = prev.length
          val next = Array.ofDim[Double](dim)
          rs.foreach { r =>
            next(r.getAs[Int]("pos")) =
              quantize(r.getAs[Double]("s") / r.getAs[Long]("n"))
          }
          next
        }
      }
    }
  }

  /** Cluster assignment for every vector under the given centroids — one
    * map-side pass. */
  def assign(embeddings0: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    embeddings
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("cluster", argminCluster(col("v"), centroids))
      .select(col(idCol), col("cluster"), col("v"))
  }

  /** The full SemDeDup pipeline: k-means, then min-id-survivor cosine
    * pruning within each cluster. Returns per-vector rows with the
    * cluster id and a `pruned` flag (pruned = a lower-id vector in the
    * SAME cluster has cosine ≥ threshold). */
  def semanticDedup(embeddings0: DataFrame, k: Int = 8, iters: Int = 5,
      threshold: Double = 0.4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    val centroids = kmeansCentroids(embeddings, k, iters, idCol, vecCol)
    val a = assign(embeddings, centroids, idCol, vecCol)
      .withColumn("nrm", sqrt(Similarity.fastDot(col("v"), col("v"))))
    val l = a.select(col("cluster"), col(idCol).as("a_id"),
      col("v").as("av"), col("nrm").as("anrm"))
    val r = a.select(col("cluster"), col(idCol).as("b_id"),
      col("v").as("bv"), col("nrm").as("bnrm"))
    // within-cluster pair search only — the SemDeDup trick; cluster sizes
    // are bounded by choosing k ∝ corpus size
    val prunedIds = l.join(r, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .filter(Similarity.fastDot(col("av"), col("bv")) /
        (col("anrm") * col("bnrm")) >= threshold)
      .select(col("b_id").as(idCol)).distinct()
    a.join(prunedIds.withColumn("pruned", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("pruned"), lit(false)).as("pruned"))
  }

  /** Candidate pairs of an incoming batch against a COMMITTED corpus
    * assignment table: incoming vectors are assigned to the corpus's
    * centroids (a map-only pass over broadcast centroid literals) and
    * joined cluster-to-cluster. With the assignment table committed
    * under an `identity(cluster)` partition hint, the join SPJ-resolves:
    * the corpus side is served in its existing layout (map-only,
    * cluster-pruned) and only the incoming batch shuffles — the same
    * committed-state design as [[Dedup.sigBandKeys]], in embedding
    * space. */
  def incrementalSemanticCandidates(incoming: DataFrame,
      committedAssign: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(ensureRegistered(incoming), centroids, idCol, vecCol)
      .select(col("cluster"), col(idCol).as("inc_id"))
      .join(committedAssign.select(col("cluster"),
        col(idCol).as("corpus_id")), Seq("cluster"))
      .select(col("inc_id"), col("corpus_id"))

  /** Incremental SemDeDup: near-dup check of an incoming batch against a
    * COMMITTED corpus in embedding space — the semantic analogue of
    * [[Dedup.incrementalNearDedup]]. Candidates come from the
    * cluster-equality join above (identical vectors share the argmin
    * cluster STRUCTURALLY, so recall on exact duplicates is 1 — the
    * contract the driver entry pins); verification is exact cosine
    * against the candidates' committed vectors, so corpus text/raw
    * embeddings outside the touched clusters are never read. Ranking
    * uses the 4-decimal-rounded cosine (ties broken by smallest corpus
    * id) so best-match selection is reproducible across engines.
    * Returns one row per incoming vector: best corpus match at
    * `threshold` or NULL/is_new = true. */
  def incrementalSemanticDedup(incoming0: DataFrame,
      committedAssign: DataFrame, centroids: Array[Array[Double]],
      threshold: Double = 0.4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val incoming = ensureRegistered(incoming0)
    val inc = assign(incoming, centroids, idCol, vecCol)
      .withColumn("inrm", sqrt(Similarity.fastDot(col("v"), col("v"))))
      .select(col("cluster"), col(idCol).as("inc_id"),
        col("v").as("iv"), col("inrm"))
    val cor = committedAssign
      .select(col("cluster"), col(idCol).as("corpus_id"),
        asDouble(col("v")).as("cv"))
      .withColumn("cnrm", sqrt(Similarity.fastDot(col("cv"), col("cv"))))
    val best = inc.join(cor, Seq("cluster"))
      .select(col("inc_id"), col("corpus_id"),
        round(Similarity.fastDot(col("iv"), col("cv")) /
          (col("inrm") * col("cnrm")) + lit(1e-9), 4).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("inc_id")
      .agg(max(struct(col("cos"), (-col("corpus_id")).as("nid"))).as("bst"))
      .select(col("inc_id"), (-col("bst.nid")).as("match_id"),
        col("bst.cos").as("cos"))
    incoming.select(col(idCol))
      .join(best, col(idCol) === col("inc_id"), "left")
      .select(col(idCol), col("match_id"), col("cos").as("cosine"),
        col("match_id").isNull.as("is_new"))
  }

  /** Driver entry shape: per-cluster membership / pruning stats. */
  def clusterStats(embeddings: DataFrame, k: Int = 8, iters: Int = 5,
      threshold: Double = 0.4): DataFrame =
    semanticDedup(embeddings, k, iters, threshold)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("pruned"), 1L).otherwise(0L)).as("n_pruned"))
      .orderBy(col("cluster"))
}
