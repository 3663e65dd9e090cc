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
  *  - centroids live on the driver (k·dim doubles), so every assignment
  *    pass is ONE map-side scan — no shuffle: plan-literal arrays below
  *    [[Similarity.LiteralPlanMax]] (fastest codegen at small k), a
  *    broadcast one-row centroid frame above it (identical floats, plan
  *    size O(1) in k — the form that survives k=10⁴⁻⁵);
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
    * computed per centroid. Plan size grows with k·dim (every centroid
    * is an array literal), so this form is only used below
    * [[Similarity.LiteralPlanMax]]; past it, [[argminDist]] over a
    * broadcast centroid frame computes the SAME floats with an O(1)
    * plan — the k∝corpus doctrine above requires the frame path. */
  private[llmops] def argminCluster(v: Column,
      centroids: Array[Array[Double]]): Column = {
    val scores = centroids.map { c =>
      val c2 = c.map(x => x * x).sum
      lit(c2) - lit(2.0) * Similarity.fastDot(v, typedlit(c.toSeq))
    }
    val arr = array(scores: _*)
    // first index of the min — deterministic tie-break by centroid index
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  /** Argmin-distance cluster id against a broadcast one-row centroid
    * frame ([[Similarity.centroidFrame]] with `_3` = ||c||²): ONE
    * `aggregate()` pass — per-row float math IDENTICAL to
    * [[argminCluster]] (same `c² - 2x·c` expression, same first-min
    * tie-break), plan size O(1) in k. `excluding` skips one cluster id
    * (the multi-probe second pass). */
  private[llmops] def argminDist(v: Column,
      excluding: Option[Column] = None): Column =
    aggregate(col("__cents"),
      struct(lit(-1).as("cluster"), lit(Double.MaxValue).as("dist")),
      (acc, c) => {
        val d = c.getField("_3") -
          lit(2.0) * Similarity.fastDot(v, c.getField("_2"))
        val better = excluding match {
          case Some(ex) => d < acc.getField("dist") && c.getField("_1") =!= ex
          case None => d < acc.getField("dist")
        }
        when(better,
          struct(c.getField("_1").as("cluster"), d.as("dist")))
          .otherwise(acc)
      }).getField("cluster")

  /** Centroids in [[Similarity.centroidFrame]] shape with `_3` = ||c||²
    * (the constant the distance argmin needs). */
  private def centroidTuples(centroids: Array[Array[Double]]): Seq[(Int, Seq[Double], Double)] =
    centroids.zipWithIndex.map { case (c, i) =>
      (i, c.toSeq, c.map(x => x * x).sum)
    }.toSeq

  /** Add the argmin `cluster` column to a frame carrying `v`: literal
    * plan below [[Similarity.LiteralPlanMax]] (fastest codegen at small
    * k), broadcast centroid frame above it (same floats, O(1) plan —
    * the only form that survives the k=10⁴⁻⁵ a 100 TB corpus needs). */
  private def withCluster(df: DataFrame,
      centroids: Array[Array[Double]]): DataFrame = {
    val dim = if (centroids.isEmpty) 0 else centroids(0).length
    if (centroids.length.toLong * dim <= Similarity.LiteralPlanMax)
      df.withColumn("cluster", argminCluster(col("v"), centroids))
    else
      df.crossJoin(broadcast(Similarity.centroidFrame(df.sparkSession,
          centroidTuples(centroids))))
        .withColumn("cluster", argminDist(col("v")))
        .drop("__cents")
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
      val assigned = withCluster(e, centroids)
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
    * map-side pass (no join, no shuffle in either plan form). */
  def assign(embeddings0: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    withCluster(
      embeddings.select(col(idCol), asDouble(col(vecCol)).as("v")),
      centroids)
      .select(col(idCol), col("cluster"), col("v"))
  }

  /** Test seam: assignment with the plan form FORCED (literal vs
    * broadcast frame) — the spec asserts the two produce IDENTICAL
    * assignments at k≥512 and that the frame plan stays O(1) in k. */
  private[graft] def assignForced(embeddings0: DataFrame,
      centroids: Array[Array[Double]], literal: Boolean,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val embeddings = ensureRegistered(embeddings0)
    val base = embeddings.select(col(idCol), asDouble(col(vecCol)).as("v"))
    val out =
      if (literal) base.withColumn("cluster", argminCluster(col("v"), centroids))
      else base.crossJoin(broadcast(Similarity.centroidFrame(
          base.sparkSession, centroidTuples(centroids))))
        .withColumn("cluster", argminDist(col("v")))
        .drop("__cents")
    out.select(col(idCol), col("cluster"), col("v"))
  }

  /** Multi-probe assignment: each vector's `probes` NEAREST clusters
    * (probes ∈ {1, 2}), one row per probe. Probe 2 is the standard
    * near-copy-recall mitigation for incremental SemDeDup: a near-copy
    * sitting just across its source's cluster boundary is still a
    * candidate through its second-nearest cluster. Still map-only: the
    * second argmin is one more pass over the same broadcast centroids
    * (or literal array), and the row fan-out is ×probes on the PROBING
    * side only — the committed corpus side stays single-assignment. */
  def assignProbes(embeddings0: DataFrame, centroids: Array[Array[Double]],
      probes: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(probes == 1 || probes == 2, "probes must be 1 or 2")
    if (probes == 1) return assign(embeddings0, centroids, idCol, vecCol)
    val embeddings = ensureRegistered(embeddings0)
    val base = embeddings.select(col(idCol), asDouble(col(vecCol)).as("v"))
    val dim = if (centroids.isEmpty) 0 else centroids(0).length
    val both =
      if (centroids.length.toLong * dim <= Similarity.LiteralPlanMax) {
        val scores = centroids.map { c =>
          val c2 = c.map(x => x * x).sum
          lit(c2) - lit(2.0) * Similarity.fastDot(col("v"), typedlit(c.toSeq))
        }
        val arr = array(scores: _*)
        val first = (array_position(arr, array_min(arr)) - 1).cast("int")
        // second-best: min over the array with the winner masked out —
        // position is searched in the MASKED array (searching the
        // original would re-find the winner on an exact score tie)
        val masked = zip_with(arr,
          sequence(lit(0), lit(centroids.length - 1)),
          (s, i) => when(i === col("c1"), lit(Double.MaxValue)).otherwise(s))
        val second =
          if (centroids.length == 1) lit(-1).cast("int")
          else (array_position(masked, array_min(masked)) - 1).cast("int")
        base.withColumn("c1", first).withColumn("c2", second)
      } else
        base.crossJoin(broadcast(Similarity.centroidFrame(
            base.sparkSession, centroidTuples(centroids))))
          .withColumn("c1", argminDist(col("v")))
          .withColumn("c2", argminDist(col("v"), Some(col("c1"))))
          .drop("__cents")
    both
      .select(col(idCol), col("v"),
        explode(array(col("c1"), col("c2"))).as("cluster"))
      .filter(col("cluster") >= 0) // k=1 corner: no second cluster exists
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
      idCol: String = "vec_id", vecCol: String = "embedding",
      probes: Int = 1): DataFrame =
    assignProbes(ensureRegistered(incoming), centroids, probes, idCol, vecCol)
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
      idCol: String = "vec_id", vecCol: String = "embedding",
      probes: Int = 1): DataFrame = {
    val incoming = ensureRegistered(incoming0)
    val inc = assignProbes(incoming, centroids, probes, idCol, vecCol)
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

  /** The k-means centroids as a committable k-row table
    * (cluster, centroid) — metadata-scale (k·dim doubles). A real
    * pipeline trains Lloyd's ONCE as a corpus bootstrap and every later
    * batch loads THIS table instead of re-running k-means; re-training
    * under drift is offline maintenance (new centroids + full re-assign
    * commit), never per-batch work. */
  def centroidsToDf(spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
  }

  /** Load committed centroids back into driver memory (k rows — bounded
    * by the same budget that holds them during assignment). Cluster ids
    * must be exactly 0..k-1 (the argmin index space). */
  def loadCentroids(df: DataFrame): Array[Array[Double]] = {
    val rows = df.select(col("cluster").cast("int"),
        transform(col("centroid"), _.cast("double")).as("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(rows.nonEmpty, "centroid table is empty")
    require(rows.map(_._1).toSeq == (0 until rows.length),
      s"centroid table cluster ids must be 0..k-1, got ${rows.map(_._1).toSeq}")
    rows.map(_._2)
  }

  /** Cluster-occupancy health of a committed assignment table — the
    * maintenance signal for cluster-bucketed dedup. The per-batch
    * verification cost concentrates as `batch_share × max_cluster`:
    * a mega-cluster (skew = max/avg ≫ 1) is the failure mode that
    * turns the within-cluster search quadratic no matter how large k
    * is, and multi-probe only worsens it (the hot cluster is probed
    * MORE). Remedy: re-train with larger k (replace the committed
    * centroid table + one full re-assign commit — offline maintenance,
    * never on the ingest path). One aggregate over the assignment
    * table, k rows out. */
  final case class ClusterHealth(nVectors: Long, nClusters: Int,
      maxCluster: Long, avgCluster: Double, skew: Double,
      needsRebalance: Boolean)

  def clusterHealth(assign: DataFrame, maxSkew: Double = 4.0): ClusterHealth = {
    val rows = assign.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n")).collect()
    val n = rows.map(_.getLong(1)).sum
    val k = rows.length
    val mx = if (rows.isEmpty) 0L else rows.map(_.getLong(1)).max
    val avg = if (k == 0) 0.0 else n.toDouble / k
    val skew = if (avg == 0.0) 0.0 else mx / avg
    ClusterHealth(n, k, mx, avg, skew, skew > maxSkew)
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
