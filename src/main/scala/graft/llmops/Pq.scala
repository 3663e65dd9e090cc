package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the classic IVF-PQ memory lever
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): split each d-dim vector into `m` subvectors, k-means each
  * subspace into `ksub` centroids, and store per vector only the m
  * centroid codes — m bytes instead of 4d, a 32× footprint cut at d=64 /
  * m=8, which is what lets a 100 TB embedding corpus's index live in
  * cluster RAM.
  *
  * Query scoring is ADC (asymmetric distance computation) re-expressed
  * relationally: the per-query lookup table of subspace partial dot
  * products is a tiny literal DataFrame (|Q|·m·ksub rows), broadcast and
  * joined against the exploded (vec_id, subspace, code) corpus, then
  * summed per (query, vector) — one broadcast join + one partial-agg
  * shuffle, no full-vector reads at query time. Codebook norms fold into
  * the same LUT so the score is a true cosine against the RECONSTRUCTED
  * vector.
  *
  * Determinism: fixed-iteration Lloyd (xxhash64-seeded, 1e-6-quantized
  * means, same rules as [[SemanticDedup.kmeansCentroids]]), so encode
  * and top-k replay bit-identically — pinned in `PqSpec`.
  */
object Pq {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  private def ensureRegistered(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession); df
  }

  private def quantize(x: Double): Double = math.rint(x * 1e6) / 1e6

  /** Per-subspace codebooks: `m` × `ksub` × (dim/m) centroid matrix.
    * All m subspace k-means run JOINTLY — subspace assignments are
    * independent, so one Lloyd iteration for every subspace is a single
    * distributed pass (assign m codes per vector, then one
    * (subspace, cluster, pos) partial-sum aggregation) instead of m
    * separate jobs; the fixpoint is identical to running them apart.
    * Driver holds m·ksub·(dim/m) = dim·ksub doubles — corpus-size-
    * independent. Deterministic: xxhash64-seeded, 1e-6-quantized means. */
  def codebooks(embeddings: DataFrame, m: Int = 8, ksub: Int = 16,
      iters: Int = 4, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subdim = dim / m
    val e = ensureRegistered(embeddings)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))

    // seeds: the ksub vectors with smallest xxhash64(id) (same spread rule
    // as SemanticDedup.seedIds), sliced per subspace — ONE collect
    val seedRows = e.orderBy(xxhash64(col("id")), col("id")).limit(ksub).collect()
    require(seedRows.length == ksub, s"found ${seedRows.length} of $ksub seeds")
    val seeds: Array[Array[Array[Double]]] = Array.tabulate(m) { mi =>
      seedRows.map(_.getSeq[Double](1)
        .slice(mi * subdim, (mi + 1) * subdim).toArray.map(quantize))
    }

    (1 to iters).foldLeft(seeds) { (books, _) =>
      val (assignable, codes) = codesFor(e, col("v"), books, subdim)
      // m·ksub·dim partial sums per partition — corpus-size-independent
      val rows = assignable.withColumn("codes", codes)
        .select(col("codes"), posexplode(col("v")).as(Seq("pos", "x")))
        .withColumn("mi", (col("pos") / subdim).cast("int"))
        .withColumn("cluster", element_at(col("codes"), col("mi") + 1))
        .groupBy(col("mi"), col("cluster"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byKey = rows.groupBy(r => (r.getAs[Int]("mi"), r.getAs[Int]("cluster")))
      Array.tabulate(m) { mi =>
        books(mi).zipWithIndex.map { case (prev, ci) =>
          byKey.get((mi, ci)).fold(prev) { rs => // empty cluster keeps its centroid
            val next = Array.ofDim[Double](subdim)
            rs.foreach { r =>
              next(r.getAs[Int]("pos") - mi * subdim) =
                quantize(r.getAs[Double]("s") / r.getAs[Long]("n"))
            }
            next
          }
        }
      }
    }
  }

  /** Argmin-distance code of subvector `v` against one subspace's
    * codebook — same cancellation as SemanticDedup.argminCluster. */
  private def codeOf(v: Column, book: Array[Array[Double]]): Column = {
    val scores = book.map { c =>
      val c2 = c.map(x => x * x).sum
      lit(c2) - lit(2.0) * Similarity.fastDot(v, typedlit(c.toSeq))
    }
    val arr = array(scores: _*)
    (array_position(arr, array_min(arr)) - 1).cast("int")
  }

  private def bookSize(books: Array[Array[Array[Double]]]): Long =
    books.map(b => b.map(_.length.toLong).sum).sum

  /** ONE-row frame with the whole codebook as `__books`:
    * array<struct<mi, code, centroid, centroid²>> — the broadcast
    * alternative to literal codebooks above
    * [[Similarity.LiteralPlanMax]] (plan size O(1), same argmin). */
  private def bookFrame(spark: org.apache.spark.sql.SparkSession,
      books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    val entries: Seq[(Int, Int, Seq[Double], Double)] =
      for {
        (book, mi) <- books.zipWithIndex.toSeq
        (c, code) <- book.zipWithIndex
      } yield (mi, code, c.toSeq, c.map(x => x * x).sum)
    Seq(Tuple1(entries)).toDF("__books")
  }

  /** Joined-codebook argmin: same distance, same first-wins tie-break as
    * the literal [[codeOf]], evaluated against the broadcast `__books`
    * column. */
  private def codeOfJoined(v: Column, mi: Int): Column =
    aggregate(filter(col("__books"), b => b.getField("_1") === lit(mi)),
      struct(lit(-1).as("code"), lit(Double.MaxValue).as("d")),
      (acc, b) => {
        val d = b.getField("_4") -
          lit(2.0) * Similarity.fastDot(v, b.getField("_3"))
        when(d < acc.getField("d"),
          struct(b.getField("_2").as("code"), d.as("d"))).otherwise(acc)
      }).getField("code")

  /** m code columns for a frame holding vector column `v`, switching
    * literal vs broadcast codebooks on total size; `df` must be the
    * frame the codes are computed over. */
  private def codesFor(df: DataFrame, v: Column,
      books: Array[Array[Array[Double]]], subdim: Int): (DataFrame, Column) = {
    val m = books.length
    if (bookSize(books) <= Similarity.LiteralPlanMax) {
      val codes = array(books.zipWithIndex.map { case (book, mi) =>
        codeOf(slice(v, mi * subdim + 1, subdim), book)
      }: _*)
      (df, codes)
    } else {
      val withBooks = df.crossJoin(
        broadcast(bookFrame(df.sparkSession, books)))
      val codes = array((0 until m).map { mi =>
        codeOfJoined(slice(v, mi * subdim + 1, subdim), mi)
      }: _*)
      (withBooks, codes)
    }
  }

  /** Encode the corpus: one row per vector with its m codes — the
    * compressed index (map-only pass; codes are what you'd persist). */
  def encode(embeddings: DataFrame, books: Array[Array[Array[Double]]],
      dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val subdim = dim / books.length
    val (assignable, codes) = codesFor(ensureRegistered(embeddings),
      asDouble(col(vecCol)), books, subdim)
    assignable.select(col(idCol), codes.as("codes"))
  }

  /** IVF-PQ composite (the FAISS production architecture): a coarse
    * quantizer routes every vector to one of `nlist` inverted lists
    * (bounding the CANDIDATE set per query to ~nprobe/nlist of the
    * corpus), and inside the lists vectors exist only as PQ codes
    * (bounding MEMORY to m bytes/vector). A query probes its `nprobe`
    * nearest lists, ADC-scores only those lists' codes via the broadcast
    * LUT join, and exact-reranks the shortlist. At 100 TB both bounds
    * matter: IVF cuts compute ~nlist/nprobe-fold, PQ keeps the index
    * resident. Shared (non-residual) codebooks — the standard simplified
    * variant; determinism as in [[codebooks]]. */
  def ivfPqTopK(embeddings: DataFrame, queries: DataFrame, k: Int = 10,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
      iters: Int = 4, dim: Int = 64, rerank: Int = 4,
      emitShortlist: Boolean = false,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nprobe <= nlist, "nprobe must not exceed nlist")
    require(!emitShortlist || rerank > 1,
      "shortlist staging needs the exact-rerank tail")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = ensureRegistered(embeddings)

    // coarse centroids: deterministic xxhash64 sample (same rule as
    // Similarity.ivfTopK); literal vs broadcast assignment switches on
    // nlist·dim, as in ivfTopK
    val cents: Seq[(Int, Seq[Double], Double)] = e
      .select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy(col("__h"), col(idCol)).limit(nlist)
      .collect().zipWithIndex.map { case (r, i) =>
        val v = r.getSeq[Double](r.fieldIndex("v"))
        (i, v, math.sqrt(v.map(x => x * x).sum))
      }.toSeq
    def probeLists(v: Column, take: Int): Column = {
      val scored = cents.map { case (idx, c, nrm) =>
        struct((Similarity.fastDot(v, typedlit(c)) /
          (sqrt(Similarity.fastDot(v, v)) * lit(nrm))).as("score"),
          lit(idx).as("list"))
      }
      slice(sort_array(array(scored: _*), asc = false), 1, take)
    }

    val books = codebooks(e, m, ksub, iters, dim, idCol, vecCol)
    val subdim = dim / m
    val assigned =
      if (nlist.toLong * dim <= Similarity.LiteralPlanMax)
        e.select(col(idCol),
          probeLists(asDouble(col(vecCol)), 1).getItem(0)
            .getField("list").as("list"))
      else
        e.select(col(idCol), asDouble(col(vecCol)).as("__v"))
          .crossJoin(broadcast(Similarity.centroidFrame(spark, cents)))
          .select(col(idCol), Similarity.argmaxList(col("__v")).as("list"))
    // the persisted index shape: (list, nbr_id, codes) — m small ints per
    // vector, routed once
    val encoded = encode(e, books, dim, idCol, vecCol)
      .join(assigned, Seq(idCol))
      .select(col(idCol).as("nbr_id"), col("list"), col("codes"))

    val qRows = queries.select(col(idCol).cast("long"), asDouble(col(vecCol))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // query probes: (query_id, list) pairs — |Q|·nprobe rows
    val probes = qRows.flatMap { case (qid, qv) =>
      val scored = cents.map { case (idx, c, nrm) =>
        val d = c.zip(qv).map { case (a, b) => a * b }.sum
        val qn = math.sqrt(qv.map(x => x * x).sum)
        (d / (qn * nrm), idx)
      }
      scored.sortBy(-_._1).take(nprobe).map { case (_, l) => (qid, l) }
    }.toSeq.toDF("query_id", "list")

    val lut = qRows.flatMap { case (qid, qv) =>
      val qnrm = math.sqrt(qv.map(x => x * x).sum)
      books.zipWithIndex.flatMap { case (book, mi) =>
        val qSub = qv.slice(mi * subdim, (mi + 1) * subdim)
        book.zipWithIndex.map { case (c, code) =>
          (qid, mi, code, c.zip(qSub).map { case (a, b) => a * b }.sum,
            c.map(x => x * x).sum, qnrm)
        }
      }
    }.toSeq.toDF("query_id", "m", "code", "partial", "c_nsq", "qnrm")

    // candidates = probed lists only, then the same ADC pipeline as adcTopK
    val scored = encoded.join(broadcast(probes), Seq("list"))
      .filter(col("nbr_id") =!= col("query_id"))
      .select(col("query_id"), col("nbr_id"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(lut), Seq("query_id", "m", "code"))
      .groupBy(col("query_id"), col("nbr_id"))
      .agg(sum(col("partial")).as("dot"),
        sum(col("c_nsq")).as("r_nsq"), first(col("qnrm")).as("qnrm"))
      .withColumn("cosine", col("dot") / (sqrt(col("r_nsq")) * col("qnrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    val shortlist = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k * rerank)
      .select(col("query_id"), col("nbr_id"))
    if (emitShortlist) return shortlist
    rerankExactRows(e, qRows, shortlist, k, idCol, vecCol)
  }

  /** Exact cosine re-ranking of an ANN shortlist: ONLY the |Q|·k·rerank
    * candidate vectors are read at full precision (broadcast of the
    * candidate ids against the corpus — the corpus itself is never
    * rescanned). Public so a caller that already MATERIALIZED a
    * shortlist (e.g. the driver's staged-oracle entries) can derive the
    * final top-k from it without re-training codebooks — at sf0.1 that
    * halves l41/l43, whose r7 shape ran the whole PQ pipeline twice. */
  def rerankExact(embeddings: DataFrame, queries: DataFrame,
      shortlist: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    rerankExactRows(embeddings,
      queries.select(col(idCol).cast("long"), asDouble(col(vecCol)))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)),
      shortlist, k, idCol, vecCol)

  /** Re-rank against ALREADY-collected query vectors — the internal ANN
    * paths collect `qRows` once for the LUT/probe build and must not pay
    * (or re-execute) the query-side plan a second time here. */
  private def rerankExactRows(embeddings: DataFrame,
      qRows: Array[(Long, Array[Double])], shortlist: DataFrame, k: Int,
      idCol: String, vecCol: String): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qv = qRows.toSeq.toDF("query_id", "qv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    val full = embeddings.select(col(idCol).as("nbr_id"),
      asDouble(col(vecCol)).as("v"))
    full.join(broadcast(shortlist.select(col("query_id"), col("nbr_id"))),
        Seq("nbr_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", Similarity.fastDot(col("v"), col("qv")) /
        (sqrt(Similarity.fastDot(col("v"), col("v"))) *
          sqrt(Similarity.fastDot(col("qv"), col("qv")))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** ADC cosine top-k: queries (small by contract — they are collected to
    * build the LUT, exactly as IVF bakes centroids into literals) against
    * the PQ-encoded corpus, with exact re-ranking of the ADC shortlist
    * (the standard IVF-PQ refinement): ADC ranks `k·rerank` candidates
    * from codes alone, then ONLY those |Q|·k·rerank vectors are read at
    * full precision for the final cosine — the full corpus is never
    * scanned at query time. `rerank = 1` disables refinement. */
  /** `emitShortlist = true` returns the ADC shortlist pairs
    * (query_id, nbr_id) instead of the reranked top-k — the staged-
    * oracle hook: an external engine re-derives the exact top-k over the
    * SAME shortlist, so ADC selection and exact rescoring are both
    * under the hash check. Requires `rerank > 1` (the final scores must
    * be exact cosines for an exact oracle to match). */
  def adcTopK(embeddings: DataFrame, queries: DataFrame, k: Int = 10,
      m: Int = 8, ksub: Int = 16, iters: Int = 4, dim: Int = 64,
      rerank: Int = 4, emitShortlist: Boolean = false,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(!emitShortlist || rerank > 1,
      "shortlist staging needs the exact-rerank tail")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val books = codebooks(embeddings, m, ksub, iters, dim, idCol, vecCol)
    val subdim = dim / m

    val encoded = encode(embeddings, books, dim, idCol, vecCol)
      .select(col(idCol).as("nbr_id"),
        posexplode(col("codes")).as(Seq("m", "code")))

    // LUT: per (query, subspace, code) the partial dot against that
    // centroid plus the centroid's squared norm (for the reconstructed
    // vector's norm); |Q|·m·ksub rows — broadcast-sized by construction
    val qRows = queries.select(col(idCol).cast("long"), asDouble(col(vecCol))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val lut = qRows.flatMap { case (qid, qv) =>
      val qnrm = math.sqrt(qv.map(x => x * x).sum)
      books.zipWithIndex.flatMap { case (book, mi) =>
        val qSub = qv.slice(mi * subdim, (mi + 1) * subdim)
        book.zipWithIndex.map { case (c, code) =>
          val partial = c.zip(qSub).map { case (a, b) => a * b }.sum
          val cNormSq = c.map(x => x * x).sum
          (qid, mi, code, partial, cNormSq, qnrm)
        }
      }
    }.toSeq.toDF("query_id", "m", "code", "partial", "c_nsq", "qnrm")

    val scored = encoded.join(broadcast(lut), Seq("m", "code"))
      .filter(col("nbr_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("nbr_id"))
      .agg(sum(col("partial")).as("dot"),
        sum(col("c_nsq")).as("r_nsq"), first(col("qnrm")).as("qnrm"))
      .withColumn("cosine", col("dot") / (sqrt(col("r_nsq")) * col("qnrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id"))
    if (rerank <= 1)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("nbr_id"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
    else {
      val shortlist = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k * rerank)
        .select(col("query_id"), col("nbr_id"))
      if (emitShortlist) return shortlist
      // exact rescoring of the shortlist ONLY (see rerankExact)
      rerankExactRows(embeddings, qRows, shortlist, k, idCol, vecCol)
    }
  }
}
