package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pipeline a training-data
  * team actually runs, built from the same primitives the individual
  * operators expose — proof that the pieces CHAIN, not just pass their
  * own oracles.
  *
  * Stages (each a pure DataFrame transform, all engine-portable):
  *  1. language filter (metadata column);
  *  2. quality gate: word count + alphabetic-word fraction (the two
  *     highest-yield Gopher rules);
  *  3. exact dedup: min-doc_id survivor per md5(text) fingerprint;
  *  4. span near-dedup: drop docs whose distinct 8-token spans are
  *     mostly (> 50%) shared with OTHER surviving docs — the cheap
  *     boilerplate-page filter (novelty gate, cf. l35/l36);
  *  5. decontamination: drop docs sharing any 5-gram with the
  *     benchmark set (here: doc_id % 97 = 0 as the held-out stand-in);
  *  6. leakage-safe split: md5-bucket train/val/test (80/10/10).
  *
  * Scale shape: stages 1-3 are map + one hash-agg each; stage 4 is one
  * span-frequency aggregation joined back (shuffle on span, never
  * all-pairs); stage 5 is a broadcast-ish semi-join against the (small)
  * benchmark grams; stage 6 is map-only. Nothing materializes pairs and
  * every shuffle key is bounded (fingerprint, span, gram). */
object Curation {

  /** @param clusterDedup adds a MinHash-LSH near-dup clustering stage
    *   (between exact dedup and the span gate): LSH candidate pairs →
    *   [[Dedup.nearDupClusters]] → min-id survivor per cluster.
    * @param driverUnionFindMax passed through to
    *   [[Dedup.nearDupClusters]] — edge count above which clustering
    *   switches from the driver union-find to distributed min-label
    *   propagation. Shared-driver deployments should LOWER this (the
    *   default holds ~64 MB of edges on the driver); the results are
    *   identical on either side of the threshold. */
  def curate(docs: DataFrame, lang: String = "en",
      minWords: Int = 30, alphaFrac: Double = 0.8,
      spanWords: Int = 8, maxSharedFrac: Double = 0.5,
      clusterDedup: Boolean = false,
      driverUnionFindMax: Long = 4000000L): DataFrame = {
    val words = split(col("text"), " ")

    // 1+2: language + quality gate
    val gated = docs
      .filter(col("lang") === lang)
      .withColumn("__n_words", size(words))
      .withColumn("__alpha_frac",
        size(filter(words, w => w.rlike("[a-z]"))) / size(words))
      .filter(col("__n_words") >= minWords &&
        col("__alpha_frac") >= alphaFrac)

    // 3: exact dedup (min-id survivor per content fingerprint)
    val fp = gated.withColumn("__fp", md5(col("text")))
    val survivors = fp.withColumn("__min_id",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))))
      .filter(col("doc_id") === col("__min_id"))
      .drop("__fp", "__min_id")

    // 3.5 (optional): near-dup clustering — LSH-banded candidate pairs,
    // connected components, min-id survivor per component
    val afterCluster =
      if (!clusterDedup) survivors
      else {
        val pairs = Dedup.minHashLshPairs(survivors).select(col("a"), col("b"))
        val clusters = Dedup.nearDupClusters(pairs,
          driverUnionFindMax = driverUnionFindMax)
        val losers = clusters
          .filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id"))
        survivors.join(losers, Seq("doc_id"), "left_anti")
      }

    // 4: span novelty gate — fraction of the doc's DISTINCT spans that
    // also appear in some other surviving doc
    val nSpans = ceil(size(words) / lit(spanWords.toDouble)).cast("int")
    val spansArr = transform(sequence(lit(0), nSpans - 1),
      i => array_join(slice(words, i * spanWords + 1, lit(spanWords)), " "))
    val docSpans = afterCluster
      .select(col("doc_id"), explode(spansArr).as("span")).distinct()
    val spanDf = docSpans.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("span_docs"))
    val shared = docSpans.join(spanDf, "span")
      .groupBy(col("doc_id"))
      .agg((sum(when(col("span_docs") > 1, 1).otherwise(0)) /
        count(lit(1))).as("__shared_frac"))
    val novel = afterCluster.join(shared, "doc_id")
      .filter(col("__shared_frac") <= maxSharedFrac)

    // 5: decontamination against the benchmark grams (5-grams)
    val benchmark = docs.filter(col("doc_id") % 97 === 0)
    def grams5(df: DataFrame): DataFrame = {
      val w = split(col("text"), " ")
      // guard: sequence(0, size-5) DESCENDS for docs under 5 words and
      // slice(w, 0, _) then throws; the oracle's range() yields nothing
      // for them, so filter to match
      df.filter(size(w) >= 5)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(w) - 5),
            i => array_join(slice(w, i + 1, lit(5)), " "))).as("g"))
        .distinct()
    }
    val contaminated = grams5(novel)
      .join(grams5(benchmark).select(col("g")).distinct(), "g")
      .select(col("doc_id")).distinct()
    val clean = novel.join(contaminated, Seq("doc_id"), "left_anti")

    // 6: leakage-safe split by content-independent hash bucket —
    // TextOps.splitBucket, the single definition of the split rule
    val bucket = TextOps.splitBucket(col("doc_id"))
    clean.select(col("doc_id"),
      col("__n_words").cast("long").as("n_words"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
  }
}
