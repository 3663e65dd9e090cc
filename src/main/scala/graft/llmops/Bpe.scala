package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.BpeWordEncoder

/** Distributed byte-pair-encoding: merge-table training and tokenizer
  * application, corpus-scale by construction.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the corpus is touched ONCE — `explode(split(text))` → word
  *    `groupBy` with map-side partial aggregation. Everything after runs
  *    on the DISTINCT-WORD table (|V| ≈ 10⁷–10⁸ for a web corpus), which
  *    is metadata-scale relative to the corpus;
  *  - each training iteration is one partial-agg shuffle of adjacent
  *    symbol pairs over the word table plus a LIMIT-1 argmax fetch (a
  *    single driver row). Nothing corpus-sized ever reaches the driver;
  *  - `batch > 1` amortizes iterations for production vocab sizes
  *    (30k–50k merges): the top pairs of one count pass are applied
  *    together after a greedy conflict filter (no symbol — left, right,
  *    or merged — shared between picked pairs). Disjointness makes the
  *    batched COUNTS exact: merging (a,b) can only create/destroy
  *    adjacencies that involve a, b, or ab, so a conflict-free (c,d)'s
  *    recorded frequency is the true post-merge frequency. The merge
  *    SEQUENCE can still diverge from sequential BPE — a brand-new pair
  *    involving the merged symbol (x,ab) may outrank the batch's second
  *    pick, and sequential training would take it first — so batch>1 is
  *    the standard distributed approximation (identical to sequential
  *    exactly when no cross-pick pair intervenes, the case BpeSpec
  *    pins), not a byte-for-byte classic merge table. Callers needing
  *    tokenizer-compatible textbook output use batch=1;
  *  - tokenizer application dedups to distinct words first (zipfian
  *    reuse makes this a ~20–50× cut), encodes each word once through
  *    the codegen'd [[graft.functions.BpeEncode]] expression, and joins
  *    counts back — a word-keyed shuffle join whose stopword skew AQE
  *    splits.
  *
  * Representation: a word's symbol sequence is one string with DOUBLED
  * separator boundaries `␁␁s1␁␁…␁␁sk␁␁` (␁ = U+0001), so "apply merge
  * (l,r)" is a literal `replace(syms, '␁l␁␁r␁', '␁lr␁')` — leftmost
  * non-overlapping in Spark, DuckDB, and java.lang.String alike, and
  * (because adjacent matches take the two halves of their shared ␁␁
  * boundary) ONE pass merges every non-overlapping occurrence — textbook
  * greedy BPE; see BpeEncode.scala for why a single separator would miss
  * every second occurrence. That shared replace() contract is what lets
  * the DuckDB oracle replay BOTH training (chained CTEs) and application
  * (recursive CTE over the staged merge table) exactly, hash-matching
  * the engine end to end.
  *
  * Reference scope note: sidequery/dlt-iceberg has no tokenizer; this is
  * north-star LLM-pipeline surface (the brief's "token counting" item,
  * upgraded from the BPE-ish regex in TextOps to a real learned BPE).
  */
object Bpe {

  val Sep: String = BpeWordEncoder.Sep

  case class BpeMerge(rank: Int, left: String, right: String, freq: Long)

  /** Distinct-word frequency table: (syms, freq) with `syms` the
    * separator-wrapped code-point split. Words containing the separator
    * are dropped (both engines filter identically), and so are words
    * containing U+0000: NUL is the one code point that sorts BELOW the
    * ␁ separator, so a NUL-bearing symbol would break the invariant
    * that the combined pair string `l␁r` orders exactly like the
    * (l, r) tuple — engine and oracle could then pick different merges
    * on a frequency tie. */
  def wordTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "" && !col("word").contains(Sep) &&
        !col("word").contains("\u0000"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .select(
        concat(lit(Sep + Sep),
          regexp_replace(col("word"), "([\\s\\S])", "$1" + Sep + Sep)).as("syms"),
        col("freq"))

  /** Adjacent symbol pairs of one word as `l␁r` strings — the combined
    * string groups AND sorts exactly like the (l, r) tuple because ␁ is
    * below every symbol byte and symbols never contain it. */
  private def pairStrings(symsCol: Column): Column = {
    val arr = split(symsCol, Sep + Sep) // ["", s1, …, sk, ""]
    val symbols = slice(arr, lit(2), size(arr) - 2)
    val lefts = slice(symbols, lit(1), size(symbols) - 1)
    val rights = slice(symbols, lit(2), size(symbols) - 1)
    zip_with(lefts, rights, (l, r) => concat(l, lit(Sep), r))
  }

  /** Learns `numMerges` merges. batch=1 is textbook BPE (global argmax
    * per iteration, deterministic tie-break by (freq DESC, left, right));
    * batch>1 applies up to `batch` conflict-free top pairs per count
    * pass (see the scale notes above — counts stay exact).
    *
    * Materialization strategy (measured, not guessed): learned merges
    * are STACKED lazily as a flat `replace()` expression chain over ONE
    * cached word table — iteration i's pair-count plan is cache-scan +
    * i replaces, each a tiny expression node. The obvious alternative
    * (re-cache every generation) nests each generation's
    * InMemoryRelation inside the next and re-evaluation cost grew
    * EXPONENTIALLY in practice (~200 ms/iter at depth 5 → 17 s/iter at
    * depth 16 on the sf0.1 corpus). Because re-applying a depth-d chain
    * costs O(d) string replaces per word, every `checkpointEvery`
    * merges the chain is flattened into a `localCheckpoint` (plan
    * truncates to a LogicalRDD — depth stays 1 forever) and the
    * previous generation's blocks are freed, so a production-size run
    * (30k+ merges) is O(numMerges · checkpointEvery) replace work with
    * O(1) live copies of the vocabulary. */
  def trainMerges(docs: DataFrame, textCol: String = "text",
      numMerges: Int = 16, batch: Int = 1,
      checkpointEvery: Int = 64): Seq[BpeMerge] = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1")
    val verbose = sys.env.contains("GRAFT_BPE_VERBOSE")
    def trace(what: String, t0: Long): Unit = if (verbose)
      System.err.println(f"[bpe] $what ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    var t = System.nanoTime()
    var wt = wordTable(docs, textCol).cache()
    wt.count()
    trace("word-table", t)
    var baseCached = true // the first generation is a plain cache
    // persisted RDDs of the live checkpoint generation, held by direct
    // reference: a getPersistentRDDs before/after set-diff could capture
    // RDDs persisted concurrently by OTHER threads on the shared
    // SparkContext and wrongly unpersist them later
    var prevGen: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    var symsCol: Column = col("syms")
    var stacked = 0
    val merges = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var exhausted = false
    try {
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(numMerges - merges.size, batch)
      // headroom over `want`: conflict filtering may reject candidates
      t = System.nanoTime()
      val top = wt.select(col("freq"), explode(pairStrings(symsCol)).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(math.max(want * 4, 8))
        .collect() // bounded: at most max(4*batch, 8) rows — driver-safe
      trace(s"pair-count iter=${merges.size}", t)
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val it = top.iterator
        while (it.hasNext && picked.size < want) {
          val row = it.next()
          val p = row.getString(0)
          val cut = p.indexOf(Sep.charAt(0))
          val (l, r) = (p.substring(0, cut), p.substring(cut + 1))
          if (!used(l) && !used(r) && !used(l + r)) {
            picked += ((l, r, row.getLong(1)))
            used ++= Seq(l, r, l + r)
          }
        }
        for ((l, r, c) <- picked)
          merges += BpeMerge(merges.size + 1, l, r, c)
        symsCol = picked.foldLeft(symsCol) { case (c0, (l, r, _)) =>
          replace(c0, lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
        }
        stacked += picked.size
        if (stacked >= checkpointEvery && merges.size < numMerges) {
          t = System.nanoTime()
          val next = wt.select(symsCol.as("syms"), col("freq"))
            .localCheckpoint(true)
          // the checkpoint's persisted blocks belong to exactly the
          // LogicalRDD(s) in the returned plan — read the ids off the
          // plan itself, never off global SparkContext state
          val newGen = next.queryExecution.analyzed.collect {
            case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
          }
          if (baseCached) { wt.unpersist(); baseCached = false }
          else prevGen.foreach(_.unpersist(false))
          prevGen = newGen
          wt = next
          symsCol = col("syms")
          stacked = 0
          trace(s"checkpoint iter=${merges.size}", t)
        }
      }
    }
    } finally {
      // unconditional cleanup: a mid-training failure must not leak the
      // cached word table or the live checkpoint's blocks
      if (baseCached) wt.unpersist()
      prevGen.foreach(_.unpersist(false))
    }
    merges.toSeq
  }

  /** Merge list as a DataFrame (also the shape staged for the oracle). */
  def mergesDf(spark: SparkSession, merges: Seq[BpeMerge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.freq))
      .toDF("merge_rank", "pair_left", "pair_right", "pair_freq")
  }

  /** Token array of `wordCol` under `merges` — the codegen'd expression,
    * resolved through the session registry (register first). */
  def bpeTokens(wordCol: Column, merges: Seq[BpeMerge]): Column =
    call_function("graft_bpe", wordCol,
      typedlit(merges.map(_.left)), typedlit(merges.map(_.right)))

  /** Per-document token counts under a learned merge list: distinct
    * words are encoded once, counts join back to the word-exploded
    * corpus, then aggregate per document. */
  def docTokenCounts(docs: DataFrame, merges: Seq[BpeMerge],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val isWord = (w: Column) => w =!= "" && !w.contains(Sep)
    val words = docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(isWord(col("w"))).distinct()
    val enc = words.select(col("w"),
      size(bpeTokens(col("w"), merges)).cast("long").as("ntok"))
    val docWords = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(isWord(col("w")))
    docWords.join(enc, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("ntok").as("n_bpe_tokens"))
  }
}
