package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (SURVEY §2.11 ★):
  * token statistics, quality scoring, language ID, document fingerprints.
  * Everything is built from codegen'd built-in functions (no UDFs), so the
  * whole pipeline stays inside whole-stage codegen and scales linearly —
  * per-document work, no shuffles.
  */
object TextOps {

  /** DSIR hashed-feature space: 16³ md5-prefix buckets. */
  val DsirBuckets = 4096

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish sub-token count: alpha runs, digit runs, and isolated
    * non-space symbols — a cheap deterministic stand-in for a real BPE
    * vocabulary (regex is engine-portable). */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Per-document token statistics. */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct_tokens"),
      bpeishCount(col(textCol)).as("n_bpeish_tokens"),
      length(col(textCol)).as("n_chars"),
      // + 1e-9 before rounding: token-ratio rationals can land exactly on
      // 4dp half-boundaries where Spark and DuckDB round doubles apart by
      // 1 ulp; the nudge is >> engine noise (1e-16) and << value spacing
      round(length(regexp_replace(col(textCol), " ", "")).cast("double") / size(t)
        + 1e-9, 4).as("mean_token_len"))
  }

  val Stopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "in", "to", "is", "it", "for", "on")

  /** Heuristic quality score in [0,1]: length saturation + stopword
    * presence (natural-language signal) + lexical diversity. Deterministic
    * and SQL-portable, like the reference-free quality filters used in
    * large-scale corpus cleaning. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val stopArr = array(Stopwords.map(lit): _*)
    val nTok = size(t).cast("double")
    val stopRatio = size(filter(t, x => array_contains(stopArr, x))) / nTok
    val diversity = size(array_distinct(t)) / nTok
    docs.select(
      col("doc_id"),
      // + 1e-9: see tokenStats — keeps half-boundary rationals on the same
      // side of round() in both engines
      round(stopRatio + 1e-9, 4).as("stop_ratio"),
      round(diversity + 1e-9, 4).as("diversity"),
      round(
        least(lit(1.0), nTok / 200.0) * 0.4 +
          least(lit(1.0), stopRatio * 5.0) * 0.3 +
          diversity * 0.3 + 1e-9, 4).as("quality"))
  }

  /** Language-marker profiles for the n-gram/stopword language-ID
    * heuristic (fastText-style but trivially small). */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "de" -> Seq("der", "und", "die", "ist", "das"),
    "es" -> Seq("el", "la", "que", "los", "es"),
    "fr" -> Seq("le", "et", "les", "des", "est"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3"))

  /** Predict language as argmax marker-hit ratio; score ties resolve to
    * the lexicographically LARGEST language code (desc struct sort), so
    * all-zero rows predict "zh". Oracle-checked: the same argmax is
    * `row_number() OVER (ORDER BY score DESC, lang DESC)` in DuckDB. */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      struct(
        (size(filter(t, x => array_contains(arr, x))).cast("double") / size(t))
          .as("score"),
        lit(lang).as("lang"))
    }
    docs.select(
      col("doc_id"),
      sort_array(array(scored: _*), asc = false).getItem(0).getField("lang")
        .as("lang_pred"),
      // + 1e-9: see tokenStats — keeps half-boundary rationals on the same
      // side of round() in both engines
      round(sort_array(array(scored: _*), asc = false).getItem(0)
        .getField("score") + 1e-9, 4).as("lang_score"))
  }

  /** DSIR-style importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every document by how much its HASHED-unigram distribution looks
    * like a target domain (here: the `lang = targetLang` slice) versus
    * the raw corpus. Features are md5-prefix buckets (3 hex chars =
    * 4096), so the feature space is fixed-size regardless of vocabulary;
    * the weight is the mean per-token log-likelihood ratio
    * ln(p_target(b)/p_raw(b)) with add-one smoothing.
    *
    * Scale shape: one pass builds the 4096-row bucket table (map-side
    * combined), which then BROADCASTS back onto the exploded tokens —
    * per-doc scoring never shuffles the corpus on anything wider than
    * doc_id. `keep` (weight > 0) is the resampling decision at
    * acceptance-ratio 1; callers resample with any quota by ranking on
    * the weight. */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
      textCol: String = "text"): DataFrame = {
    // feature space is FIXED at 4096 buckets (3 hex chars of md5): the
    // smoothing denominator below must equal the actual bucket count, so
    // it is not a parameter
    val buckets = DsirBuckets
    val tok = docs.select(col("doc_id"), col("lang"),
        explode(tokens(col(textCol))).as("t"))
      .withColumn("bk", substring(md5(col("t")), 1, 3))
    val totals = tok.agg(count(lit(1)).as("nr"),
      count(when(col("lang") === targetLang, 1)).as("nt")).collect()(0)
    val (nr, nt) = (totals.getLong(0).toDouble, totals.getLong(1).toDouble)
    val lr = tok.groupBy(col("bk"))
      .agg(count(lit(1)).cast("double").as("cr"),
        count(when(col("lang") === targetLang, 1)).cast("double").as("ct"))
      .select(col("bk"), log(
        ((col("ct") + 1.0) / (nt + buckets)) /
          ((col("cr") + 1.0) / (nr + buckets))).as("lr"))
    tok.join(broadcast(lr), "bk")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        // + 1e-9: see tokenStats
        round(avg(col("lr")) + 1e-9, 4).as("dsir_weight"))
      .withColumn("keep", col("dsir_weight") > 0)
  }

  /** Corpus-statistics quality proxy: mean unigram log-probability per
    * document against the corpus's own token distribution — the cheap
    * stand-in for LM-perplexity filtering (gibberish and rare-token spam
    * score low, fluent prose near the corpus mean). Two aggregation
    * levels: one corpus-wide token-frequency table (shuffle on token,
    * map-side combined), then a broadcast-or-shuffle join back to the
    * exploded tokens and a per-doc mean — no per-document model state. */
  def unigramLogProb(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(tokens(col(textCol))).as("t"))
    val total = tok.count().toDouble
    val freqs = tok.groupBy(col("t"))
      .agg(count(lit(1)).as("tf"))
      .select(col("t"), (col("tf") / total).as("p"))
    tok.join(freqs, "t")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        // + 1e-9: see tokenStats
        round(avg(log(col("p"))) + 1e-9, 4).as("mean_logprob"))
  }

  /** Sequence packing for pre-training: assign documents to fixed
    * token-budget packs. Docs are sharded by key hash (embarrassingly
    * parallel — a global greedy pack would serialize on one task), then
    * packed in deterministic key order by running token count within the
    * shard: a doc opens in the pack where its cumulative count starts.
    * pack_id embeds the shard so ids are globally unique. One shuffle
    * (the per-shard window), deterministic, engine-portable. */
  def packSequences(docs: DataFrame, tokenBudget: Int = 2048,
      shards: Int = 32, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(tokens(col(textCol)))
    val shard = pmod(col("doc_id"), lit(shards.toLong)).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), nTok.cast("long").as("n_tokens"),
        shard.as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("n_tokens"), col("shard"),
        (col("shard").cast("long") * 1000000L +
          floor((col("cum") - col("n_tokens")) / tokenBudget)).as("pack_id"))
  }

  /** Within-document repetition: the fraction of word 3-grams that are
    * duplicates of an earlier 3-gram in the same document — the
    * Gopher-style repetition signal corpus cleaning filters on (template
    * spam and decoder loops score high, natural prose low). Map-only
    * array expressions, no shuffle, no explode. */
  def repetitionStats(docs: DataFrame, n: Int = 3,
      textCol: String = "text"): DataFrame = {
    val w = tokens(col(textCol))
    val g = transform(sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws("_", slice(w, i, lit(n))))
    docs.filter(size(w) >= n).select(
      col("doc_id"),
      size(g).cast("long").as("n_grams"),
      // + 1e-9: see tokenStats
      round((size(g) - size(array_distinct(g))).cast("double") / size(g)
        + 1e-9, 4).as("dup_ratio"))
  }

  /** Deterministic train/val/test assignment by key hash — the standard
    * leakage-safe way to split a corpus: membership depends only on the
    * key, so re-runs, resharded inputs, and incremental additions never
    * move a document across splits. The bucket is the first 8 hex chars
    * of md5 taken mod `buckets` — engine-portable (Spark `conv(_,16,10)`
    * ≡ DuckDB `('0x'||_)::BIGINT`), uniform to ~1/2³², map-only codegen. */
  /** md5-of-key split bucket in [0, buckets) — THE assignment rule for
    * every leakage-safe split in the engine (splitAssign, Curation);
    * one definition so the rule cannot diverge between call sites. */
  def splitBucket(key: Column, buckets: Int = 100): Column =
    (conv(substring(md5(key.cast("string")), 1, 8),
      16, 10).cast("long") % buckets).cast("int")

  def splitAssign(docs: DataFrame, keyCol: String = "doc_id",
      fractions: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10),
      buckets: Int = 100): DataFrame = {
    require(fractions.map(_._2).sum == buckets,
      s"split fractions must sum to $buckets")
    val bucket = splitBucket(col(keyCol), buckets)
    val cuts = fractions.scanLeft(0) { case (a, (_, p)) => a + p }.tail
    val pairs = fractions.map(_._1).zip(cuts) // (name, upper bound)
    val split = pairs.init.foldRight(lit(pairs.last._1): Column) {
      case ((name, upper), acc) => when(col("split_bucket") < upper, name).otherwise(acc)
    }
    docs.select(col(keyCol), bucket.as("split_bucket"))
      .withColumn("split", split)
  }

  /** Deterministic per-stratum downsampling: keep a document iff its
    * salted md5 bucket falls under its stratum's rate — the leakage-safe
    * sampling analogue of [[splitAssign]] (membership is a pure function
    * of the key, so resharding and incremental loads never flip it).
    * `rates` maps stratum value → percentage kept; `default` applies to
    * unmapped strata. Map-only codegen — at 100 TB this is a full-scan
    * filter with zero shuffle. */
  def stratifiedSample(docs: DataFrame, stratumCol: String = "lang",
      rates: Map[String, Int] = Map("en" -> 10, "de" -> 30),
      default: Int = 50, keyCol: String = "doc_id",
      salt: String = "smp"): DataFrame = {
    val bucket = (conv(substring(md5(concat(lit(salt),
      col(keyCol).cast("string"))), 1, 8), 16, 10).cast("long") % 100).cast("int")
    val rate = rates.foldLeft(lit(default): Column) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    docs.select(col(keyCol), col(stratumCol), bucket.as("sample_bucket"))
      .filter(col("sample_bucket") < rate)
  }

  /** Top-k TF-IDF terms per document: tf = in-doc term count, idf =
    * ln(N / document frequency), deterministic (score DESC, term ASC)
    * tie-break.
    *
    * Scale shape: one explode + two hash aggregates (term counts, then
    * document frequencies) + a broadcast-sized join back on term — df is
    * vocabulary-sized, not corpus-sized — and a per-doc top-k window
    * partitioned by doc_id. No all-pairs stage anywhere. */
  def tfIdfTopK(docs: DataFrame, k: Int = 5,
      textCol: String = "text"): DataFrame = {
    val nDocs = docs.count() // metadata-scale action, baked as a literal
    val terms = docs.select(col("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("score",
        col("tf") * log(lit(nDocs.toDouble) / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"),
        col("df"), round(col("score") + 1e-9, 4).as("tfidf"), col("rank"))
  }

  /** PII redaction over an email-shaped pattern: replace every match,
    * count matches, fingerprint the redacted text (map-only codegen; the
    * pattern set extends the same way). The synthetic corpus carries no
    * organic PII, so callers inject deterministic markers to exercise
    * the path (see l31). */
  def redactPii(docs: DataFrame, textCol: String = "text",
      pattern: String = "[a-z0-9_]+@[a-z0-9.]+",
      replacement: String = "<email>"): DataFrame =
    docs.select(col("doc_id"),
      size(regexp_extract_all(col(textCol), lit(pattern), lit(0)))
        .cast("long").as("n_redacted"),
      md5(regexp_replace(col(textCol), pattern, replacement)).as("redacted_fp"))

  /** Overlapping token-window chunking (the RAG/pretraining document
    * splitter): windows of `chunkTokens` tokens advancing by
    * `chunkTokens - overlap`, chunk identity = (doc_id, chunk_idx) with a
    * content fingerprint. Explode + map-only — one pass, no shuffle; at
    * 100 TB the output is written straight back out partitioned however
    * the index wants it. Start positions run 1, 1+stride, … while
    * start ≤ max(1, n - overlap), so every token lands in ≥ 1 chunk and
    * no trailing chunk is fully contained in its predecessor. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 64,
      overlap: Int = 16, textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(col("doc_id"), split(col(textCol), " ").as("w"))
      .withColumn("n", size(col("w")))
      .withColumn("start",
        explode(sequence(lit(1), greatest(col("n") - overlap, lit(1)), lit(stride))))
      .select(col("doc_id"),
        ((col("start") - 1) / stride).cast("long").as("chunk_idx"),
        size(slice(col("w"), col("start"), lit(chunkTokens))).cast("long")
          .as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("w"), col("start"), lit(chunkTokens))))
          .as("chunk_fp"))
  }

  /** Dataset mixture planning: given per-source sampling weights and a
    * total token budget, compute each source's token mass and the keep
    * rate that realizes the weighted mixture (capped at 1 — a source
    * smaller than its share can't be upsampled by filtering). Output is
    * source-cardinality (metadata-sized); the keep rates feed
    * [[stratifiedSample]]-style hash filters. One aggregate over the
    * corpus — the planning step of every pretraining data recipe. */
  def mixturePlan(docs: DataFrame, budgetTokens: Long,
      boostedSources: Seq[String] = Nil, boost: Double = 2.0,
      textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    docs
      .select(col("source"), size(split(col(textCol), " ")).cast("long").as("tok"))
      .groupBy("source").agg(sum(col("tok")).as("toks"))
      .withColumn("weight",
        when(col("source").isin(boostedSources.map(x => x: Any): _*), lit(boost))
          .otherwise(lit(1.0)))
      .withColumn("w_share", col("weight") / sum(col("weight")).over(w))
      .withColumn("keep_rate",
        round(least(lit(1.0),
          lit(budgetTokens.toDouble) * col("w_share") / col("toks")) + 1e-9, 4))
      .select(col("source"), col("toks"),
        round(col("w_share") + 1e-9, 4).as("w_share"), col("keep_rate"))
  }

  /** N-gram novelty: the fraction of a document's DISTINCT word n-grams
    * that occur in NO other document — the content-freshness signal
    * (near-1 = unique prose; low = boilerplate, near-dups, or template
    * output). Complements pairwise dedup: novelty is per-document and
    * needs no candidate pairs, so it scales as explode + two hash
    * aggregations + one gram-keyed join. Docs shorter than `n` words
    * carry zero grams and novelty 0. */
  def ngramNovelty(docs: DataFrame, n: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    // guard short docs: sequence() with a negative end DESCENDS
    val gramsArr = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + 1, lit(n)), " ")))
      .otherwise(array())
    val grams = docs.select(col(idCol), explode(gramsArr).as("g")).distinct()
    val freq = grams.groupBy("g").agg(count(lit(1)).as("gdf"))
    val scored = grams.join(freq, "g").groupBy(idCol).agg(
      count(lit(1)).as("n_grams"),
      round(avg(when(col("gdf") === 1, 1.0).otherwise(0.0)) + lit(1e-9), 4)
        .as("novel_frac"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("novel_frac"), lit(0.0)).as("novel_frac"))
  }

  /** Gopher quality-rule battery (Rae et al. 2021 §A1.1, public paper):
    * the canonical reference-free document filters — word-count bounds,
    * mean-word-length bounds, symbol-to-word ratio, bullet/ellipsis line
    * ratios, alphabetic-word fraction, minimum distinct stopwords. One
    * map-side codegen pass emitting per-rule booleans + the combined
    * verdict (booleans, not ratios, so the oracle comparison has no
    * float-boundary surface beyond the shared IEEE divisions). */
  def gopherRules(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks)
    val mwl = length(regexp_replace(col(textCol), " ", "")).cast("double") /
      nWords.cast("double")
    val nSymbols = size(regexp_extract_all(col(textCol),
      lit("#|\\.\\.\\."), lit(0)))
    val lines = split(col(textCol), "\n")
    val nLines = size(lines)
    val bulletFrac = size(filter(lines, l => l.rlike("^[-*•]")))
      .cast("double") / nLines.cast("double")
    val ellipsisFrac = size(filter(lines, l => l.rlike("\\.\\.\\.$")))
      .cast("double") / nLines.cast("double")
    val alphaFrac = size(filter(toks, w => w.rlike("[a-z]")))
      .cast("double") / nWords.cast("double")
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(array_distinct(array_intersect(toks, stopArr)))

    docs.select(
      col("doc_id"),
      nWords.cast("long").as("n_words"),
      (nWords >= minWords && nWords <= maxWords).as("r_word_count"),
      (mwl >= 3.0 && mwl <= 10.0).as("r_mean_word_len"),
      (nSymbols.cast("double") / nWords.cast("double") <= 0.1)
        .as("r_symbol_ratio"),
      (bulletFrac <= 0.9).as("r_bullet_lines"),
      (ellipsisFrac <= 0.3).as("r_ellipsis_lines"),
      (alphaFrac >= 0.8).as("r_alpha_words"),
      (nStop >= 2).as("r_stopwords"))
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") && col("r_symbol_ratio") &&
          col("r_bullet_lines") && col("r_ellipsis_lines") &&
          col("r_alpha_words") && col("r_stopwords"))
  }

  /** BM25 keyword search: score every document against a query term set
    * and return the global top-k.
    *
    * Scale design: corpus statistics (N, avgdl, per-term df) reduce to a
    * handful of driver literals in ONE metadata-scale aggregation — df is
    * computed only for the |query| terms, not the whole vocabulary — so
    * scoring itself is a single map-side codegen pass over the documents
    * (per-doc tf of ≤ |query| terms via array filtering, no explode, no
    * shuffle) followed by a global top-k. At 100 TB: one scan + one
    * tiny-driver-state reduction + one top-k — no corpus-wide join.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 15,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = tokens(col(textCol))
    val dl = size(toks).cast("double")

    // one action: N, avgdl, and df per query term (conditional distinct
    // counting keeps it a single pass)
    val dfAggs = queryTerms.zipWithIndex.map { case (term, i) =>
      sum(when(array_contains(toks, term), 1L).otherwise(0L)).as(s"__df_$i")
    }
    val aggs = Seq(count(lit(1)).as("__n"), avg(dl).as("__avgdl")) ++ dfAggs
    val statsRow = docs.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nDocs = statsRow.getAs[Long]("__n").toDouble
    val avgdl = statsRow.getAs[Double]("__avgdl")

    // per-term score expression: tf from one array filter (codegen'd),
    // idf as a literal — Robertson-Sparck Jones idf with +1 floor
    val perTerm = queryTerms.zipWithIndex.map { case (term, i) =>
      val df = statsRow.getAs[Long](s"__df_$i").toDouble
      val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
      val tf = size(filter(toks, x => x === term)).cast("double")
      lit(idf) * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }
    docs.select(col("doc_id"),
        round(perTerm.reduce(_ + _) + lit(1e-9), 4).as("bm25"))
      .filter(col("bm25") > 0.0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Exact-dup fingerprint: md5 of whitespace-normalized lowercase text —
    * portable across engines for oracle checks. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** 64-bit rolling content fingerprint (xxhash64 of the normalized
    * text) — the cheap per-shard dedup key for petabyte corpora. */
  def rollingFingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(text, "\\s+", " ")))

  /** Zipf-law fit of the corpus vocabulary: least-squares slope of
    * log(frequency) against log(rank) over the top `topRanks` terms —
    * the standard corpus-health diagnostic (natural language sits near
    * alpha ≈ 1; a slope collapsing toward 0 flags boilerplate/spam
    * flooding, a steep one flags vocabulary collapse). Ranks tie-break
    * on the term so the fit is deterministic across engines.
    *
    * Scale shape: one token explode + one hash-aggregate builds the
    * frequency table; the rank window runs over the TOP-RANKS slice
    * only after a frequency threshold computed from one small sort —
    * never a global window over the full vocabulary. The regression
    * itself reduces `topRanks` points to one row. */
  def zipfFit(docs: DataFrame, textCol: String = "text",
      topRanks: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .cache()
    val nVocab = freq.agg(count(lit(1)).as("n_vocab"))
    // cheap pre-cut: only terms that can make the top slice enter the
    // rank window (orderBy limit is a TakeOrdered, not a global sort)
    val cut = freq.orderBy(col("f").desc, col("w")).limit(topRanks)
    val ranked = cut.select(col("f"),
      row_number().over(Window.orderBy(col("f").desc, col("w"))).as("r"))
    val pts = ranked.select(log(col("r").cast("double")).as("x"),
      log(col("f").cast("double")).as("y"))
    val fit = pts.agg(count(lit(1)).as("n_ranks"),
      avg(col("x")).as("mx"), avg(col("y")).as("my"),
      avg(col("x") * col("y")).as("mxy"), avg(col("x") * col("x")).as("mxx"))
    nVocab.crossJoin(fit)
      .select(col("n_vocab"), col("n_ranks"),
        round(-(col("mxy") - col("mx") * col("my")) /
          (col("mxx") - col("mx") * col("mx")) + 1e-9, 4).as("zipf_alpha"),
        round(col("my") - (col("mxy") - col("mx") * col("my")) /
          (col("mxx") - col("mx") * col("mx")) * col("mx") + 1e-9, 4)
          .as("intercept"))
  }

  /** Mergeable vocabulary-cardinality sketches: per-source Datasketches
    * HLL over distinct tokens (Spark-native `hll_sketch_agg`, lgK=`lgK`
    * → ~1% standard error at 14), then ONE `hll_union_agg` merge for
    * the corpus-wide estimate — the sketches union in bytes without
    * ever re-scanning the data, which is the whole 100-TB point: each
    * ingest shard ships a KB-sized sketch, the driver (or a later
    * job) folds them, and "distinct tokens in the corpus" never costs
    * a global shuffle of the token space again. The returned audit
    * row carries the EXACT distinct count beside `sketch_ok`
    * (|est − exact| / exact ≤ `tol`), so the DuckDB oracle can verify
    * the estimate's accuracy claim exactly; at corpus scale you drop
    * the exact column and keep the sketches. The global row is
    * labelled `__all__` and is computed from the per-source sketch
    * UNION, not from re-aggregated tokens — the test pins the merge
    * path itself. */
  def cardinalitySketch(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source", lgK: Int = 14,
      tol: Double = 0.03): DataFrame = {
    val tok = docs.select(col(sourceCol).as("source"),
      explode(split(col(textCol), " ")).as("w"))
    val perSrc = tok.groupBy("source").agg(
      count_distinct(col("w")).as("exact_distinct"),
      expr(s"hll_sketch_agg(w, $lgK)").as("sk"))
      .cache()
    def okCol(est: Column, exact: Column): Column =
      abs(est.cast("double") - exact.cast("double")) / exact <= lit(tol)
    val srcRows = perSrc.select(col("source"), col("exact_distinct"),
      okCol(expr("hll_sketch_estimate(sk)"), col("exact_distinct"))
        .as("sketch_ok"))
    val globalEst = perSrc.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est"))
    val globalExact = tok.agg(count_distinct(col("w")).as("exact_distinct"))
    val allRow = globalExact.crossJoin(globalEst)
      .select(lit("__all__").as("source"), col("exact_distinct"),
        okCol(col("est"), col("exact_distinct")).as("sketch_ok"))
    srcRows.unionByName(allRow)
  }

  /** Per-domain quota sampling: keep at most `quota` documents from each
    * source/domain, selected by a deterministic uniform priority — the
    * standard web-corpus curation step that stops a handful of giant
    * domains from dominating the training mix (every pipeline caps
    * pages-per-domain before mixing).
    *
    * Priority is the modular-multiplicative permutation
    * `(doc_id * 2654435761) mod 2^32` (Knuth's multiplier; a bijection
    * on [0, 2^32) for the odd multiplier — portable integer arithmetic
    * on both engines). Beyond 2^32 doc_ids the permutation COLLIDES
    * (ids differing by 2^32 map to the same priority), so the selection
    * ranks by the (priority, doc_id) PAIR: the cutoff is the quota-th
    * smallest pair and the kept set is exactly `quota` under any
    * collision pattern — a key-only `priority <= cutoff` would admit
    * every collider at the cutoff.
    *
    * Scale shape — this is deliberately NOT
    * `row_number() OVER (PARTITION BY source)`: a hot domain with 10^9
    * pages would sort inside one task. Instead a bounded min-k aggregate
    * ([[graft.functions.MinK2Agg]], buffer ≤ quota per partial) computes
    * each domain's cutoff pair with map-side combine, and the
    * one-row-per-domain cutoff table broadcast-joins back — the full
    * corpus is touched twice, shuffled never (aggregate partials are
    * quota-bounded, the join side is metadata-sized). */
  /** `(id * 2654435761) mod 2^32` computed overflow-free for any 64-bit
    * nonnegative id: the result depends only on `id mod 2^32`, and
    * splitting the multiplier as `40503*2^16 + 31153` keeps every
    * intermediate under 2^63 (the naive multiply overflows — ANSI Spark
    * throws — past id ≈ 3.5e9). Bit-identical to the mathematical
    * definition the DuckDB oracle computes in HUGEINT. */
  private def knuthPriority(id: Column): Column = {
    val lo = id.bitwiseAND(lit(4294967295L))
    (((lo * lit(40503L)) % lit(65536L)) * lit(65536L) + lo * lit(31153L)) %
      lit(4294967296L)
  }

  def domainQuota(docs: DataFrame, quota: Int = 10,
      sourceCol: String = "source"): DataFrame = {
    val prio = docs.select(col("doc_id"), col(sourceCol).as("source"))
      .withColumn("priority", knuthPriority(col("doc_id")))
    val kept = graft.functions.MinK.minK2(quota)
    val cutoffs = prio.groupBy("source")
      .agg(kept(col("priority"), col("doc_id")).as("ks"))
      .select(col("source"),
        when(size(col("ks")) < quota, lit(null))
          .otherwise(element_at(col("ks"), -1)).as("cut"))
    prio.join(broadcast(cutoffs), "source")
      .filter(col("cut").isNull || col("priority") < col("cut._1") ||
        (col("priority") === col("cut._1") && col("doc_id") <= col("cut._2")))
      .select(col("doc_id"), col("source"), col("priority"))
  }

  /** Smoothed bigram-LM cross-entropy per document — the context-aware
    * upgrade of [[unigramLogProb]] (the cheap stand-in for CCNet-style
    * LM-perplexity filtering): word salad built from common tokens
    * scores fine on unigrams but poorly here, because every improbable
    * TRANSITION pays. The model is the corpus's own add-one-smoothed
    * bigram table: P(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V).
    *
    * Scale shape: bigram occurrences shuffle ONCE to build the count
    * table (map-side combined); prefix counts derive from the already
    * bigram-distinct table, not the occurrences; the enriched model
    * joins back on (w1,w2) — a plain shuffle join AQE can skew-split,
    * since hot prefixes ("the …") concentrate there. V and nothing else
    * is a driver literal (one scalar). Per-doc state is one running
    * mean, never a collected list. */
  def bigramSurprisal(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tok = docs.select(col("doc_id"), tokens(col(textCol)).as("ts"))
    val bi = tok.filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(slice(ts, 1, size(ts) - 1), " +
          "(w, i) -> struct(w AS w1, element_at(ts, i + 2) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val vocab = docs.select(explode(tokens(col(textCol))).as("w"))
      .agg(count_distinct(col("w"))).collect()(0).getLong(0)
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val model = c2.join(c1, "w1")
      .select(col("w1"), col("w2"),
        log((col("c2") + lit(1.0)) / (col("c1") + lit(vocab))).as("lp"))
    bi.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        // + 1e-9: see tokenStats
        round(-avg(col("lp")) + 1e-9, 4).as("bigram_xent"))
  }

  // ---- web preprocessing (crawl-pipeline front door) ----

  /** Tracking query parameters every crawl pipeline strips before URL
    * identity is meaningful (the CommonCrawl/ClueWeb convention). */
  val TrackingParams = "utm_[a-z]+|gclid|fbclid|ref"

  /** URL canonicalization — the identity function URL-level dedup runs
    * on. Lowercases scheme and host, drops a `www.` prefix and the
    * scheme's default port, drops the fragment and tracking parameters,
    * sorts the surviving query parameters (param order is not URL
    * identity), normalizes an empty path to `/` and strips one trailing
    * slash elsewhere. A pure builtin-expression chain — the regex
    * extracts are codegen'd, the param filter/sort are higher-order
    * builtins (interpreted eval, but over a handful of params per URL
    * and with no UDF serialization boundary) — map-only, so at 100 TB
    * this runs at scan speed, and every regex here is RE2-compatible
    * (no backreferences) so the DuckDB oracle replicates it verbatim. */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "(?i)^([a-z][a-z0-9+.-]*)://", 1))
    val host0 = lower(regexp_extract(u, "(?i)^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1))
    // (www.)+ not www.: stripping one layer would make canonicalization
    // non-idempotent on a pathological www.www. host (PropertySpec pins
    // canon . canon == canon)
    val host = regexp_replace(host0, "^(www\\.)+", "")
    val port = regexp_extract(u, "(?i)^[a-z][a-z0-9+.-]*://[^/:?#]*:([0-9]+)", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path0 = regexp_extract(u, "(?i)^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "" || path0 === "/", lit("/"))
      .otherwise(regexp_replace(path0, "/$", ""))
    // the query is the FIRST '?' BEFORE any '#' (RFC 3986): [^#?]* pins
    // the scan to the pre-fragment prefix, otherwise a '?' inside the
    // fragment would invent a query ("…/p#sec?x=1" must canonicalize
    // like "…/p", not "…/p?x=1")
    val query0 = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val query = array_join(
      array_sort(filter(split(query0, "&"),
        p => !(p.rlike(s"^($TrackingParams)=") || p === ""))), "&")
    // a string with no scheme is not an absolute URL: pass it through
    // untouched (conservative identity — a crawl pipeline quarantines
    // these rather than guessing a scheme)
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** URL-level dedup: group by canonical URL, keep the smallest doc_id
    * (deterministic winner) and count the raw variants collapsed into
    * it. Hash group-by with map-side partial aggregation — the same
    * scale shape as exact text dedup (l5), never pairwise. */
  def urlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .select(canonicalizeUrl(col(urlCol)).as("canonical_url"), col("doc_id"))
      .groupBy("canonical_url")
      .agg(min(col("doc_id")).as("keep_doc"),
        count(lit(1)).cast("long").as("n_variants"))

  /** HTML/markup stripping — the boilerplate-removal front door of every
    * web-crawl corpus. Removes script/style blocks (handled as two
    * separate patterns: RE2 — hence the DuckDB oracle — has no
    * backreferences), comments and tags, decodes the common entities
    * (`&amp;` LAST, so `&amp;lt;` decodes to the literal `&lt;` exactly
    * once), and collapses whitespace. Pure regexp_replace chain:
    * map-only, codegen, no UDF. */
  /** Tag recognition is attribute-aware: quoted attribute values may
    * contain `>` (`<a title="a>b">`), so the tag pattern consumes
    * quoted runs atomically instead of stopping at the first `>`; a tag
    * must open with `/ ! ?` or a letter, so plain-text inequalities
    * (`a < b and c > d`) survive. CDATA sections contribute their
    * CONTENT (they are character data, not markup). All patterns are
    * RE2-safe and replicated verbatim in the DuckDB oracle. Documented
    * non-goal: the strip is NOT idempotent under entity decoding — a
    * document containing literal `&lt;b&gt;` decodes to `<b>` in the
    * output, exactly as a browser would render it; re-stripping the
    * OUTPUT is out of contract (pinned in LlmOpsSpec). */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script(?:[^>\"']|\"[^\"]*\"|'[^']*')*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style(?:[^>\"']|\"[^\"]*\"|'[^']*')*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val cdata = regexp_replace(noComment,
      "(?s)<!\\[CDATA\\[(.*?)\\]\\]>", " $1 ")
    val noTags = regexp_replace(cdata,
      "<[/!?a-zA-Z][^>\"']*(?:\"[^\"]*\"[^>\"']*|'[^']*'[^>\"']*)*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(e),
          java.util.regex.Matcher.quoteReplacement(r))
      }
    trim(regexp_replace(ent, "\\s+", " "))
  }
}
