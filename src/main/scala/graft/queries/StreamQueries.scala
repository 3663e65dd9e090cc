package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.GraftCatalog
import graft.streaming.StreamingLoader
import graft.write.{Merge, WriteConfig}

/** Structured-Streaming entries: drive a real streaming query to
  * completion inside the call, read the committed/accumulated result, and
  * check it against the equivalent batch SQL in DuckDB — streaming-batch
  * result parity. */
object StreamQueries {

  /** Stateful streaming creates one state-store instance per shuffle
    * partition per operator, and every micro-batch pays a checkpoint
    * commit per store — so state partitioning is sized to the stream's
    * keyspace/throughput, not inherited from the batch default. The conf
    * is pinned into the checkpoint at first batch. The body runs on a
    * CLONED session (`newSession()` shares the SparkContext, isolates
    * SQLConf): the old save/flip/restore on the shared session raced
    * with whatever else that session was running — the driver's Verify
    * executes 4 queries concurrently, and a parallel spec suite saw its
    * approx-quantile partitioning perturbed mid-flight. */
  private def withStatePartitions[T](s: SparkSession, n: Int)
      (body: SparkSession => T): T = {
    val iso = s.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", n.toString)
    body(iso)
  }

  /** Staging root shared with LlmQueries' staged-intermediate oracles
    * (xxhash64 signatures have no portable SQL form; DuckDB re-derives
    * everything downstream of them). */
  private val OracleStageRoot =
    sys.props.get("graft.oracle.stage.dir")
      .orElse(sys.env.get("GRAFT_ORACLE_STAGE"))
      .getOrElse("/tmp/graft-oracle-stage")

  private def stageForOracle(df: DataFrame, name: String): Unit =
    // repartition(1), not coalesce(1) — see LlmQueries.stageForOracle:
    // coalesce folds the whole upstream plan into one task
    df.repartition(1).write.mode("overwrite")
      .parquet(s"$OracleStageRoot/$name")

  /** One absorption step of the s9 oracle: documents of chunk `k` that
    * share a full LSH band with a PRIOR SURVIVOR at signature agreement
    * >= 0.6 are absorbed; the rest join the survivor set. Unrolled per
    * chunk because survivors feed the next step (the same sequential
    * semantics the stream executes batch-by-batch). */
  private def s9Step(k: Int): String =
    s"""m$k AS (SELECT DISTINCT ib.doc_id FROM b ib
       |  JOIN b cb ON ib.band = cb.band AND ib.bucket = cb.bucket
       |  JOIN s${k - 1} sv ON cb.doc_id = sv.doc_id
       |  JOIN sigs a ON a.doc_id = ib.doc_id
       |  JOIN sigs c ON c.doc_id = cb.doc_id
       |  WHERE ib.chunk = $k
       |    AND len(list_filter(range(1, 65), i -> a.sig[i] = c.sig[i])) / 64.0 >= 0.6),
       |s$k AS (SELECT doc_id FROM s${k - 1}
       |  UNION ALL SELECT doc_id FROM sigs WHERE chunk = $k
       |    AND doc_id NOT IN (SELECT doc_id FROM m$k))""".stripMargin

  /** One absorption step of the s11 oracle: vectors of chunk `k` whose
    * 4dp-rounded cosine against a PRIOR SURVIVOR in the SAME argmin
    * cluster clears 0.4 are absorbed; the rest join the survivor set —
    * the identical sequential semantics the stream executes. */
  private def s11Step(k: Int): String =
    s"""m$k AS (SELECT DISTINCT i.vec_id FROM a i
       |  JOIN a c ON i.cluster = c.cluster
       |  JOIN s${k - 1} sv ON c.vec_id = sv.vec_id
       |  WHERE i.chunk = $k
       |    AND round(list_cosine_similarity(i.v, c.v) + 1e-9, 4) >= 0.4),
       |s$k AS (SELECT vec_id FROM s${k - 1}
       |  UNION ALL SELECT vec_id FROM a WHERE chunk = $k
       |    AND vec_id NOT IN (SELECT vec_id FROM m$k))""".stripMargin

  /** The s10 messy-URL construction — one expression used identically by
    * the stream and the staged oracle input (four variant classes per
    * doc; 0/1/3 of the same (id%97, id%7) pair canonicalize together). */
  private def s10Url(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val pg = (id % 97).cast("string")
    val q = (id % 7).cast("string")
    when(id % 4 === 0, concat(lit("HTTPS://WWW.Example.COM:443/p/"), pg,
        lit("?utm_source=s&id="), q, lit("#f")))
      .when(id % 4 === 1, concat(lit("https://example.com/p/"), pg,
        lit("?id="), q))
      .when(id % 4 === 2, concat(lit("http://Example.COM:8080/alt/"), pg,
        lit("?x="), q))
      .otherwise(concat(lit("https://example.com/p/"), pg,
        lit("/?id="), q, lit("&fbclid=z")))
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(

    // streaming URL-level dedup against the committed corpus — the
    // crawl-ingest front door: each micro-batch canonicalizes its messy
    // URLs, keeps one winner per canonical within the batch, and drops
    // canonicals the committed table already holds. ZERO Spark state
    // (the committed table is the dedup state); the winner of a
    // canonical is therefore the min doc_id of the EARLIEST chunk that
    // carries it — the oracle replays exactly that with one
    // row_number() over (chunk, doc_id), after re-deriving the
    // canonicalization chain in SQL (all RE2-compatible regexes).
    "s10_stream_url_dedup" -> ((
      (s: SparkSession, dir: String) => withStatePartitions(s, 8) { iso =>
        val cat = new GraftCatalog(iso,
          Files.createTempDirectory("graft-s10-").toString)
        val loader = new graft.streaming.StreamingLoader(cat)
        val chunks = 4
        val src = StreamingLoader.docsChunkedStream(iso, dir, chunks)
        // stage the oracle input: every incoming (doc_id, chunk, url),
        // including the chunked stream's planted copies (id + 7e6 lands
        // one chunk after its original — same layout s9 stages)
        val docs = graft.Tables.t(iso, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val per = math.max(1L, math.ceil(n.toDouble / chunks).toLong)
        val copies = docs
          .filter(col("doc_id") % 5 === 0 && col("doc_id") < (chunks - 1) * per)
          .select((col("doc_id") + 7000000L).as("doc_id"))
        val q = loader.startUrlDeduped(
          src.withColumn("url", s10Url(col("doc_id"))),
          "main", "pages", cfg = WriteConfig(retryUnitMs = 10),
          queryName = "s10",
          checkpoint = Some(Files.createTempDirectory("graft-s10ck-").toString))
        // oracle staging is stream-independent: overlap it with the
        // micro-batches (guide §2.6), same as s9
        try {
          stageForOracle(docs.unionByName(copies)
            .withColumn("chunk",
              when(col("doc_id") >= 7000000L,
                floor((col("doc_id") - 7000000L) / per) + 1)
                .otherwise(floor(col("doc_id") / per)).cast("int"))
            .withColumn("url", s10Url(col("doc_id"))), "s10_urls")
          q.awaitTermination()
        } finally q.stop()
        require(q.lastProgress == null ||
          q.lastProgress.stateOperators.isEmpty,
          "url-dedup stream must hold no state-store state")
        cat.loadTable("main", "pages").read()
          .select(col("doc_id"), col("canonical_url"))
      },
      Some(s"""WITH d AS (SELECT doc_id, chunk, trim(url) AS u
        |  FROM read_parquet('$OracleStageRoot/s10_urls/*.parquet')),
        |c0 AS (SELECT doc_id, chunk,
        |  lower(regexp_extract(u, '(?i)^([a-z][a-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_replace(lower(regexp_extract(u,
        |    '(?i)^[a-z][a-z0-9+.-]*://([^/:?#]*)', 1)), '^(www\\.)+', '') AS host,
        |  regexp_extract(u, '(?i)^[a-z][a-z0-9+.-]*://[^/:?#]*:([0-9]+)', 1)
        |    AS port,
        |  regexp_extract(u, '(?i)^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
        |    AS path0,
        |  regexp_extract(u, '^[^#?]*\\?([^#]*)', 1) AS query0
        |  FROM d),
        |built AS (SELECT doc_id, chunk, scheme || '://' || host ||
        |  CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
        |       AND NOT (scheme = 'https' AND port = '443')
        |       THEN ':' || port ELSE '' END ||
        |  CASE WHEN path0 = '' OR path0 = '/' THEN '/'
        |       ELSE regexp_replace(path0, '/$$', '') END ||
        |  CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canonical_url
        |  FROM (SELECT *, array_to_string(list_sort(list_filter(
        |      string_split(query0, '&'),
        |      p -> NOT regexp_matches(p, '^(utm_[a-z]+|gclid|fbclid|ref)=')
        |        AND p <> '')), '&') AS qs FROM c0)),
        |r AS (SELECT doc_id, canonical_url,
        |    row_number() OVER (PARTITION BY canonical_url
        |      ORDER BY chunk, doc_id) AS rn
        |  FROM built)
        |SELECT doc_id, canonical_url FROM r WHERE rn = 1""".stripMargin))),

    // streaming NEAR-dup dedup against the committed corpus: each
    // micro-batch (4 contiguous doc_id-range chunks; chunks 1-3 carry
    // planted near-copies of every 5th doc of the previous chunk) is
    // deduped against the committed MinHash signature table via
    // band-bucket join + signature-agreement verification, and only
    // survivors (docs + their signatures) are appended. ZERO Spark
    // state — the committed signature table is the dedup state, bounded
    // by survivor count and restart-durable. Staged-signature oracle:
    // all incoming signatures are staged with their chunk index and
    // DuckDB replays the 4-step sequential absorption exactly.
    "s9_stream_near_dedup" -> ((
      (s: SparkSession, dir: String) => withStatePartitions(s, 8) { iso =>
        val cat = new GraftCatalog(iso,
          Files.createTempDirectory("graft-s9-").toString)
        val loader = new graft.streaming.StreamingLoader(cat)
        val chunks = 4
        val src = StreamingLoader.docsChunkedStream(iso, dir, chunks)
        // stage every incoming signature with its chunk for the oracle
        // (same minHashSignatures call the stream makes per batch)
        val docs = graft.Tables.t(iso, dir, "documents")
          .select(col("doc_id"), col("text"))
        val n = docs.count()
        val per = math.max(1L, math.ceil(n.toDouble / chunks).toLong)
        val copies = docs
          .filter(col("doc_id") % 5 === 0 &&
            col("doc_id") < (chunks - 1) * per)
          .select((col("doc_id") + 7000000L).as("doc_id"),
            concat(col("text"), lit(" graftmarker")).as("text"))
        val incoming = docs.unionByName(copies)
        val q = loader.startNearDeduped(src, "main", "docs_clean",
          "doc_sigs", cfg = WriteConfig(retryUnitMs = 10), queryName = "s9",
          checkpoint = Some(Files.createTempDirectory("graft-s9ck-").toString))
        // the oracle staging (a full MinHash over incoming ∪ copies) reads
        // nothing the stream writes — run it CONCURRENTLY with the
        // micro-batches so its jobs back-fill the stream's idle cores
        // (guide §2.6); staging failure still stops the stream
        try {
          stageForOracle(
            graft.llmops.Dedup.minHashSignatures(incoming)
              .withColumn("chunk",
                when(col("doc_id") >= 7000000L,
                  floor((col("doc_id") - 7000000L) / per) + 1)
                  .otherwise(floor(col("doc_id") / per)).cast("int")),
            "s9_sigs")
          q.awaitTermination()
        } finally q.stop()
        // zero Spark streaming state: the committed table is the state
        require(q.lastProgress == null ||
          q.lastProgress.stateOperators.isEmpty,
          "near-dedup stream must hold no state-store state")
        val clean = cat.loadTable("main", "docs_clean").read()
        // every planted cross-batch near-copy must have been absorbed
        require(clean.filter(col("doc_id") >= 7000000L).count() == 0,
          "planted near-copies must be absorbed by the committed-corpus dedup")
        clean.select(col("doc_id"))
      },
      Some(s"""WITH sigs AS (SELECT doc_id, chunk, sig
        |  FROM read_parquet('$OracleStageRoot/s9_sigs/*.parquet')),
        |b AS (SELECT doc_id, chunk, band, sig[band*2+1 : band*2+2] AS bucket
        |  FROM sigs, (SELECT unnest(range(0, 32)) AS band) bands),
        |s0 AS (SELECT doc_id FROM sigs WHERE chunk = 0),
        |${s9Step(1)},
        |${s9Step(2)},
        |${s9Step(3)}
        |SELECT doc_id FROM s3""".stripMargin))),

    // event-time windowed aggregation over a file stream (memory sink)
    "s1_stream_agg" -> ((
      (s: SparkSession, dir: String) => {
        val q = StreamingLoader.dailyRollup(StreamingLoader.eventsStream(s, dir))
          .writeStream.queryName("s1_out").outputMode("complete")
          .format("memory").start()
        try q.processAllAvailable() finally q.stop()
        s.table("s1_out")
      },
      Some("""SELECT event_type, CAST(ts AS DATE) AS event_day, COUNT(*) AS n,
        |  CAST(ROUND(SUM(value), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin))),

    // foreachBatch -> commit protocol: the stream lands in a catalog table
    // (one snapshot per micro-batch), read back from the committed snapshot
    "s2_stream_to_table" -> ((
      (s: SparkSession, dir: String) => {
        val cat = new GraftCatalog(s,
          Files.createTempDirectory("graft-st-").toString)
        val loader = new graft.streaming.StreamingLoader(cat)
        val ckpt = Files.createTempDirectory("graft-ckpt-").toString
        val q = loader.start(StreamingLoader.eventsStream(s, dir),
          "main", "events_stream", cfg = WriteConfig(retryUnitMs = 10),
          queryName = "s2", checkpoint = Some(ckpt))
        try q.awaitTermination() finally q.stop()
        cat.loadTable("main", "events_stream").read()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 2).cast("double").as("sum_value"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        |  CAST(ROUND(SUM(value), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin))),

    // stateful streaming sessionization via the native session_window
    // aggregation (merging event-time session state per user). Spark's
    // merge boundary is INCLUSIVE — an event at exactly prev+gap still
    // joins the session (verified against a real 1800s gap at sf0.1) —
    // so the batch oracle breaks on `t > prev + INTERVAL 30 MINUTE`,
    // identical to q27's lag formulation.
    "s3_stream_sessions" -> ((
      (s: SparkSession, dir: String) => {
        val ev = StreamingLoader.eventsStream(s, dir)
          .withColumn("t", date_trunc("second", col("ts")))
        val q = ev
          .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
          .agg(count(lit(1)).as("n_events_w"))
          .writeStream.queryName("s3_out").outputMode("complete")
          .format("memory").start()
        try q.processAllAvailable() finally q.stop()
        s.table("s3_out").groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("n_events_w")).cast("long").as("n_events"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, date_trunc('second', ts) AS t
        |  FROM events),
        |g AS (SELECT user_id, event_id, t,
        |  CASE WHEN t > lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |              + INTERVAL '30' MINUTE
        |       THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT user_id,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, COUNT(DISTINCT sid) AS n_sessions, COUNT(*) AS n_events
        |FROM s GROUP BY user_id""".stripMargin))),

    // THE state-bounded streaming template: update-mode watermarked
    // aggregation → foreachBatch upsert keyed on the window identity.
    // Unlike s1/s3's complete-mode memory sinks (fine for finite test
    // streams, unbounded state on real ones), the watermark evicts
    // closed windows from state each batch and the merge disposition
    // folds re-emitted windows into the committed table — the pattern a
    // user should copy at 100 TB. Bounded-state is asserted in
    // StreamingSpec via stateOperators.numRowsTotal.
    // 4 state partitions: the rollup keyspace is ~40 (event_type x day)
    // windows, and every micro-batch pays a checkpoint commit per state
    // store — sizing to the keyspace, not the batch default, is the knob
    // (s5 keeps 8: its dedup state is event-id-sized)
    "s4_stream_watermarked" -> ((
      (s: SparkSession, dir: String) => withStatePartitions(s, 4) { iso =>
        val cat = new GraftCatalog(iso,
          Files.createTempDirectory("graft-s4-").toString)
        val loader = new graft.streaming.StreamingLoader(cat)
        val src = StreamingLoader.eventsChunkedStream(iso, dir, chunks = 4)
        // merge-on-read: each micro-batch commits its staged rows + ONE
        // delete-key file instead of rewriting the windows it re-emits —
        // the trickle-upsert shape MoR exists for (O(batch) commit IO;
        // the final read applies deletes via broadcast anti-join)
        val q = loader.start(StreamingLoader.dailyRollup(src),
          "main", "daily_rollup", disposition = Merge("upsert"),
          cfg = WriteConfig(retryUnitMs = 10,
            primaryKey = Seq("event_type", "event_day"), mergeOnRead = true),
          queryName = "s4",
          checkpoint = Some(Files.createTempDirectory("graft-s4ck-").toString),
          outputMode = Some("update"))
        try q.awaitTermination() finally q.stop()
        cat.loadTable("main", "daily_rollup").read()
          .select(col("event_type"), col("event_day"), col("n"), col("sum_value"))
      },
      Some("""SELECT event_type, CAST(ts AS DATE) AS event_day, COUNT(*) AS n,
        |  CAST(ROUND(SUM(value), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin))),

    // stream-stream inner join: conversion attribution — each purchase
    // joins the same user's views from the preceding 30 minutes. BOTH
    // sides are watermarked and the join carries a time-range condition,
    // so Spark bounds the join state (views evict once view_ts + 30min
    // drops behind the watermark) — the join-state analogue of s4's
    // bounded aggregation state. Committed through the same foreachBatch
    // protocol; the oracle is the equivalent batch self-join.
    "s6_stream_stream_join" -> ((
      (s: SparkSession, dir: String) => withStatePartitions(s, 4) { iso =>
        val cat = new GraftCatalog(iso,
          Files.createTempDirectory("graft-s6-").toString)
        val loader = new graft.streaming.StreamingLoader(cat)
        val src = StreamingLoader.eventsChunkedStream(iso, dir, chunks = 4)
        val views = src.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
          .withWatermark("view_ts", "1 hour")
        val purchases = src.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"),
            col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
          .withWatermark("purchase_ts", "1 hour")
        val joined = views.join(purchases,
          expr("user_id = p_user_id AND " +
            "purchase_ts >= view_ts AND " +
            "purchase_ts <= view_ts + INTERVAL 30 MINUTES"))
          .select(col("user_id"), col("view_id"), col("purchase_id"))
        val q = loader.start(joined, "main", "attributions",
          cfg = WriteConfig(retryUnitMs = 10), queryName = "s6",
          checkpoint = Some(Files.createTempDirectory("graft-s6ck-").toString))
        try q.awaitTermination() finally q.stop()
        cat.loadTable("main", "attributions").read()
      },
      Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
        |FROM events v JOIN events p
        |  ON p.user_id = v.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '30' MINUTE""".stripMargin))),

    // streaming exact dedup: every event arrives TWICE (at-least-once
    // delivery); dropDuplicatesWithinWatermark keys state on event_id and
    // the watermark evicts seen-keys once their horizon passes — bounded
    // state, unlike a global dropDuplicates. The committed table must
    // equal the original (duplicate-free) events relation.
    "s5_stream_dedup" -> ((
      (s: SparkSession, dir: String) => withStatePartitions(s, 8) { iso =>
        val cat = new GraftCatalog(iso,
          Files.createTempDirectory("graft-s5-").toString)
        val loader = new graft.streaming.StreamingLoader(cat)
        val src = StreamingLoader.eventsChunkedStream(iso, dir, chunks = 4,
          duplicateRows = true)
        val deduped = src
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("event_id")
        val q = loader.start(deduped, "main", "events_dedup",
          cfg = WriteConfig(retryUnitMs = 10), queryName = "s5",
          checkpoint = Some(Files.createTempDirectory("graft-s5ck-").toString))
        try q.awaitTermination() finally q.stop()
        cat.loadTable("main", "events_dedup").read()
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("event_id")).as("n_distinct"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT event_id) AS n_distinct
        |FROM events GROUP BY event_type""".stripMargin))),

    // streaming change-data-feed: changesBetween exposed as an
    // incremental source (GraftCdcSource) — the first micro-batch
    // bootstraps the initial snapshot as inserts, the second delivers
    // exactly the in-between upsert's delete+insert events; the memory
    // sink accumulates both, oracled against the batch changelog
    "s7_stream_cdc" -> ((
      (s: SparkSession, dir: String) => {
        val wh = Files.createTempDirectory("graft-s7-").toString
        val cat = new GraftCatalog(s, wh)
        val w = new graft.write.GraftWriter(cat)
        val mcfg = WriteConfig(primaryKey = Seq("o_orderkey"),
          retryUnitMs = 10, mergeOnRead = true)
        val orders = graft.Tables.t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderpriority"))
        w.writeTable("main", "orders_cdc",
          Seq(orders.filter(col("o_orderkey") % 3 =!= 0)),
          Merge("upsert"), mcfg, "l1")
        val q = s.readStream
          .format(classOf[graft.streaming.GraftCdcSourceProvider].getName)
          .option("warehouse", wh).option("table", "main.orders_cdc").load()
          .select(col("o_orderkey"), col("o_totalprice"), col("_change_type"))
          .writeStream.queryName("s7_out").format("memory").start()
        try {
          q.processAllAvailable() // batch 0: bootstrap inserts
          w.writeTable("main", "orders_cdc",
            Seq(orders.filter(col("o_orderkey") % 2 === 0)
              .withColumn("o_totalprice", col("o_totalprice") + 10.0)),
            Merge("upsert"), mcfg, "l2")
          q.processAllAvailable() // batch 1: the upsert's change events
        } finally q.stop()
        s.table("s7_out")
      },
      Some("""SELECT o_orderkey, o_totalprice, 'insert' AS _change_type
        |FROM orders WHERE o_orderkey % 3 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice,
        |  'insert' AS _change_type
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT DISTINCT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice,
        |  'delete' AS _change_type
        |FROM orders WHERE o_orderkey % 2 = 0
        |  AND o_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderkey % 3 <> 0)""".stripMargin))),

    // the s4 trickle-upsert template composed with write-path
    // self-maintenance: streaming MoR upserts are EXACTLY the workload
    // that accumulates a delete backlog (one delete file per micro-batch
    // of re-emitted windows), so the table opts into
    // graft.mor.auto-apply-deletes with a tight threshold and the stream
    // pays its own backlog down inline — the entry asserts the resting
    // backlog stays bounded AND at least one maintenance snapshot landed
    // mid-stream, then returns the rollup (maintenance stays
    // content-neutral under the streaming commit protocol)
    "s8_stream_auto_maintain" -> ((
      (s: SparkSession, dir: String) => withStatePartitions(s, 4) { iso =>
        val cat = new GraftCatalog(iso,
          Files.createTempDirectory("graft-s8-").toString)
        val w = new graft.write.GraftWriter(cat)
        val morCfg = WriteConfig(retryUnitMs = 10,
          primaryKey = Seq("event_type", "event_day"), mergeOnRead = true)
        // pre-create empty so the maintenance policy precedes the stream
        val empty = graft.Tables.t(iso, dir, "events").limit(0)
          .groupBy(col("event_type"), col("ts").cast("date").as("event_day"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("value")), 2).cast("double").as("sum_value"))
        w.writeTable("main", "daily_rollup", Seq(empty), Merge("upsert"),
          morCfg, "l0")
        cat.loadTable("main", "daily_rollup").commit(m => m.copy(properties =
          m.properties
            + (graft.write.Maintenance.AutoApplyDeletesProp -> "true")
            + (graft.write.Maintenance.MaxDeleteFilesProp -> "2")), unitMs = 1)
        val loader = new graft.streaming.StreamingLoader(cat)
        val src = StreamingLoader.eventsChunkedStream(iso, dir, chunks = 8)
        val q = loader.start(StreamingLoader.dailyRollup(src),
          "main", "daily_rollup", disposition = Merge("upsert"),
          cfg = morCfg, queryName = "s8",
          checkpoint = Some(Files.createTempDirectory("graft-s8ck-").toString),
          outputMode = Some("update"))
        try q.awaitTermination() finally q.stop()
        val tbl = cat.loadTable("main", "daily_rollup")
        val backlog = graft.write.Maintenance.deleteBacklog(tbl)
        require(backlog.deleteFileCount <= 2,
          s"streaming auto-apply must bound the resting backlog: $backlog")
        require(tbl.metadata.snapshots.exists(_.operation == "apply-deletes"),
          "inline maintenance must have fired during the stream")
        tbl.read()
          .select(col("event_type"), col("event_day"), col("n"), col("sum_value"))
      },
      Some("""SELECT event_type, CAST(ts AS DATE) AS event_day, COUNT(*) AS n,
        |  CAST(ROUND(SUM(value), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin))),

    // streaming SEMANTIC dedup against the committed corpus — the
    // embedding-space twin of s9, with the same zero-Spark-state
    // doctrine: batch 0 bootstraps (trains deterministic Lloyd's,
    // commits the k-row centroid table), every later batch loads the
    // COMMITTED centroids, assigns map-side, and near-dups against the
    // committed identity(cluster) assignment table (one-sided SPJ —
    // pinned in StreamingSpec). Planted EXACT copies cross every chunk
    // boundary; an exact copy shares its source's argmin cluster
    // structurally, so absorption is a hard require, and the staged
    // assignment + DuckDB sequential replay pin everything else.
    "s11_stream_sem_dedup" -> ((
      (s: SparkSession, dir: String) => withStatePartitions(s, 8) { iso =>
        val cat = new GraftCatalog(iso,
          Files.createTempDirectory("graft-s11-").toString)
        val loader = new graft.streaming.StreamingLoader(cat)
        val chunks = 4
        val src = StreamingLoader.embeddingsChunkedStream(iso, dir, chunks)
        val q = loader.startSemanticDeduped(src, "main", "vecs_clean",
          "vec_assign", cfg = WriteConfig(retryUnitMs = 10),
          queryName = "s11",
          checkpoint = Some(Files.createTempDirectory("graft-s11ck-").toString))
        try q.awaitTermination() finally q.stop()
        require(q.lastProgress == null ||
          q.lastProgress.stateOperators.isEmpty,
          "semantic-dedup stream must hold no state-store state")
        // stage (vec_id, chunk, cluster, v) for EVERY incoming vector
        // under the COMMITTED centroids — the oracle replays the
        // sequential absorption over exactly this assignment
        val cents = graft.llmops.SemanticDedup.loadCentroids(
          cat.loadTable("main", "vec_assign_centroids").read())
        val vecs = graft.Tables.t(iso, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val n = vecs.count()
        val per = math.max(1L, math.ceil(n.toDouble / chunks).toLong)
        val copies = vecs
          .filter(col("vec_id") % 9 === 0 &&
            col("vec_id") < (chunks - 1) * per)
          .select((col("vec_id") + 9000000L).as("vec_id"), col("embedding"))
        val incoming = vecs.unionByName(copies)
        stageForOracle(
          graft.llmops.SemanticDedup.assign(incoming, cents)
            .withColumn("chunk",
              when(col("vec_id") >= 9000000L,
                floor((col("vec_id") - 9000000L) / per) + 1)
                .otherwise(floor(col("vec_id") / per)).cast("int"))
            .select(col("vec_id"), col("chunk"), col("cluster"), col("v")),
          "s11_assign")
        val clean = cat.loadTable("main", "vecs_clean").read()
        // structural recall contract: every planted exact copy shares
        // its source's argmin cluster and has cosine 1 — none survive
        require(clean.filter(col("vec_id") >= 9000000L).count() == 0,
          "planted exact copies must be absorbed by the committed-corpus dedup")
        clean.select(col("vec_id"))
      },
      Some(s"""WITH a AS (SELECT vec_id, chunk, cluster, v
        |  FROM read_parquet('$OracleStageRoot/s11_assign/*.parquet')),
        |s0 AS (SELECT vec_id FROM a WHERE chunk = 0),
        |${s11Step(1)},
        |${s11Step(2)},
        |${s11Step(3)}
        |SELECT vec_id FROM s3""".stripMargin)))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.map { case (n, (fn, _)) => n -> fn }

  def oracleSql: Map[String, String] =
    entries.collect { case (n, (_, Some(sql))) => n -> sql }
}
