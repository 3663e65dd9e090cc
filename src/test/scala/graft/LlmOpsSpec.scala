package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.{Dedup, Multimodal, Similarity, TextOps}

/** Semantics pins for the ★ LLM-pipeline operators, especially the
  * rows-only-checked ones (lang ID, SimHash, LSH-ANN): determinism,
  * internal consistency, and LSH recall against the exact baselines. */
class LlmOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.t(spark, sf, "documents").cache()
  private lazy val emb = Tables.t(spark, sf, "embeddings").cache()

  test("exact dedup keeps one survivor per planted duplicate") {
    val d = docs.select(col("doc_id"), col("text"))
    val planted = d.union(d.select(col("doc_id") + 1000000L, col("text")))
    val out = Dedup.exactDedup(planted)
    assert(out.count() == d.count())
    assert(out.agg(max("doc_id")).collect()(0).getLong(0) < 1000000L) // min id survives
    assert(out.agg(min("n_copies")).collect()(0).getLong(0) == 2L)
  }

  test("minhash-LSH finds exactly the exact-Jaccard pairs at J>0.5") {
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.5, exact = true).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(docs, 3, 64, 32, 0.5).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus should contain planted near-dups")
    assert(lsh == exact) // recall ~1 at J>=0.9; precision exact by verification
  }

  test("simhash is deterministic and near-dups have close simhashes") {
    val s1 = Dedup.simHash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Dedup.simHash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    // planted near-dup pairs (J>=0.9) should be within small hamming distance
    val nearDups = Dedup.ngramJaccardPairs(docs, 3, 0.8, exact = true).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    val close = nearDups.count { case (a, b) =>
      java.lang.Long.bitCount(s1(a) ^ s1(b)) <= 12
    }
    assert(close >= nearDups.length / 2,
      s"expected most planted near-dups hamming-close, got $close/${nearDups.length}")
  }

  test("simHashPairs output matches brute-force hamming filter") {
    val sims = Dedup.simHash(docs).collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, ha) <- sims; (b, hb) <- sims if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val banded = Dedup.simHashPairs(docs, 3).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute) // pigeonhole: 4 bands catch all distance<=3 pairs
  }

  test("lang id predicts a known language with a score") {
    val out = TextOps.langId(docs).collect()
    assert(out.length == docs.count())
    val langs = TextOps.LangMarkers.keySet
    assert(out.forall(r => langs.contains(r.getAs[String]("lang_pred"))))
    assert(out.forall(r => r.getAs[Double]("lang_score") >= 0.0))
  }

  test("LSH-ANN recall vs brute force is high on the test embeddings") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(emb, queries, k = 5, numPlanes = 4, tables = 8)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    // random gaussian-ish embeddings are the hardest case for sign-LSH
    // (true neighbors sit at ~66 degrees); multi-table S-curve with 8
    // tables x 4 planes predicts ~0.7 recall there — pin a safe floor
    assert(recall >= 0.4, s"ANN recall $recall below multi-table floor")
    assert(ann.nonEmpty)
  }

  test("IVF-ANN is deterministic with recall comparable to probing 1/4 of the corpus") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity.ivfTopK(emb, queries, k = 5, nlist = 16, nprobe = 4)
      .select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = run()
    assert(ivf == run()) // sampled centroids are deterministic
    val recall = (brute & ivf).size.toDouble / brute.size
    // near-orthogonal gaussian embeddings are the worst case for coarse
    // quantization; nprobe/nlist = 1/4 of the corpus bounds expected
    // recall near that fraction — pin a conservative floor
    assert(recall >= 0.2, s"IVF recall $recall below floor")
    assert(ivf.nonEmpty)
  }

  test("bucketed cosine near-dup: precision 1 vs exact; full recall on planted dups") {
    // precision: every bucketed pair is an exact pair (verification step)
    val exact = Similarity.cosineNearDupPairsExact(emb, 0.4).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.cosineNearDupPairsBucketed(emb, 0.4,
      numPlanes = 4, tables = 8).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(exact))

    // structural recall: identical vectors share every bucket, so planted
    // duplicates are always found — the l19 driver entry's guarantee
    val ids = emb.select(col("vec_id"), col("embedding"))
    val planted = ids.unionByName(
      ids.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val dups = Similarity.cosineNearDupPairsBucketed(planted, 0.95,
      numPlanes = 16, tables = 2)
    val n = ids.count()
    assert(dups.filter(col("b") === col("a") + 1000000L).count() == n)

    // the public API is exact unless the caller opts in: the default plan
    // must NOT contain LSH buckets even at a high threshold (silent
    // approximation drops ~59% of genuine pairs at cosine 0.8)
    val defaultPlan = Similarity.cosineNearDupPairs(emb, 0.95)
      .queryExecution.executedPlan.toString
    assert(!defaultPlan.contains("bucket"))
    val optedIn = Similarity.cosineNearDupPairs(emb, 0.95, approx = true)
      .queryExecution.executedPlan.toString
    assert(optedIn.contains("bucket"))
    // opting into approx below the similarity-gap floor is rejected
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(emb, 0.4, approx = true)
    }
  }

  test("sequence packing is deterministic, shard-local, and budget-aligned") {
    val a = TextOps.packSequences(docs, tokenBudget = 512, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val b = TextOps.packSequences(docs.repartition(5), tokenBudget = 512, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1))) // input partitioning irrelevant
    // replay the greedy pack per shard locally and compare
    a.groupBy(_._3).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, n, _, packId) =>
        assert(packId == shard * 1000000L + cum / 512, s"shard $shard mispacked")
        cum += n
      }
    }
  }

  test("near-dup clustering is transitive and labels with the cluster min") {
    // chain 1-2, 2-3 plus isolated pair 10-11: 3-clusters via transitivity
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 20L), (5L, 7L))
      .toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      5L -> 5L, 7L -> 5L, 20L -> 5L)
    val unionFind = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unionFind == want)
    // the distributed label-propagation path must agree exactly
    val propagated = Dedup.nearDupClusters(pairs, driverUnionFindMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(propagated == want)
  }

  test("capped Jaccard on power-law shingles: same pairs, no boilerplate fan-out") {
    // small instance of the adversarial distribution AdversarialJaccardBench
    // measures (11.1x at 10k docs): every doc shares 10 boilerplate
    // shingles; near-dup truth lives only in rare shingles
    val adv = graft.tools.AdversarialJaccardBench.corpus(spark, nDocs = 400)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairSet(Dedup.ngramJaccardPairs(adv, n = 3, threshold = 0.3,
      maxShingleFreq = Some(100)))
    val uncapped = pairSet(Dedup.ngramJaccardPairs(adv, n = 3, threshold = 0.3,
      exact = true))
    // identical result sets at this threshold: the cap drops ONLY shingles
    // that cannot produce a qualifying pair
    assert(capped == uncapped)
    // and both contain exactly the 50 planted near-dup pairs
    val planted = (0L until 100L by 2).map(i => (i, i + 1)).toSet
    assert(capped == planted)
    // the DEFAULT plan (auto-derived cap, r12) also loses nothing: the
    // boilerplate head sits far above p99.9, the planted pairs' rare
    // shingles far below
    assert(pairSet(Dedup.ngramJaccardPairs(adv, n = 3, threshold = 0.3)) ==
      planted)
  }

  test("autoShingleCap: integer-exact p99.9 with the documented floor") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // 999 shingles at df=1 and one hot shingle at df=500: p99.9 crossing
    // lands on df=1 (999/1000 cum), so the floor (10) rules
    def dfsOf(vals: Seq[Int]) = vals.zipWithIndex
      .flatMap { case (df, g) => Seq.fill(df)(g.toLong) }
      .toDF("g").groupBy("g").agg(count(lit(1)).as("df"))
    assert(Dedup.autoShingleCap(dfsOf(Seq.fill(999)(1) :+ 500)) == 10)
    // all shingles at df=40: the p99.9 value IS 40 and exceeds the floor
    assert(Dedup.autoShingleCap(dfsOf(Seq.fill(50)(40))) == 40)
    // empty corpus: floor
    assert(Dedup.autoShingleCap(dfsOf(Seq.empty)) == 10)
    // pair-mass budget binds on a template-saturated distribution: 50
    // shingles at df=40 cost 50*1600 = 80k pair mass; with a 60k budget
    // the cap falls back to the floor instead of admitting the join blowup
    assert(Dedup.autoShingleCap(dfsOf(Seq.fill(50)(40)),
      maxPairMass = 60000L) == 10)
    // mixed: 100 at df=12 (mass 14400) + 50 at df=40 (mass 80000); a
    // 20k budget admits df=12 (cum 14400) but not df=40 -> cap 12
    assert(Dedup.autoShingleCap(dfsOf(Seq.fill(100)(12) ++ Seq.fill(50)(40)),
      maxPairMass = 20000L) == 12)
    // exact=true with an explicit cap is a contract violation
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, 3, 0.5, maxShingleFreq = Some(5),
        exact = true).count()
    }
    // dfs above 2^20 flow through UNCLAMPED — the cap must be the true
    // df (the oracle's arithmetic), not a 1<<20 histogram artifact (a
    // prior cut clamped and silently diverged from the SQL replay)
    val bigDfs = Seq((0L, 3000000L), (1L, 5L)).toDF("g", "df")
    assert(Dedup.autoShingleCap(bigDfs, maxPairMass = Long.MaxValue)
      == 3000000)
  }

  test("cluster resolution converges on graphs with diameter >> round cap") {
    // a 64-node path (diameter 63): plain min-label propagation needs 63
    // rounds, far beyond the old silent maxIters=10 cap — pointer-halving
    // must converge in ~log2(63) rounds and both paths must agree
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val driver = Dedup.nearDupClusters(path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver.size == 64 && driver.values.forall(_ == 0L))
    val dist = Dedup.nearDupClusters(path, maxIters = 12, driverUnionFindMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == driver)
    // an impossible cap must throw, never return split clusters silently
    intercept[IllegalStateException] {
      Dedup.nearDupClusters(path, maxIters = 1, driverUnionFindMax = 0L).collect()
    }
  }

  test("split assignment is leakage-safe: stable under corpus growth, near fractions") {
    val full = TextOps.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // a subset corpus assigns identically — membership depends only on key
    val subset = TextOps.splitAssign(docs.limit(100)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(subset.forall { case (k, v) => full(k) == v })
    val n = full.size.toDouble
    val train = full.values.count(_ == "train") / n
    assert(train > 0.7 && train < 0.9, s"train fraction $train far from 0.8")
    assert(full.values.toSet == Set("train", "val", "test"))
  }

  test("binaryFile media ingest reads files distributed with exact bytes") {
    val dir = "/root/testdata/sf0.001"
    val got = Multimodal.readMediaDir(spark, s"$dir/*.parquet")
      .collect().map(r => r.getAs[String]("file_name") ->
        (r.getAs[Long]("byte_len"), r.getAs[Array[Byte]]("blob"))).toMap
    assert(got.keySet.contains("documents.parquet"))
    got.foreach { case (name, (len, blob)) =>
      val disk = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/$name"))
      assert(len == disk.length && java.util.Arrays.equals(blob, disk),
        s"$name bytes differ from disk")
    }
  }

  test("frame sampling is deterministic, bounded, and within frame range") {
    val blobs = Multimodal.asAviBlobs(docs)
    val a = Multimodal.sampleVideoFrames(blobs, k = 4).collect().sortBy(f => (f.doc_id, f.frame_idx))
    val b = Multimodal.sampleVideoFrames(blobs.repartition(3), k = 4).collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(a.sameElements(b)) // partitioning never affects results
    assert(a.length == docs.count() * 4) // bounded fan-out: k rows per doc
    assert(a.forall(f => f.frame_idx >= 0 && f.frame_idx < f.n_frames))
    // uniform endpoints: first and last frames always sampled
    assert(a.groupBy(_.doc_id).values.forall { fs =>
      fs.map(_.frame_idx).min == 0 && fs.map(_.frame_idx).max == fs.head.n_frames - 1
    })
    // the REAL chain: decoded dimensions equal the deterministic formulas
    assert(a.forall(f =>
      f.width == Multimodal.aviFrameWidth(f.doc_id, f.frame_idx) &&
        f.height == Multimodal.aviFrameHeight(f.doc_id, f.frame_idx) &&
        f.n_frames == Multimodal.aviFrameCount(f.doc_id)))
  }

  test("AVI demux: RIFF walk recovers every frame; JPEGs decode to planted dims") {
    val blob = Multimodal.encodeAvi(42L)
    val frames = Multimodal.demuxAvi(blob)
    assert(frames.length == Multimodal.aviFrameCount(42L))
    javax.imageio.ImageIO.setUseCache(false)
    frames.zipWithIndex.foreach { case (f, i) =>
      // every frame is a real JPEG (SOI marker) with the planted dims
      assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8, s"frame $i not JPEG")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img.getWidth == Multimodal.aviFrameWidth(42L, i) &&
        img.getHeight == Multimodal.aviFrameHeight(42L, i))
    }
    // demux rejects non-AVI bytes loudly
    intercept[IllegalArgumentException] {
      Multimodal.demuxAvi("plainly not a RIFF".getBytes("UTF-8"))
    }
    // a corrupt chunk size must THROW, not wedge: a negative size field
    // (signed wrap) once stopped the walk offset from advancing — an
    // infinite loop on the executor
    val corrupt = blob.clone()
    // first chunk header after the RIFF preamble starts at offset 12;
    // its size field is bytes 16..19
    corrupt(16) = 0xf8.toByte; corrupt(17) = 0xff.toByte
    corrupt(18) = 0xff.toByte; corrupt(19) = 0xff.toByte
    intercept[IllegalArgumentException] { Multimodal.demuxAvi(corrupt) }
  }

  test("codec container walkers: header arithmetic round-trips, corruption throws") {
    for (id <- Seq(0L, 1L, 7L, 97L, 1234L)) {
      val (msr, mch, mfr, mus, mb) = Multimodal.parseMp3(Multimodal.encodeMp3(id))
      assert(mfr == 10 + (id % 50).toInt && Set(44100, 48000, 32000)(msr))
      assert(mch == (if (id % 2 == 1) 1 else 2))
      assert(mus == mfr.toLong * 1152L * 1000000L / msr && mb > 0)
      val (asr, ach, afr, aus, _) = Multimodal.parseAdts(Multimodal.encodeAdts(id))
      assert(afr == 8 + (id % 40).toInt && ach == 1 + (id % 2).toInt)
      assert(aus == afr.toLong * 1024L * 1000000L / asr)
      val (osr, och, ofr, ous, _) = Multimodal.parseOpus(Multimodal.encodeOpus(id))
      assert(osr == 48000 && och == 1 + (id % 2).toInt)
      assert(ofr == 2 + (id % 20).toInt && ous == ofr.toLong * 20000L)
    }
    // walkers are REAL parsers: corruption fails loudly, never wedges
    intercept[IllegalArgumentException] {
      Multimodal.parseMp3("not audio".getBytes("UTF-8"))
    }
    val mp3 = Multimodal.encodeMp3(5L)
    mp3(0) = 0x00 // break the sync word
    intercept[IllegalArgumentException] { Multimodal.parseMp3(mp3) }
    val adts = Multimodal.encodeAdts(5L)
    adts(4) = 0xFF.toByte // frame length points past the buffer
    intercept[IllegalArgumentException] { Multimodal.parseAdts(adts) }
    val opus = Multimodal.encodeOpus(5L)
    opus(40) = (opus(40) ^ 0x5A).toByte // flip a body byte -> CRC mismatch
    intercept[IllegalArgumentException] { Multimodal.parseOpus(opus) }
    // truncation (half the last page gone) is detected
    intercept[IllegalArgumentException] {
      Multimodal.parseOpus(java.util.Arrays.copyOfRange(
        Multimodal.encodeOpus(5L), 0, Multimodal.encodeOpus(5L).length - 9))
    }
    // EMPTY input is corrupt input, not a zero-frame success: the
    // per-frame requires pass vacuously, so the no-frames contract must
    // fire before the duration arithmetic divides by sr = 0
    intercept[IllegalArgumentException] {
      Multimodal.parseMp3(Array.emptyByteArray)
    }
    intercept[IllegalArgumentException] {
      Multimodal.parseAdts(Array.emptyByteArray)
    }
  }

  test("MP4 box walker: layout arithmetic round-trips, corruption throws") {
    for (id <- Seq(0L, 1L, 7L, 59L, 1234L)) {
      val blob = Multimodal.encodeMp4(id)
      val (durUs, tracks, bytes) = Multimodal.parseMp4(blob)
      val vFrames = 5 + (id % 60).toInt
      val hasAudio = id % 2 == 0
      val aSamples = 40 + (id % 100).toInt
      assert(tracks.map(_.codec) ==
        (if (hasAudio) Seq("avc1", "mp4a") else Seq("avc1")))
      assert(tracks.head.samples == vFrames)
      if (hasAudio) assert(tracks(1).samples == aSamples)
      val vMs = vFrames.toLong * 1001L * 1000L / 30000L
      val aMs = if (hasAudio) aSamples.toLong * 1024L * 1000L / 48000L else 0L
      assert(durUs == math.max(vMs, aMs) * 1000L,
        s"mvhd duration arithmetic drift for id=$id")
      assert(bytes == blob.length.toLong)
      // exact total-size arithmetic (the l65 oracle's formula)
      val expected = 24L + 8 + 108 + 439 + (if (hasAudio) 385 else 0) +
        8 + vFrames.toLong * (20 + (id % 80).toInt) +
        (if (hasAudio) aSamples.toLong * (10 + (id % 30).toInt) else 0L)
      assert(bytes == expected, s"box-size arithmetic drift for id=$id")
    }
    // corrupt size fields fail loudly, never wedge or fabricate
    val ok = Multimodal.encodeMp4(3L)
    val overrun = ok.clone()
    overrun(0) = 0x7F.toByte // ftyp size now claims ~2 GB
    intercept[IllegalArgumentException] { Multimodal.parseMp4(overrun) }
    intercept[IllegalArgumentException] {
      Multimodal.parseMp4(java.util.Arrays.copyOfRange(ok, 0, ok.length - 5))
    }
    intercept[IllegalArgumentException] {
      // moov gutted: no mvhd anywhere
      Multimodal.parseMp4(java.util.Arrays.copyOfRange(ok, 0, 24))
    }
    // a real demuxer property: an UNKNOWN leaf box is skipped, not fatal
    val free = Array[Byte](0, 0, 0, 8) ++ "free".getBytes("US-ASCII")
    val withFree = java.util.Arrays.copyOfRange(ok, 0, 24) ++ free ++
      java.util.Arrays.copyOfRange(ok, 24, ok.length)
    val (d1, t1, _) = Multimodal.parseMp4(withFree)
    val (d0, t0, _) = Multimodal.parseMp4(ok)
    assert(d1 == d0 && t1 == t0)
  }

  test("MP4 walker: 64-bit largesize boxes and mvhd version 1 parse like a real demuxer") {
    def be32(v: Long) = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    val ok = Multimodal.encodeMp4(3L)
    val (d0, t0, _) = Multimodal.parseMp4(ok)
    // rewrite the trailing mdat to the largesize form: size=1 marker +
    // 'mdat' + 64-bit size (header grows 8 -> 16 bytes)
    val mdatOff = {
      // mdat is the last top-level box: ftyp.len + moov.len
      var off = 0
      var found = -1
      while (off < ok.length) {
        val sz = ((ok(off) & 0xFFL) << 24) | ((ok(off + 1) & 0xFFL) << 16) |
          ((ok(off + 2) & 0xFFL) << 8) | (ok(off + 3) & 0xFFL)
        if (new String(ok, off + 4, 4, "US-ASCII") == "mdat") found = off
        off += sz.toInt
      }
      found
    }
    assert(mdatOff > 0)
    val payload = java.util.Arrays.copyOfRange(ok, mdatOff + 8, ok.length)
    val large = java.util.Arrays.copyOfRange(ok, 0, mdatOff) ++
      be32(1) ++ "mdat".getBytes("US-ASCII") ++
      be64(16L + payload.length) ++ payload
    val (d2, t2, b2) = Multimodal.parseMp4(large)
    assert(d2 == d0 && t2 == t0 && b2 == large.length.toLong,
      "largesize mdat must parse to identical metadata")
    // minimal tree with a VERSION-1 mvhd (64-bit duration): timescale
    // 1000, duration 5000 ms -> 5,000,000 us
    def box(t: String, body: Array[Byte]*) = {
      val p = body.flatten.toArray
      be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    }
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0),
      be64(0), be64(0), be32(1000), be64(5000),
      be32(0x00010000), Array[Byte](1, 0), new Array[Byte](10),
      new Array[Byte](36), new Array[Byte](24), be32(2))
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1),
      box("avc1", new Array[Byte](78)))
    val stsz = box("stsz", Array[Byte](0, 0, 0, 0), be32(9), be32(7))
    val tree = box("moov", mvhd1,
      box("trak", box("mdia", box("minf", box("stbl", stsd, stsz)))))
    val (d3, t3, _) = Multimodal.parseMp4(tree)
    assert(d3 == 5000000L, s"mvhd v1 duration must read 64-bit: $d3")
    assert(t3 == Seq(Multimodal.Mp4Track("avc1", 7)))
    // a truncated largesize header still fails loudly
    intercept[IllegalArgumentException] {
      Multimodal.parseMp4(java.util.Arrays.copyOfRange(large, 0, mdatOff + 12))
    }
  }

  test("MP4 walker: fragmented layout (moof/tfhd/trun) counts samples, mehd supplies duration") {
    def be32(v: Long) = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(t: String, body: Array[Byte]*) = {
      val p = body.flatten.toArray
      be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    }
    def full(t: String, body: Array[Byte]*) =
      box(t, Array[Byte](0, 0, 0, 0) +: body: _*)
    // DASH/HLS-segment shape: moov declares the track with ZERO stsz
    // samples and a 0 mvhd duration; the samples live in moof fragments
    // and the movie duration in mvex/mehd
    val mvhd = full("mvhd", be32(0), be32(0), be32(1000), be32(0),
      be32(0x00010000), Array[Byte](1, 0), new Array[Byte](10),
      new Array[Byte](36), new Array[Byte](24), be32(2))
    val tkhd = full("tkhd", be32(0), be32(0), be32(1) /* track_ID */,
      be32(0), be32(0), new Array[Byte](60))
    val stsd = full("stsd", be32(1), box("avc1", new Array[Byte](78)))
    val stsz = full("stsz", be32(0), be32(0)) // no unfragmented samples
    val mvex = box("mvex", full("mehd", be32(7200)),
      full("trex", be32(1), be32(1), be32(0), be32(0), be32(0)))
    val moov = box("moov", mvhd, mvex,
      box("trak", tkhd, box("mdia", box("minf", box("stbl", stsd, stsz)))))
    def frag(seq: Int, n: Int) = box("moof", full("mfhd", be32(seq)),
      box("traf", full("tfhd", be32(1)), full("trun", be32(n)))) ++
      box("mdat", new Array[Byte](n * 10))
    val ftyp = box("ftyp", "iso5".getBytes, be32(512), "iso5".getBytes)
    val fmp4 = ftyp ++ moov ++ frag(1, 12) ++ frag(2, 18)
    val (durUs, tracks, bytes) = Multimodal.parseMp4(fmp4)
    assert(durUs == 7200000L, s"mehd must supply the fMP4 duration: $durUs")
    assert(tracks == Seq(Multimodal.Mp4Track("avc1", 30)),
      s"trun sample counts must fold into the moov track: $tracks")
    assert(bytes == fmp4.length.toLong)
    // trun before its tfhd is corrupt, loudly
    val orphanTrun = ftyp ++ moov ++
      box("moof", full("mfhd", be32(1)), box("traf", full("trun", be32(5))))
    intercept[IllegalArgumentException] { Multimodal.parseMp4(orphanTrun) }
    // trun referencing an unknown track_ID is corrupt, loudly
    val wrongTrack = ftyp ++ moov ++ box("moof", full("mfhd", be32(1)),
      box("traf", full("tfhd", be32(99)), full("trun", be32(5))))
    intercept[IllegalArgumentException] { Multimodal.parseMp4(wrongTrack) }
  }

  test("band-index bucket doctrine: corpus-derived default, clamped and restage-friendly") {
    import graft.llmops.Dedup
    // small corpora stay at the parallelism floor
    assert(Dedup.defaultBandBuckets(0) == 16)
    assert(Dedup.defaultBandBuckets(100000) == 16)
    // the target ratio: ~256 MB of 16 B rows per bucket at 32 bands
    // => one bucket per ~500k docs, rounded up to a power of two
    val mid = Dedup.defaultBandBuckets(100000000L) // 100M docs
    assert(mid == 256, s"100M docs should derive bucket[256], got $mid")
    // powers of two only (a restage is an exact occupancy halving)
    for (docs <- Seq(1L, 1000000L, 50000000L, 2000000000L)) {
      val n = Dedup.defaultBandBuckets(docs)
      assert((n & (n - 1)) == 0, s"bucket count must be a power of 2: $n")
    }
    // monotone in corpus size, capped at the 100-TB-scale ceiling
    assert(Dedup.defaultBandBuckets(1000000000L) >=
      Dedup.defaultBandBuckets(100000000L))
    assert(Dedup.defaultBandBuckets(Long.MaxValue / 1000) == 4096)
  }

  test("int8 quantization: degenerate (constant) vectors quantize to zeros, not NaN") {
    val vecs = Seq(
      (1L, Array.fill(8)(0.5f)),              // constant: mx == mn
      (2L, Array.tabulate(8)(_.toFloat)),     // normal ramp
      (3L, Array.fill(8)(0.0f)))              // constant at zero
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(vecs, dim = 8)
      .orderBy("vec_id").collect()
    // constant vectors: checksum 0 (all codes 0), zero reconstruction error
    assert(q(0).getLong(3) == 0L && q(0).getDouble(4) == 0.0)
    assert(q(2).getLong(3) == 0L && q(2).getDouble(4) == 0.0)
    // normal vector still quantizes: nonzero checksum, finite error
    assert(q(1).getLong(3) > 0L && !q(1).getDouble(4).isNaN)
    // nothing in the output is NaN/null
    assert(q.forall(r => !r.anyNull))
  }

  test("multimodal feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.mediaFeatures(docs, partitions = 4).orderBy("doc_id").collect()
    val f2 = Multimodal.mediaFeatures(docs, partitions = 2).orderBy("doc_id").collect()
    assert(f1.sameElements(f2)) // partitioning must not affect results
    assert(f1.forall(_.getAs[Int]("byte_len") > 0))
    assert(f1.forall(_.getAs[String]("digest").length == 64))
    assert(f1.forall { r =>
      val w = r.getAs[Int]("width"); w >= 64 && w < 64 + 577
    })
  }

  test("real PNG decode: ImageIO round-trip recovers exact dimensions and pixel mean") {
    // known text -> deterministic render; verify the DECODE against
    // values computed independently from the source bytes (PNG is
    // lossless for TYPE_INT_RGB, so the pixel mean must be exact)
    val text = "the quick brown fox jumps over the lazy dog"
    val bytes = text.getBytes("UTF-8") // 43 bytes
    val expW = 8 + (bytes.length % 24)
    val expH = 8 + ((bytes.length * 7) % 24)
    val png = Multimodal.encodePng(text)
    // it is a real PNG container
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val (w, h, mean) = Multimodal.decodeImage(png)
    assert(w == expW && h == expH)
    val n = bytes.length
    val expMean = (0 until w * h * 3).map(j => bytes(j % n) & 0xff).sum
      .toDouble / (w * h * 3)
    assert(math.abs(mean - expMean) < 1e-9, s"$mean vs $expMean")
    // the Spark pipeline routes image/* through the real decode
    val feats = Multimodal.extractFeatures(Multimodal.asPngBlobs(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.length == docs.count())
    assert(feats.forall(f => f.width >= 8 && f.width < 32 &&
      f.height >= 8 && f.height < 32))
    assert(feats.map(_.width).distinct.length > 1,
      "degenerate dimensions would mean the decode never ran")
  }

  test("curation clusterDedup: driverUnionFindMax plumbs through; both sides agree") {
    import graft.llmops.Curation
    def run(threshold: Long) =
      Curation.curate(docs, clusterDedup = true,
        driverUnionFindMax = threshold)
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    // threshold=0 forces the distributed label-propagation path; the
    // default takes the driver union-find — identical output required
    val distributed = run(0L)
    val driverSide = run(4000000L)
    assert(distributed == driverSide,
      "cluster dedup must be threshold-invariant")
    assert(distributed.nonEmpty)
    // note: the output is NOT a subset of the un-clustered run — removing
    // near-dups before the span-novelty gate can let formerly-shared docs
    // pass it; only threshold-invariance is the contract here
  }

  test("paragraph dedup: first (doc_id, pos) occurrence wins, doc order restored") {
    // doc 1: B A  (A repeats within the doc at pos 2 — dedups too)
    // doc 2: A C  (A lost to doc 1's pos-1 copy; C survives)
    val a = "a1 a2 a3"; val b = "b1 b2 b3"; val c = "c1 c2 c3"
    val d = Seq(
      (1L, s"$b $a $a"),
      (2L, s"$a $c")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, paraWords = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3))).toMap
    assert(out(1L) == ((3L, 2L, s"$b $a")),
      s"doc 1 must keep B and the FIRST copy of A: ${out(1L)}")
    assert(out(2L) == ((2L, 1L, c)),
      s"doc 2 must lose A to doc 1 and keep C: ${out(2L)}")
    // idempotence: running again over the deduplicated text drops nothing
    val again = Dedup.paragraphDedup(
      out.toSeq.map { case (id, (_, _, t)) => (id, t) }.toDF("doc_id", "text"),
      paraWords = 3)
    assert(again.collect().forall(r => r.getLong(1) == r.getLong(2)),
      "paragraph dedup must be idempotent")
  }

  test("window dedup: overlapping windows excise misaligned duplicated runs") {
    // doc 2 embeds doc 1's 5-word run at offset 1 — NOT aligned to any
    // disjoint segmentation, which is exactly what l35/l49 cannot catch
    // and overlapping windows must; doc 3 repeats a run shorter than the
    // window (survives); doc 4 repeats a run within itself (second copy
    // excised)
    val d = Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "x1 w1 w2 w3 w4 w5 x2"),
      (3L, "w1 w2 w3"),
      (4L, "u1 u2 u3 u4 u1 u2 u3 u4")).toDF("doc_id", "text")
    val out = Dedup.windowDedup(d, windowWords = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((5L, 5L, "w1 w2 w3 w4 w5")),
      s"doc 1 is the first occurrence and keeps everything: ${out(1L)}")
    assert(out(2L) == ((7L, 2L, "x1 x2")),
      s"doc 2 must lose the whole misaligned duplicated run: ${out(2L)}")
    assert(out(3L) == ((3L, 3L, "w1 w2 w3")),
      s"sub-window repeats survive: ${out(3L)}")
    assert(out(4L) == ((8L, 4L, "u1 u2 u3 u4")),
      s"within-doc repeats excise the later copy: ${out(4L)}")
    // idempotence: a second pass over the cleaned text removes nothing
    val again = Dedup.windowDedup(
      out.toSeq.map { case (id, (_, _, t)) => (id, t) }.toDF("doc_id", "text"),
      windowWords = 4)
    assert(again.collect().forall(r => r.getLong(1) == r.getLong(2)),
      "window dedup must be idempotent")
  }

  test("window dedup: hashed-key scale path is output-identical to string keys") {
    def rows(hashKeys: Boolean) =
      Dedup.windowDedup(docs, windowWords = 8, hashKeys = hashKeys)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    assert(rows(hashKeys = true) == rows(hashKeys = false),
      "8-byte window keys must select the same winners as string keys")
  }

  test("window dedup matches a brute-force model on randomized colliding corpora") {
    // tiny vocabulary + short docs force heavy window collisions (the
    // regime where winner selection, coverage union, and within-doc
    // repeats all interact); the model recomputes the semantics
    // driver-side from the definition
    def model(corpus: Seq[(Long, String)], k: Int)
        : Map[Long, (Long, Long, String)] = {
      val wins = for {
        (id, t) <- corpus
        ws = t.split(" ", -1)
        if ws.length >= k
        p <- 0 to ws.length - k
      } yield ((id, p), ws.slice(p, p + k).mkString(" "))
      val firstAt = wins.groupBy(_._2)
        .map { case (w, occ) => (w, occ.map(_._1).min) }
      val covered: Set[(Long, Int)] = wins.flatMap { case ((id, p), w) =>
        if (firstAt(w) == ((id, p))) Nil
        else (p until p + k).map(q => (id, q))
      }.toSet
      corpus.map { case (id, t) =>
        val ws = t.split(" ", -1)
        val kept = ws.zipWithIndex.collect {
          case (w, i) if !covered((id, i)) => w
        }
        id -> ((ws.length.toLong, kept.length.toLong, kept.mkString(" ")))
      }.toMap
    }
    val vocab = Array("a", "b", "c")
    (0 until 10).foreach { trial =>
      val rnd = new scala.util.Random(42L + trial)
      val corpus = (1L to (5 + rnd.nextInt(10)).toLong).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(3))).mkString(" ")
      }
      val got = Dedup.windowDedup(corpus.toDF("doc_id", "text"), windowWords = 3)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(got == model(corpus, 3),
        s"trial $trial diverged from the model on corpus $corpus")
    }
  }

  test("containment pairs surface near-supersets that Jaccard dilutes away") {
    // doc 2 = doc 1 + a large boilerplate wrapper: the union grows with
    // the wrapper so Jaccard falls under 0.5, while the smaller doc's
    // shingles are fully contained
    val core = (1 to 20).map(i => s"c$i").mkString(" ")
    val wrap = (1 to 60).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, core), (2L, s"$wrap $core"), (3L, "x1 x2 x3 x4"))
      .toDF("doc_id", "text")
    val j = Dedup.ngramJaccardPairs(d, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((1L, 2L)),
      "the wrapper must dilute Jaccard under threshold for this pin to mean anything")
    val c = Dedup.containmentPairs(d, 3, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(c.contains((1L, 2L)),
      s"full containment must surface the near-superset pair: $c")
    assert(c((1L, 2L)) >= 0.99, s"doc 1 is wholly contained: ${c((1L, 2L))}")
    assert(!c.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated docs must not pair")
  }

  test("HLL cardinality sketches: merged estimate within tolerance, exact counts consistent") {
    val out = TextOps.cardinalitySketch(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out.contains("__all__"), "must include the merged corpus row")
    assert(out.forall(_._2._2),
      s"every estimate (per-source AND merged) must sit within tolerance: " +
        out.filterNot(_._2._2).keys.mkString(", "))
    // the corpus vocabulary is at least any source's and at most the sum
    val perSrc = (out - "__all__").values.map(_._1)
    assert(out("__all__")._1 >= perSrc.max && out("__all__")._1 <= perSrc.sum)
    // determinism: sketches and exacts reproduce bit-identically
    val again = TextOps.cardinalitySketch(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(again == out)
  }

  test("min-k aggregator: bounded buffers reproduce sorted.take(k) under any split") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(500)(rnd.nextLong() % 1000)
    for (k <- Seq(1, 7, 100, 600)) {
      val agg = new graft.functions.MinKAgg(k)
      // fold through reduce in several chunk shapes, then merge pairwise
      val chunks = xs.grouped(37).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      chunks.foreach(c => assert(c.length <= k, "buffer must stay bounded"))
      val merged = chunks.reduce(agg.merge)
      assert(agg.finish(merged) == xs.sorted.take(k).toSeq,
        s"k=$k must equal the exact k-smallest")
    }
  }

  test("domain quota: per-source cap holds and equals the window-form reference") {
    val out = TextOps.domainQuota(docs, 5).cache()
    val perSrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc.values.forall(_ <= 5), s"quota exceeded: $perSrc")
    // sources smaller than the quota keep everything
    val srcTotals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    srcTotals.foreach { case (s, n) =>
      assert(perSrc.getOrElse(s, 0L) == math.min(n, 5L), s"source $s") }
    // the kept set must be EXACTLY the window-form answer under the
    // (priority, doc_id) total order
    import org.apache.spark.sql.expressions.Window
    val ref = docs.select(col("doc_id"), col("source"),
        ((col("doc_id") * lit(2654435761L)) % lit(4294967296L)).as("priority"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("priority", "doc_id")))
      .filter(col("rn") <= 5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == ref)
  }

  test("incremental near-dedup: planted near-copies match their originals, fresh docs pass") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") < 100)
    // near-copies: one appended token — shingle-Jaccard ~0.9 at typical
    // lengths, well above the 0.6 signature-agreement threshold
    val nearCopies = corpus.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 5000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"))
    val fresh = d.filter(col("doc_id") >= 400 && col("doc_id") < 430)
    val incSigs = Dedup.minHashSignatures(nearCopies.union(fresh))
    val out = Dedup.incrementalNearDedup(incSigs,
      Dedup.minHashSignatures(corpus)).cache()
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getBoolean(3)))).toMap
    // every incoming doc got exactly one verdict row
    assert(rows.size == out.count() &&
      rows.size == nearCopies.count() + fresh.count())
    // every planted near-copy is absorbed, matched to its own original
    nearCopies.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val (m, isNew) = rows(id)
      assert(!isNew && m.contains(id - 5000L),
        s"near-copy $id should match ${id - 5000L}, got $m")
    }
    // fresh docs (no corpus relative) pass as new
    val freshIds = fresh.select("doc_id").collect().map(_.getLong(0))
    val newCount = freshIds.count(id => rows(id)._2)
    assert(newCount == freshIds.length,
      s"fresh docs must be new: $newCount/${freshIds.length}")
  }

  test("incremental near-dedup matches a brute-force model on randomized corpora") {
    // model: given the (collected) signatures, candidates are pairs
    // sharing any full band slice; est = matching components / 64; keep
    // the best corpus match (max est, min id on ties) at est >= 0.6 —
    // exactly the operator's contract, executed naively driver-side
    def model(inc: Map[Long, Seq[Long]], cor: Map[Long, Seq[Long]])
        : Map[Long, Option[(Long, Double)]] = {
      def bands(sig: Seq[Long]) = (0 until 32).map(b => (b, sig.slice(b * 2, b * 2 + 2)))
      val corBands = cor.toSeq.flatMap { case (id, s) =>
        bands(s).map { case (b, sl) => (b, sl) -> id } }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      inc.map { case (id, s) =>
        val cands = bands(s).flatMap(corBands.getOrElse(_, Nil)).distinct
        val scored = cands.map { cid =>
          val est = s.zip(cor(cid)).count { case (a, b) => a == b } / 64.0
          (cid, est)
        }.filter(_._2 >= 0.6)
        id -> (if (scored.isEmpty) None
               else Some(scored.minBy { case (cid, est) => (-est, cid) }))
      }
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val vocab = (1 to 30).map(i => s"w$i") // small vocab: accidental overlap
      def doc() = Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val corpus = (0L until 25L).map(i => (i, doc()))
      val incoming = (100L until 115L).map(i => (i, doc())) ++
        corpus.filter(_._1 % 4 == 0).map { case (i, t) => (i + 500, t + " zz") }
      val corSigs = Dedup.minHashSignatures(corpus.toDF("doc_id", "text"))
      val incDf = incoming.toDF("doc_id", "text")
      val incSigs = Dedup.minHashSignatures(incDf.repartition(1 + trial))
      val got = Dedup.incrementalNearDedup(incSigs, corSigs)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
        .toMap
      def sigsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val want = model(sigsOf(incSigs), sigsOf(corSigs)).map {
        case (k, v) => k -> v.map { case (id, est) =>
          (id, math.rint((est + 1e-9) * 10000) / 10000) }
      }
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("domain quota: colliding priorities past 2^32 ids keep exactly the quota") {
    // ids differing by 2^32 collide in the 32-bit permutation: all 12
    // docs here map to just 4 distinct priorities, with the quota-th
    // smallest pair landing INSIDE a collision class — the case where a
    // key-only cutoff (priority <= cut) would keep more than the quota
    val base = Seq(0L, 1L, 2L, 3L)
    val ids = base.flatMap(i => Seq(i, i + (1L << 32), i + (2L << 32)))
    val d = ids.map(i => (i, "src")).toDF("doc_id", "source")
    val out = TextOps.domainQuota(d, 5).cache()
    assert(out.count() == 5, "exactly the quota must survive")
    // and the survivors are the lexicographic min-5 by (priority, doc_id)
    val prio = (i: Long) => java.lang.Math.floorMod(i * 2654435761L, 1L << 32)
    val expect = ids.sortBy(i => (prio(i), i)).take(5).toSet
    assert(out.collect().map(_.getLong(0)).toSet == expect)
    // determinism across partitionings: single-partition answer identical
    val one = TextOps.domainQuota(d.repartition(1), 5)
      .collect().map(_.getLong(0)).toSet
    assert(one == expect)
  }

  test("bigram cross-entropy: repeated transitions score lower than scrambled text") {
    import spark.implicits._
    // corpus: many docs repeating the same transitions + one scrambled doc
    val fluent = (1L to 30L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val salad = Seq((99L, "dog the over quick lazy jumps brown the fox"))
    val d = (fluent ++ salad).toDF("doc_id", "text")
    val out = TextOps.bigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == (fluent ++ salad).map(_._1).toSet)
    assert(out(1L)._1 == 8L, "9 tokens -> 8 bigrams")
    // same unigram bag, different transitions: the salad doc must pay
    assert(out(99L)._2 > out(1L)._2 + 1.0,
      s"scrambled ${out(99L)._2} vs fluent ${out(1L)._2}")
    // determinism
    val again = TextOps.bigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(again == out)
  }

  test("G.711 transcode round-trip: real ulaw/alaw codec, pinned RMS constants") {
    // the l60 oracle's constants come from the public G.711 quantization
    // tables via the JDK codec; re-derive a sample here so oracle drift
    // fails loudly in the spec tier, independently of the driver gate
    val ulaw = Map(0 -> 988.0, 1 -> 1500.0, 10 -> 5884.0, 28 -> 14972.0)
    val alaw = Map(0 -> 1008.0, 1 -> 1504.0, 10 -> 6016.0, 28 -> 15104.0)
    for ((k, expect) <- ulaw) {
      val pcm = Multimodal.encodeWav(k.toLong)
      val blob = Multimodal.transcodeG711(pcm, aLaw = false)
      // 8-bit stream: compressed payload is half the PCM16 payload
      assert(blob.length < pcm.length * 3 / 4,
        s"ulaw blob ${blob.length} vs pcm ${pcm.length}")
      val (codec, sr, ch, frames, rms) = Multimodal.decodeAudio(blob)
      assert(codec == "ULAW" && sr == 8000 && ch == 1)
      assert(frames == 400 + (k % 97) * 8)
      assert(rms == expect, s"ulaw k=$k: $rms != $expect")
    }
    for ((k, expect) <- alaw) {
      val blob = Multimodal.transcodeG711(Multimodal.encodeWav(k.toLong),
        aLaw = true)
      val (codec, _, _, _, rms) = Multimodal.decodeAudio(blob)
      assert(codec == "ALAW" && rms == expect, s"alaw k=$k: $rms != $expect")
    }
    // plain PCM still decodes through the same entry point
    val (codec, sr, ch, frames, rms) =
      Multimodal.decodeAudio(Multimodal.encodeWav(3L))
    assert(codec == "PCM_SIGNED" && sr == 8000 && ch == 1 &&
      frames == 424 && rms == 2500.0)
  }

  test("URL canonicalization: case, www, default ports, tracking, order, slash") {
    import spark.implicits._
    def canon(u: String): String =
      Seq(u).toDF("u")
        .select(TextOps.canonicalizeUrl(org.apache.spark.sql.functions.col("u")))
        .collect()(0).getString(0)
    // scheme+host lowercase, www. stripped, default port dropped,
    // fragment dropped, tracking params dropped, trailing slash stripped
    assert(canon("HTTPS://WWW.News.Example.COM:443/a/b/?utm_source=x&id=3#frag")
      == "https://news.example.com/a/b?id=3")
    // non-default port survives; path case is identity (paths are
    // case-sensitive, unlike hosts)
    assert(canon("http://Example.com:8080/A/B?b=2&a=1")
      == "http://example.com:8080/A/B?a=2&b=1".replace("a=2&b=1", "a=1&b=2"))
    // param sort is the canonical order
    assert(canon("http://e.com/p?b=2&a=1") == canon("http://e.com/p?a=1&b=2"))
    // empty path normalizes to /
    assert(canon("https://e.com") == "https://e.com/")
    assert(canon("https://e.com?x=1") == "https://e.com/?x=1")
    // all-tracking query vanishes entirely (no dangling '?')
    assert(canon("https://e.com/p?utm_campaign=a&fbclid=zz") == "https://e.com/p")
    // http on 443 is NOT a default: kept
    assert(canon("http://e.com:443/p") == "http://e.com:443/p")
    // repeated www. strips fully (idempotence: canon(canon(u)) == canon(u))
    assert(canon("https://www.www.e.com/p") == "https://e.com/p")
    // no scheme => not an absolute URL => conservative passthrough
    assert(canon("  example.com/x?utm_source=a ") == "example.com/x?utm_source=a")
    // a '?' INSIDE the fragment is fragment content, not a query (RFC
    // 3986: query ends where the fragment starts) — both must collapse
    // to the bare path, not invent a ?x=1 query
    assert(canon("https://e.com/p#sec?x=1") == "https://e.com/p")
    assert(canon("https://e.com/p#sec?x=1") == canon("https://e.com/p"))
    // and a real query followed by a fragment with a '?' keeps only the
    // real query
    assert(canon("https://e.com/p?a=1#sec?x=2") == "https://e.com/p?a=1")

    // dedup collapses variants to one row, keeps min doc_id
    val d = Seq(
      (10L, "https://www.E.com/p?utm_source=a&x=1"),
      (7L, "HTTPS://e.COM:443/p/?x=1"),
      (9L, "https://other.com/p?x=1")).toDF("doc_id", "url")
    val out = TextOps.urlDedup(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("https://e.com/p?x=1", 7L, 2L),
      ("https://other.com/p?x=1", 9L, 1L)))
  }

  test("URL canonicalization: idempotent and junk-invariant over an exhaustive grid") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val schemes = Seq("http", "HTTPS", "https")
    val hosts = Seq("news.example.com", "WWW.E.COM", "www.www.a-b.org")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/a/b/", "/A/9")
    val queries = Seq("", "?a=1&b=2", "?b=2&a=1", "?id=9")
    val urls = for (s <- schemes; h <- hosts; p <- ports; pa <- paths;
      q <- queries) yield s + "://" + h + p + pa + q
    // the same URL with tracking params and a fragment bolted on must
    // canonicalize identically (the whole point of stripping them)
    val junked = urls.map { u =>
      val sep = if (u.contains("?")) "&" else "?"
      u + sep + "utm_source=x&fbclid=1#frag"
    }
    val rows = urls.zip(junked).toDF("u", "uj")
      .select(TextOps.canonicalizeUrl(col("u")).as("c"),
        TextOps.canonicalizeUrl(col("uj")).as("cj"))
      .select(col("c"), col("cj"),
        TextOps.canonicalizeUrl(col("c")).as("cc"))
      .collect()
    assert(rows.length == urls.length)
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(2),
        s"not idempotent: ${r.getString(0)} -> ${r.getString(2)}")
      assert(r.getString(0) == r.getString(1),
        s"tracking/fragment junk changed identity: ${r.getString(0)} vs ${r.getString(1)}")
    }
    // param order is not identity: the ?a=1&b=2 / ?b=2&a=1 variants halve
    // the distinct canonical count relative to the raw url count
    val canon = rows.map(_.getString(0)).toSet
    val rawDistinct = urls.toSet.size
    assert(canon.size < rawDistinct,
      s"canonicalization collapsed nothing: ${canon.size} vs $rawDistinct")
  }

  test("markup strip: blocks, tags, entity order, whitespace collapse") {
    import spark.implicits._
    def strip(h: String): String =
      Seq(h).toDF("h")
        .select(TextOps.stripMarkup(org.apache.spark.sql.functions.col("h")))
        .collect()(0).getString(0)
    assert(strip("<html><head><script>var a='<p>not text</p>';</script>" +
      "<style>.x{}</style></head><body><!-- c --><p>Hello,\n  world!</p>" +
      "</body></html>") == "Hello, world!")
    // script content spanning lines dies ((?s)); attributes in tags die
    assert(strip("<script type=\"x\">\nline1\nline2\n</script>ok") == "ok")
    // entity decode: &amp; LAST, so &amp;lt; means the LITERAL string
    // "&lt;" and must not double-decode into '<'
    assert(strip("a &amp;lt; b &lt; c &amp; d") == "a &lt; b < c & d")
    assert(strip("say &quot;hi&#39;s&quot;&nbsp;now") == "say \"hi's\" now")
  }

  test("markup strip: quoted '>' in attributes, CDATA content, plain-text inequalities") {
    import spark.implicits._
    def strip(h: String): String =
      Seq(h).toDF("h")
        .select(TextOps.stripMarkup(org.apache.spark.sql.functions.col("h")))
        .collect()(0).getString(0)
    // a quoted attribute value may contain '>': the tag must be consumed
    // whole, never truncated at the first '>' (which leaked `b">` into
    // the text before the r13 hardening)
    assert(strip("<a title=\"a>b\">text</a>") == "text")
    assert(strip("<a href='x>y' id=\"z>w\">t</a>") == "t")
    // script openers get the same treatment
    assert(strip("<script data-x=\"a>b\">var y;</script>ok") == "ok")
    // CDATA is character data: content survives, wrapper dies
    assert(strip("<p><![CDATA[raw 2 < 3 text]]></p>") == "raw 2 < 3 text")
    // plain-text inequalities are NOT tags (a tag opens with /!? or a
    // letter)
    assert(strip("x < y and p > q") == "x < y and p > q")
    assert(strip("5 <6> 7") == "5 <6> 7")
    // documented non-idempotence: entity decoding may REINTRODUCE
    // markup-shaped text, exactly as a browser renders `&lt;b&gt;`;
    // re-stripping the output is out of contract
    assert(strip("&lt;b&gt;bold&lt;/b&gt;") == "<b>bold</b>")
  }
}
