package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeWordEncoder
import graft.llmops.Bpe

/** Semantics pins for the learned BPE trainer/tokenizer (l61/l62):
  * hand-computed merges, reconstruction, leftmost-non-overlapping merge
  * application, code-point seeding, batched-training exactness, and the
  * monotone token-count property. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("trainer reproduces hand-computed merges with deterministic tie-breaks") {
    // corpus: ab x3, ac x1 → pair (a,b)=3 wins, then (a,c)=1
    val d = docsOf("ab ab ab ac")
    val m = Bpe.trainMerges(d, numMerges = 2)
    assert(m.map(x => (x.rank, x.left, x.right, x.freq)) ==
      Seq((1, "a", "b", 3L), (2, "a", "c", 1L)))
  }

  test("tie on frequency breaks by (left, right) ascending") {
    // xy and xz both appear twice → (x,y) < (x,z)
    val d = docsOf("xy xz xy xz")
    val m = Bpe.trainMerges(d, numMerges = 1)
    assert(m.head.left == "x" && m.head.right == "y" && m.head.freq == 2L)
  }

  test("trainer stops when pairs are exhausted") {
    val d = docsOf("ab ab") // one merge fully collapses the vocabulary
    val m = Bpe.trainMerges(d, numMerges = 10)
    assert(m.size == 1 && m.head.left == "a" && m.head.right == "b")
  }

  test("merged symbols feed later merges (multi-level vocabulary)") {
    val d = docsOf(Seq.fill(5)("abab").mkString(" "))
    val m = Bpe.trainMerges(d, numMerges = 3)
    // (a,b) -> ab, then (ab,ab) -> abab
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b"), ("ab", "ab")))
  }

  test("encoder applies merges leftmost non-overlapping") {
    val enc = new BpeWordEncoder(Array(("a", "a")))
    assert(enc.encodeToSym("aaa").split(Bpe.Sep + Bpe.Sep).drop(1).toSeq == Seq("aa", "a"))
    val enc2 = new BpeWordEncoder(Array(("a", "a"), ("aa", "aa")))
    assert(enc2.encodeToSym("aaaa").split(Bpe.Sep + Bpe.Sep).drop(1).toSeq == Seq("aaaa"))
  }

  test("encoder seeds by code point, not UTF-16 code unit") {
    val enc = new BpeWordEncoder(Array.empty)
    val toks = enc.encodeToSym("a😀b").split(Bpe.Sep + Bpe.Sep).drop(1).toSeq
    assert(toks == Seq("a", "😀", "b")) // emoji is ONE seed symbol
  }

  test("tokens concatenate back to the word (reconstruction)") {
    val d = docsOf("table batch merge part value fast row hash " +
      "table batch merge table batch")
    val merges = Bpe.trainMerges(d, numMerges = 8)
    val enc = new BpeWordEncoder(merges.map(m => (m.left, m.right)).toArray)
    for (w <- Seq("table", "batch", "merge", "part", "value", "untrained"))
      assert(enc.encodeToSym(w).split(Bpe.Sep + Bpe.Sep).drop(1).mkString == w)
  }

  test("token count is monotone non-increasing in the merge prefix") {
    val d = docsOf("stream stretch string strong strap stream string stream")
    val merges = Bpe.trainMerges(d, numMerges = 10)
    for (w <- Seq("stream", "stretch", "strongest", "zebra")) {
      val counts = (0 to merges.size).map { k =>
        new BpeWordEncoder(merges.take(k).map(m => (m.left, m.right)).toArray)
          .encodeToSym(w).split(Bpe.Sep + Bpe.Sep).drop(1).length
      }
      assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
        s"$w: $counts")
    }
  }

  test("batched training equals sequential when top pairs are disjoint") {
    // four disjoint-alphabet words with well-separated frequencies
    val text = (Seq.fill(16)("ab") ++ Seq.fill(8)("cd") ++
      Seq.fill(4)("ef") ++ Seq.fill(2)("gh")).mkString(" ")
    val d = docsOf(text)
    val seq = Bpe.trainMerges(d, numMerges = 4, batch = 1)
    val bat = Bpe.trainMerges(d, numMerges = 4, batch = 4)
    assert(bat == seq)
    assert(bat.map(_.freq) == Seq(16L, 8L, 4L, 2L))
  }

  test("batched training skips conflicting pairs within one pass") {
    // (a,b) and (b,c) conflict on b: one pass must not pick both
    val d = docsOf(Seq.fill(4)("abc").mkString(" "))
    val bat = Bpe.trainMerges(d, numMerges = 2, batch = 2)
    assert(bat.head.left == "a" && bat.head.right == "b")
    // second merge learned in a LATER pass, over the post-merge counts
    assert(bat(1).left == "ab" && bat(1).right == "c")
  }

  test("graft_bpe expression tokenizes under whole-stage codegen") {
    graft.functions.GraftFunctions.register(spark)
    val d = docsOf("interleave internet interval")
    val merges = Bpe.trainMerges(d, numMerges = 4)
    val out = d.select(explode(split(col("text"), " ")).as("w"))
      .select(col("w"), Bpe.bpeTokens(col("w"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for ((w, toks) <- out) {
      assert(toks.mkString == w)
      val ref = new BpeWordEncoder(merges.map(m => (m.left, m.right)).toArray)
        .encodeToSym(w).split(Bpe.Sep + Bpe.Sep).drop(1).toSeq
      assert(toks == ref)
    }
  }

  /** Independent in-memory CLASSIC BPE: pair counting and greedy
    * leftmost non-overlapping merging directly in SYMBOL space (lists of
    * strings), sharing NO representation with the engine's
    * separator-string encoding — the cross-check that catches
    * representation bugs (an earlier single-separator encoding missed
    * every second in-word occurrence and only a symbol-space reference
    * exposes that class). */
  private def referenceBpe(wordFreq: Map[String, Long],
      numMerges: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp))) -> f
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.size < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val maxC = counts.values.max
        // .toSeq first: collect on a Map whose result is a pair REBUILDS
        // a Map, so two max-count candidates sharing a left symbol would
        // collide on the key and one would silently vanish
        val (l, r) = counts.toSeq.collect { case (p, c) if c == maxC => p }.min
        out += ((l, r, maxC))
        words = words.toSeq.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2 // greedy leftmost, non-overlapping
            } else { b += syms(i); i += 1 }
          }
          b.result() -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("fuzz: distributed trainer matches the symbol-space reference on random corpora") {
    val rnd = new scala.util.Random(20260816L)
    for (seed <- 1 to 15) {
      val alphabet = "abcd".take(2 + rnd.nextInt(3))
      val nWords = 3 + rnd.nextInt(8)
      val vocab = Seq.fill(nWords)(
        (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val freqs = vocab.map(_ => 1 + rnd.nextInt(9))
      val text = vocab.zip(freqs).flatMap { case (w, f) => Seq.fill(f)(w) }
        .mkString(" ")
      val n = 1 + rnd.nextInt(6)
      val got = Bpe.trainMerges(docsOf(text), numMerges = n)
        .map(m => (m.left, m.right, m.freq))
      val want = referenceBpe(
        vocab.zip(freqs.map(_.toLong)).groupMapReduce(_._1)(_._2)(_ + _), n)
      assert(got == want, s"seed=$seed corpus='$text' n=$n")
      // and the encoder reproduces the reference segmentation per word
      val enc = new BpeWordEncoder(got.map(m => (m._1, m._2)).toArray)
      for (w <- vocab.distinct) {
        val refSeg = {
          var syms = w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
          for ((l, r, _) <- want) {
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += syms(i); i += 1 }
            }
            syms = b.result()
          }
          syms
        }
        assert(enc.encodeToSym(w).split(Bpe.Sep + Bpe.Sep).drop(1).toSeq == refSeg,
          s"seed=$seed word=$w")
      }
    }
  }

  test("depth-300 batched training: checkpoint flushes preserve the exact merge sequence") {
    // exercises the machinery no shallow test reaches: localCheckpoint
    // lineage truncation (checkpointEvery = 64 -> 4+ flushes at depth
    // 300), freed-generation bookkeeping, and conflict-filtered batch
    // picks at depth. Oracle = the identical run that NEVER flushes
    // (checkpointEvery = 1000): checkpointing is a materialization
    // strategy and must be sequence-invisible.
    val rnd = new scala.util.Random(41)
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    val vocab = (0 until 1500).map { _ =>
      val len = 5 + rnd.nextInt(8)
      (0 until len).map(_ => alphabet(rnd.nextInt(26))).mkString
    }
    val corpus = vocab.zipWithIndex
      .map { case (w, i) => Seq.fill(1 + (i % 7))(w).mkString(" ") }
      .mkString(" ")
    val docs = docsOf(corpus)
    val flushed = Bpe.trainMerges(docs, numMerges = 300, batch = 8,
      checkpointEvery = 64).map(m => (m.rank, m.left, m.right, m.freq))
    assert(flushed.size == 300, s"corpus too small: ${flushed.size} merges")
    val never = Bpe.trainMerges(docs, numMerges = 300, batch = 8,
      checkpointEvery = 1000).map(m => (m.rank, m.left, m.right, m.freq))
    assert(flushed == never,
      "checkpoint flushes must not change a single merge")
    // depth survives into application: deep-vocab encoding round-trips
    val enc = new BpeWordEncoder(flushed.map(m => (m._2, m._3)).toArray)
    assert(vocab.distinct.forall(w =>
      enc.encodeToSym(w).split(Bpe.Sep + Bpe.Sep).drop(1).mkString == w))
  }

  test("docTokenCounts matches a per-doc reference on the real corpus") {
    val d = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val merges = Bpe.trainMerges(d, numMerges = 8)
    val enc = new BpeWordEncoder(merges.map(m => (m.left, m.right)).toArray)
    val got = Bpe.docTokenCounts(d, merges).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val ref = d.collect().map { r =>
      val words = r.getString(1).split(" ").filter(_.nonEmpty)
      val ntok = words.map(w =>
        enc.encodeToSym(w).split(Bpe.Sep + Bpe.Sep).drop(1).length.toLong).sum
      (r.getLong(0), (words.length.toLong, ntok))
    }.toMap
    assert(got == ref)
    // and the merge list genuinely compresses: fewer tokens than chars
    val chars = ref.values.map(_._2).sum
    val seeded = d.collect().map(_.getString(1).count(_ != ' ').toLong).sum
    assert(chars < seeded, "16 merges should compress the corpus")
  }
}
