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
