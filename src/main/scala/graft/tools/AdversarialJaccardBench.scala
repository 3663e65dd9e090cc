package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** Measures l18's (capped / stop-shingle Jaccard) asymptotic win over the
  * uncapped exact join on an ADVERSARIAL power-law shingle corpus — the
  * distribution real scraped corpora have (boilerplate n-grams appear in
  * nearly every document).
  *
  * The uncapped shingle self-join fans out quadratically on each hot
  * shingle (df ≈ N ⇒ N²/2 joined rows PER boilerplate shingle); dropping
  * shingles with df > cap removes exactly those, leaving the join linear
  * in the number of genuinely-shared rare shingles. At the driver's
  * uniform sf0.1 distribution the df pass roughly offsets the win
  * (documented in BASELINE.md); this main demonstrates the regime the cap
  * exists for.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AdversarialJaccardBench"
  * Prints one JSON line; numbers are recorded in BASELINE.md.
  */
object AdversarialJaccardBench {

  def corpus(spark: SparkSession, nDocs: Int, seed: Long = 42L) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // 12 boilerplate words -> 10 hot 3-gram shingles with df = nDocs
    val boiler = "terms of service apply all rights reserved contact us for more information"
    val rows = (0 until nDocs).map { i =>
      // planted near-dups: docs (2i, 2i+1) for i < 50 share all but the
      // last 5 of their 40 unique words
      val base = i / 2
      val isPlanted = i < 100
      val words =
        if (isPlanted)
          (0 until 35).map(j => s"w${base}_$j") ++
            (35 until 40).map(j => s"w${i}_$j")
        else (0 until 40).map(j => s"w${i}_${j}_${rnd.nextInt(1000)}")
      (i.toLong, words.mkString(" ") + " " + boiler)
    }
    rows.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-adversarial-jaccard")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = args.headOption.map(_.toInt).getOrElse(10000)
    val docs = corpus(spark, nDocs).cache()
    docs.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm the JVM/codegen on a slice so both timed runs are comparable
    Dedup.ngramJaccardPairs(docs.limit(200), n = 3, threshold = 0.3).count()

    val (nCapped, tCapped) = time(
      Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3,
        maxShingleFreq = Some(100)).count())
    // the r12 DEFAULT plan: cap auto-derived from the df distribution
    val (nAuto, tAuto) = time(
      Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3).count())
    val (nUncapped, tUncapped) = time(
      Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3,
        exact = true).count())

    // every plan — including the auto-capped default — must find every
    // planted pair (the cap only drops boilerplate, which contributes no
    // qualifying pair at this threshold)
    def plantedIn(df: org.apache.spark.sql.DataFrame): Long = df
      .filter(col("b") === col("a") + 1 && col("a") % 2 === 0 && col("a") < 100)
      .count()
    val planted = plantedIn(Dedup.ngramJaccardPairs(docs, n = 3,
      threshold = 0.3, maxShingleFreq = Some(100)))
    val plantedAuto = plantedIn(Dedup.ngramJaccardPairs(docs, n = 3,
      threshold = 0.3))

    println(s"""{"metric":"adversarial_jaccard","n_docs":$nDocs,""" +
      s""""uncapped_sec":${f"$tUncapped%.2f"},"capped_sec":${f"$tCapped%.2f"},""" +
      s""""auto_capped_sec":${f"$tAuto%.2f"},""" +
      s""""speedup":${f"${tUncapped / tCapped}%.1f"},""" +
      s""""pairs_uncapped":$nUncapped,"pairs_capped":$nCapped,""" +
      s""""pairs_auto":$nAuto,"planted_found":$planted,""" +
      s""""planted_found_auto":$plantedAuto}""")
    spark.stop()
  }
}
