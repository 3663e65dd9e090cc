package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** One-off safety probe for the s9 streaming near-dedup oracle: the
  * oracle assumes that at the signature-agreement threshold (0.6), the
  * ONLY cross-chunk matches in a doc_id-range-chunked `documents` stream
  * are the stream's own planted copies — i.e. every est>=0.6 pair among
  * ORIGINAL documents is within one chunk (the testdata generator plants
  * dup pairs at adjacent ids). Prints the offending cross-chunk pairs
  * per scale/chunking; empty output = the oracle's assumption holds. */
object ChunkIsolationCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"); chunks <- Seq(4)) {
      val docs = graft.Tables.t(spark, sf, "documents")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val per = math.ceil(n.toDouble / chunks).toLong
      val sigs = Dedup.minHashSignatures(docs).cache()
      // all est>=0.6 pairs among originals via the same machinery s9 uses
      val verd = Dedup.incrementalNearDedup(sigs, sigs)
        .filter(!col("is_new") && col("match_id") =!= col("doc_id"))
      val cross = verd
        .withColumn("ca", floor(col("doc_id") / per))
        .withColumn("cb", floor(col("match_id") / per))
        .filter(col("ca") =!= col("cb"))
      val bad = cross.collect()
      println(s"[chunkcheck] sf=$sf chunks=$chunks docs=$n crossPairs=${bad.length}")
      bad.take(20).foreach(r => println(s"[chunkcheck]   $r"))
      sigs.unpersist()
    }
    spark.stop()
  }
}
