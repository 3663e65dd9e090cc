package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** Probe the shingle document-frequency distribution of a documents
  * table at a given scale: the auto-derived cap ([[Dedup.autoShingleCap]]),
  * the df tail, and the capped join's candidate-pair mass
  * `sum(df^2) over df <= cap` — the number that decides whether the
  * shingle self-join fits a given shuffle budget. */
object ShingleDfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val sh = docs.filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(split(col("text"), " ")) - 2),
        i => xxhash64(concat_ws("_",
          slice(split(col("text"), " "), i, lit(3)))))).as("g"))
      .distinct()
    val dfs = sh.groupBy("g").agg(count(lit(1)).as("df")).cache()
    val cap = Dedup.autoShingleCap(dfs)
    val stats = dfs.agg(
      count(lit(1)).as("shingles"), max("df").as("max_df"),
      sum(when(col("df") <= cap, col("df") * col("df")).otherwise(0L)).as("pair_mass_capped"),
      sum(when(col("df") <= 10, col("df") * col("df")).otherwise(0L)).as("pair_mass_10"),
      sum(col("df") * col("df")).as("pair_mass_all")).collect()(0)
    println(s"[dfprobe] dir=$dir docs=$n autoCap=$cap shingles=${stats.getLong(0)} " +
      s"maxDf=${stats.getLong(1)} pairMassCapped=${stats.getLong(2)} " +
      s"pairMass10=${stats.getLong(3)} pairMassAll=${stats.getLong(4)}")
    spark.stop()
  }
}
