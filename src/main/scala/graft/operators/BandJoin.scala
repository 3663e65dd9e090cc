package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval (band) join: equi-keys plus
  * `right.ts ∈ (left.ts, left.ts + band]`.
  *
  * The naive formulation — equi-join on the keys with the band as a join
  * filter — leaves the pair-space per key quadratic: one power-law user
  * with k events builds k² candidate pairs in a single task regardless of
  * how far apart in time they are. Bucketing by `band`-wide time windows
  * makes time part of the JOIN KEY: a qualifying pair's right row lands in
  * the left row's own bucket or the next one, so the left side explodes
  * into exactly those two candidate buckets and joins on
  * `(keys…, bucket)`. Per-task pair-space is then bounded by per-(key,
  * bucket) occupancy — time-local, not lifetime-quadratic — and each
  * qualifying pair meets exactly once (the right row's bucket is unique),
  * so no dedup pass is needed. The exact band predicate still filters the
  * in-bucket candidates, keeping results identical to the naive join.
  */
object BandJoin {

  /** Pairs (left, right) sharing `keys` with
    * `rightTs ∈ (leftTs, leftTs + bandSeconds]`, timestamps compared at
    * second precision. Output carries the left row's columns and the
    * right row's columns suffixed by `rightSuffix` for collision-free
    * selection. */
  def bandPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, bandSeconds: Long,
      rightSuffix: String = "_r"): DataFrame = {
    require(bandSeconds > 0, "bandSeconds must be positive")
    val renamedRight = right.columns.foldLeft(right) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, c + rightSuffix)
    }
    val lb = left
      .withColumn("__sec", floor(unix_micros(col(leftTs)) / lit(1000000L)).cast("long"))
      .withColumn("__b0", floor(col("__sec") / lit(bandSeconds)))
      .withColumn("__bucket", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val rb = renamedRight
      .withColumn("__rsec",
        floor(unix_micros(col(rightTs + rightSuffix)) / lit(1000000L)).cast("long"))
      .withColumn("__bucket", floor(col("__rsec") / lit(bandSeconds)))
    lb.join(rb, keys :+ "__bucket")
      .filter(col("__rsec") > col("__sec") &&
        col("__rsec") <= col("__sec") + lit(bandSeconds))
      .drop("__bucket", "__sec", "__rsec")
  }
}
