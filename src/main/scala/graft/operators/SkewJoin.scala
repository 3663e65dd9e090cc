package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys.
  *
  * AQE's skew-join split handles most runtime skew; explicit salting is
  * the deterministic fallback when one key dominates so heavily that even
  * split shuffle blocks overwhelm a task (the classic power-law user_id).
  * The big side gets a random-but-deterministic salt in [0, factor); the
  * small side is replicated `factor` times; joining on (keys, salt)
  * spreads the hot key across `factor` tasks. Join RESULTS are identical
  * to the unsalted join — only physical placement changes.
  */
object SkewJoin {

  /** Join types whose results are unchanged by replicating the small side:
    * every small-side row either matches (same matches, spread across
    * salts) or is dropped. right/full would emit each unmatched small-side
    * row `factor` times, so they are rejected. */
  private val SaltSafeJoinTypes = // normalized: lowercase, no underscores
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  def salted(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    require(SaltSafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"salted() supports only big-side-preserving join types " +
        s"(inner/left/left_semi/left_anti); '$joinType' would duplicate " +
        s"unmatched small-side rows ${factor}x")
    // deterministic per-row salt: hash the whole row's key columns plus a
    // per-row discriminator (monotonically_increasing_id is stable within
    // one evaluation and never affects the relational result)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)).cast("int"))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    bigSalted.join(smallSalted, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Measured salting: derive the factor from the big side's actual
    * hottest-key row count instead of guessing. One planning aggregate
    * (map-side-combined count per key, cost bounded by key cardinality)
    * yields the max per-key count; factor = ceil(hottest / target),
    * clamped to [1, maxFactor]. Unskewed inputs take the plain join with
    * no salt column at all — so this is safe to use unconditionally where
    * power-law keys are POSSIBLE but not certain. */
  def saltedAuto(big: DataFrame, small: DataFrame, keys: Seq[String],
      targetRowsPerTask: Long = 5000000L, maxFactor: Int = 64,
      joinType: String = "inner"): DataFrame = {
    require(targetRowsPerTask > 0)
    val hottestRow = big.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).agg(max(col("__n")))
      .collect()(0)
    val hottest = if (hottestRow.isNullAt(0)) 0L else hottestRow.getLong(0)
    val factor = math.min(maxFactor.toLong,
      math.max(1L, (hottest + targetRowsPerTask - 1) / targetRowsPerTask)).toInt
    if (factor <= 1) big.join(small, keys, joinType)
    else salted(big, small, keys, factor, joinType)
  }
}
