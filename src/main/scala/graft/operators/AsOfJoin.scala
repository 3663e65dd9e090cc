package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the single latest right row with
  * `rightTime <= leftTime` within the same key — the canonical temporal
  * operator Spark lacks natively.
  *
  * Implemented by COMPOSITION (preference (a) of the custom-operator
  * ladder): union both sides tagged, one window pass per key ordered by
  * time carrying the last-seen right-side payload forward
  * (`last(ignoreNulls)`), then keep the left rows. This is the scalable
  * formulation — one shuffle on the key, linear scan per key, no
  * time-range explosion (a range-join + filter approach would be
  * O(left × matching-range)) — the same merge-scan shape DuckDB's native
  * ASOF JOIN executes.
  *
  * Ties on equal timestamps resolve to the largest `tiebreak` value;
  * right rows at exactly the left timestamp DO match (`<=`).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side whose latest row is attached
    * @param keys      equi-join key column names present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param tiebreak  right column ordering equal-time rows (max wins)
    * @param payload   right columns to attach (null when no match)
    */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, tiebreak: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(1).as("__is_right"),
          struct((tiebreak +: payload).distinct.map(col): _*).as("__p")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(0).as("__is_right"),
          lit(null).cast(taggedRight.schema("__p").dataType).as("__p")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    // at equal __t, right rows sort BEFORE left rows (so <= matches), and
    // among right rows the larger tiebreak sorts later (so last() wins)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_right").desc,
        col("__p").getField(tiebreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val unioned = taggedRight
      .select(taggedLeft.columns.map(c =>
        if (taggedRight.columns.contains(c)) col(c)
        else lit(null).as(c)): _*)
      .unionByName(taggedLeft)

    unioned
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++
        payload.map(p => col("__last").getField(p).as(p)): _*)
  }
}
