package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

/** Pinned salting contract: results identical to the unsalted join for
  * big-side-preserving join types; replication-unsafe types rejected. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def big = Seq((1L, "x1"), (1L, "x2"), (1L, "x3"), (2L, "y"), (4L, "w"))
    .toDF("k", "bv")
  private def small = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "sv")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("salted inner/left/semi/anti match the unsalted join exactly") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = big.join(small, Seq("k"), jt)
      val salted = SkewJoin.salted(big, small, Seq("k"), factor = 4, joinType = jt)
      assert(sortedRows(salted) == sortedRows(plain), s"joinType=$jt")
    }
  }

  test("saltedAuto matches the plain join and skips salting when unskewed") {
    // targetRowsPerTask=1 forces salting (hottest key has 3 rows → factor 3)
    val forced = SkewJoin.saltedAuto(big, small, Seq("k"), targetRowsPerTask = 1)
    assert(sortedRows(forced) == sortedRows(big.join(small, Seq("k"))))
    assert(forced.columns.toSeq == big.join(small, Seq("k")).columns.toSeq)
    // huge target → factor 1 → plain join plan, results identical
    val plainPath = SkewJoin.saltedAuto(big, small, Seq("k"))
    assert(sortedRows(plainPath) == sortedRows(big.join(small, Seq("k"))))
    // empty big side: planning agg yields null max → no NPE, empty result
    val emptyBig = big.filter("k < 0")
    assert(SkewJoin.saltedAuto(emptyBig, small, Seq("k")).count() == 0L)
  }

  test("saltedAuto clamps the factor to maxFactor") {
    // hottest=3, target=1 → raw factor 3, clamped to 2; results still exact
    val clamped = SkewJoin.saltedAuto(big, small, Seq("k"),
      targetRowsPerTask = 1, maxFactor = 2, joinType = "left")
    assert(sortedRows(clamped) == sortedRows(big.join(small, Seq("k"), "left")))
  }

  test("replication-unsafe join types are rejected") {
    for (jt <- Seq("right", "full", "full_outer", "right_outer")) {
      val e = intercept[IllegalArgumentException] {
        SkewJoin.salted(big, small, Seq("k"), factor = 4, joinType = jt)
      }
      assert(e.getMessage.contains("big-side-preserving"), s"joinType=$jt")
    }
  }
}
