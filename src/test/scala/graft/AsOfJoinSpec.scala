package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** Pinned as-of semantics: latest right row at-or-before the left time,
  * equal-time rows match, ties break to the largest tiebreak value, no
  * prior row yields null. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks latest <= with tiebreak and null for no-match") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 101L),
      (1L, ts("2024-01-01 10:00:00"), 102L), // same time: larger key wins
      (1L, ts("2024-01-01 12:00:00"), 103L),
      (2L, ts("2024-01-01 11:00:00"), 201L)
    ).toDF("k", "qt", "qid")
    val trades = Seq(
      (1L, ts("2024-01-01 09:00:00"), "t_before"), // before any quote -> null
      (1L, ts("2024-01-01 10:00:00"), "t_equal"),  // equal time matches -> 102
      (1L, ts("2024-01-01 11:30:00"), "t_mid"),    // -> 102
      (1L, ts("2024-01-01 13:00:00"), "t_after"),  // -> 103
      (2L, ts("2024-01-01 12:00:00"), "t_other"),  // other key -> 201
      (3L, ts("2024-01-01 12:00:00"), "t_nokey")   // key without quotes -> null
    ).toDF("k", "tt", "name")

    val out = AsOfJoin(trades, quotes, Seq("k"),
      leftTime = "tt", rightTime = "qt", tiebreak = "qid", payload = Seq("qid"))
      .collect().map(r => r.getAs[String]("name") ->
        Option(r.getAs[java.lang.Long]("qid")).map(_.toLong)).toMap

    assert(out("t_before").isEmpty)
    assert(out("t_equal").contains(102L))
    assert(out("t_mid").contains(102L))
    assert(out("t_after").contains(103L))
    assert(out("t_other").contains(201L))
    assert(out("t_nokey").isEmpty)
  }
}
