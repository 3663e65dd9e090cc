package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BandJoin

/** Pinned band-join semantics: identical pairs to the naive band-filtered
  * equi-join, including bucket-boundary crossings and band-edge equality. */
class BandJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed band join equals the naive formulation on tricky boundaries") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:59:59")), // same bucket as 10
      (1L, 12L, ts("2024-01-01 11:00:00")), // exactly band edge from 10 (included)
      (1L, 13L, ts("2024-01-01 11:00:01")), // just past band from 10 (excluded)
      (1L, 14L, ts("2024-01-01 12:30:00")), // isolated
      (2L, 20L, ts("2024-01-01 10:30:00")), // other key
      (2L, 21L, ts("2024-01-01 11:15:00"))  // crosses bucket boundary from 20
    ).toDF("user_id", "event_id", "ts")

    val bucketed = BandJoin.bandPairs(ev, ev, Seq("user_id"), "ts", "ts", 3600L)
      .select($"event_id".as("a"), $"event_id_r".as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = ev.as("a").join(ev.as("b"),
        $"a.user_id" === $"b.user_id" &&
        $"b.ts" > $"a.ts" &&
        $"b.ts" <= org.apache.spark.sql.functions.expr("a.ts + INTERVAL '1' HOUR"))
      .select($"a.event_id", $"b.event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketed == naive)
    assert(bucketed.contains((10L, 12L))) // band edge inclusive
    assert(!bucketed.contains((10L, 13L))) // past band excluded
    assert(bucketed.contains((20L, 21L))) // pair meeting only via next-bucket probe
    // each qualifying pair appears exactly once (right bucket is unique)
    val all = BandJoin.bandPairs(ev, ev, Seq("user_id"), "ts", "ts", 3600L)
      .select($"event_id", $"event_id_r")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all.size == all.toSet.size)
  }
}
