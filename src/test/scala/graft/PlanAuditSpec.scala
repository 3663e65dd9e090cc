package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: the properties that make these queries
  * scale are structural (pushdown reaches the scan, candidate joins are
  * hash joins on bounded keys, never cartesian) — pin them so a future
  * refactor can't silently regress the plan while staying correct. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filters and projections reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: ["), "no filter pushdown in q2 scan")
    assert(!p.contains("PushedFilters: []"), "q2 filters not pushed")
  }

  test("similarity and band joins never degrade to cartesian products") {
    for (q <- Seq("l19_cosine_bucketed", "l7_minhash_lsh", "l11_ann_lsh",
        "q34_range_join_bucketed", "l20_ann_ivf")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plan contains a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q plan contains a nested-loop join")
    }
  }

  test("round-3 entries keep scale-shaped plans") {
    // incremental dedup: anti-join, never cartesian; corpus read prunes
    // to the fingerprint column
    val p28 = plan("l28_incremental_dedup")
    assert(!p28.contains("CartesianProduct") &&
      !p28.contains("BroadcastNestedLoopJoin"))
    assert(p28.contains("LeftAnti"), "incremental dedup must anti-join")
    // TF-IDF: two hash aggregates + window, no cartesian
    val p30 = plan("l30_tfidf_topk")
    assert(!p30.contains("CartesianProduct") &&
      !p30.contains("BroadcastNestedLoopJoin"))
    // Q6: the date/quantity predicates reach the parquet scan
    val p39 = plan("q39_tpch6_forecast")
    assert(p39.contains("PushedFilters: [") && !p39.contains("PushedFilters: []"),
      "q39 predicates not pushed to the scan")
    // Q19's OR-bracket join stays a hash join on the part key
    val p41 = plan("q41_tpch19_brackets")
    assert(!p41.contains("CartesianProduct") &&
      !p41.contains("BroadcastNestedLoopJoin"))
  }

  test("the deliberate exceptions stay deliberate") {
    // l9 brute-force top-k broadcasts the query side by design (oracle
    // baseline); the corpus side still never self-joins
    val p = plan("l9_sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
  }
}
