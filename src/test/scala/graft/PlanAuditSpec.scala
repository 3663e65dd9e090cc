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

  test("the deliberate exceptions stay deliberate") {
    // l9 brute-force top-k broadcasts the query side by design (oracle
    // baseline); the corpus side still never self-joins
    val p = plan("l9_sim_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
  }
}
