package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}

/** Physical-plan probes used by plan-pinning driver entries and specs.
  * Counting must see through AQE: executed exchanges hide inside leaf
  * `QueryStageExec` nodes, so a naive `collect` over the final plan
  * reports zero shuffles for any adaptive query. */
object PlanOps {

  /** Number of shuffle exchanges in the FINAL (post-AQE) plan. Forces
    * execution first so the adaptive plan is finalized. */
  def shuffles(df: DataFrame): Int = {
    df.collect()
    countShuffles(df.queryExecution.executedPlan)
  }

  def countShuffles(p: SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
    case q: QueryStageExec => countShuffles(q.plan)
    case r: ReusedExchangeExec => countShuffles(r.child)
    case s: ShuffleExchangeExec => 1 + s.children.map(countShuffles).sum
    case other => other.children.map(countShuffles).sum
  }

  /** The V2 scan descriptions in the final plan, AQE-aware — lets specs
    * and driver entries pin WHICH scan implementation served a query
    * (e.g. the `graft-spj-mor` wrap) without disabling AQE. */
  def scanDescriptions(df: DataFrame): Seq[String] = {
    df.collect()
    descs(df.queryExecution.executedPlan)
  }

  private def descs(p: SparkPlan): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => descs(a.executedPlan)
    case q: QueryStageExec => descs(q.plan)
    case r: ReusedExchangeExec => descs(r.child)
    case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
      Seq(b.scan.description())
    case other => other.children.flatMap(descs)
  }
}
