package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from SURVEY §2;
  * `oracleSql` holds the DuckDB-equivalent SQL for each (same column names —
  * the driver sorts columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's own join +
    * group-by + order-by SQL test (tests/test_dataset.py:215-221) re-run
    * through Spark SQL. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.WriteQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.StreamQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.WriteQueries.oracleSql ++
      graft.queries.LlmQueries.oracleSql ++
      graft.queries.StreamQueries.oracleSql
}
