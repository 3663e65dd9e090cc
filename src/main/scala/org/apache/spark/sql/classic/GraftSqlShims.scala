package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal access shim into the classic-session internals (the
  * `private[sql]` boundary): Column-from-Expression, needed to re-apply
  * already-pushed catalyst filters onto a DataFrame-backed fallback scan.
  * The same package-gate pattern every Spark connector (Iceberg, Delta)
  * uses for this conversion. */
object GraftSqlShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
