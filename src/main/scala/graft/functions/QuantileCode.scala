package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Equi-depth quantile bucket code: the number of `bounds` entries <= the
  * input value (0..bounds.length), via binary search over a driver-built
  * sorted boundary array; nulls map to bucket 0.
  *
  * Why a native expression: the z-order rewrite needs a per-row "which of
  * 256 quantile buckets" code per clustering column. Expressing that as
  * `aggregate(array(255 literals), ...)` inlines hundreds of comparisons
  * per reference and blows janino's 64KB method limit — whole-stage
  * codegen then silently falls back to interpreted rows, exactly what a
  * 100 TB rewrite pass cannot afford. Here the boundary array is ONE
  * referenced object and the search is O(log n) tight-loop bytecode.
  *
  * `bounds` must be sorted ascending and duplicate-free (the caller
  * dedupes); ties in the data are then deterministic: code = upper-bound
  * insertion point.
  */
case class QuantileCode(child: Expression, bounds: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  private lazy val arr: Array[Double] = bounds.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_qcode expects a double input, got ${other.simpleString}")
  }

  private def codeOf(d: Double): Int = {
    var lo = 0
    var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) <= d) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else codeOf(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val b = ctx.addReferenceObj("bounds", arr, "double[]")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    ev.copy(isNull = FalseLiteral, code =
      code"""
         |${childGen.code}
         |int ${ev.value} = 0;
         |if (!${childGen.isNull}) {
         |  int $lo = 0;
         |  int $hi = $b.length;
         |  while ($lo < $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    if ($b[$mid] <= ${childGen.value}) $lo = $mid + 1; else $hi = $mid;
         |  }
         |  ${ev.value} = $lo;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileCode =
    copy(child = newChild)

  override def prettyName: String = "graft_qcode"
}
