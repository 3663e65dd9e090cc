package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical POSIX path of a `_metadata.file_path` value.
  *
  * Spark's `_metadata.file_path` is a percent-ENCODED URI
  * (`file:///wh/p=a%20b/f.parquet` — Spark 4.1 computes it as
  * `new Path(...).toUri.toString`), while the engine's snapshot metadata
  * stores DECODED literal paths (`/wh/p=a b/f.parquet`). A scheme strip
  * alone leaves the two representations diverging exactly when a
  * partition value or the warehouse path contains a character URI
  * encoding touches (space, unicode, '%'), which silently un-matched
  * delete-attribution joins (resurrected deletes) and target-file subset
  * checks (spurious "concurrent rewrite" errors). This expression is the
  * single canonicalization rule: parse as URI and take the decoded path;
  * a string that is not a scheme-ful URI (already a literal engine path)
  * passes through untouched.
  *
  * Native expression (not a UDF): it sits on the scan hot path of every
  * merge-on-read read and row-level write.
  */
object UriPath {
  /** Shared by the expression, its codegen, and driver-side twins.
    *
    * Hot-path discipline (this runs once per row on every merge-on-read
    * scan): a literal engine path (no scheme) returns without
    * allocating, and a scheme-ful URI WITHOUT any percent escape strips
    * scheme+authority by index arithmetic — only strings that actually
    * contain '%' pay the full java.net.URI parse, whose decoded-path
    * semantics remain the single source of truth. */
  def decode(s: String): String = {
    val colon = s.indexOf(':')
    if (colon <= 0 || !Character.isLetter(s.charAt(0))) return s
    var i = 1
    while (i < colon) {
      val c = s.charAt(i)
      if (!(Character.isLetterOrDigit(c) || c == '+' || c == '.' || c == '-'))
        return s
      i += 1
    }
    if (s.indexOf('%') < 0 && s.indexOf('?') < 0 && s.indexOf('#') < 0) {
      // scheme-ful, nothing encoded: path extraction needs no decoding.
      // "file:///p" / "file://host/p" → path from the slash after the
      // authority; "file:/p" → path right after the colon.
      if (s.startsWith("//", colon + 1)) {
        val slash = s.indexOf('/', colon + 3)
        // authority with no path: rare and fiddly (empty-authority forms
        // are URI parse errors) — defer to the slow path's exact answer
        if (slash < 0) slowDecode(s) else s.substring(slash)
      } else if (colon + 1 < s.length && s.charAt(colon + 1) == '/')
        s.substring(colon + 1)
      else s
    } else slowDecode(s)
  }

  private def slowDecode(s: String): String =
    try {
      val u = new java.net.URI(s)
      if (u.getScheme != null && u.getPath != null) u.getPath else s
    } catch { case _: java.net.URISyntaxException => s }

  def decodeUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = decode(str)
    if (out eq str) s else UTF8String.fromString(out)
  }
}

case class UriPathExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_uri_path expects a string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    UriPath.decodeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UriPath.decodeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): UriPathExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_uri_path"
}
