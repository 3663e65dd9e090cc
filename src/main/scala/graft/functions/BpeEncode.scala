package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-word BPE tokenizer: applies a learned merge list (see
  * `graft.llmops.Bpe`) to one word and returns the token array.
  *
  * Symbol-sequence representation: a word's symbols are encoded as ONE
  * string with DOUBLED separators `␁␁s1␁␁s2␁␁…␁␁sk␁␁` (␁ = U+0001,
  * which never occurs in a symbol — the word table filters it).
  * Applying merge (l, r) → lr is then exactly
  * `String.replace("␁l␁␁r␁", "␁lr␁")`. The doubling is load-bearing:
  * two adjacent matches share one boundary, and with a SINGLE separator
  * the shared char is consumed by the left match, so replace() misses
  * every second occurrence ("abab" would merge only the first "ab" and
  * the trainer would re-learn (a,b) as a duplicate rank). With ␁␁
  * boundaries the two matches take the boundary's two halves and a
  * single replace() pass merges ALL non-overlapping occurrences
  * leftmost-greedily — textbook BPE, and the SAME contract as SQL
  * `replace()` in both Spark and DuckDB, which is what makes the whole
  * tokenizer replayable by the DuckDB oracle (a recursive CTE over the
  * staged merge table applies the identical replaces).
  *
  * Why a native expression: tokenization sits on the corpus-scale hot
  * path (every distinct word of a 100 TB corpus passes through it), and
  * a merge list is a few thousand entries — as nested `replace()`
  * Column calls the expression tree would be merge-count deep and blow
  * janino's method limit, while a Scala UDF would pay serialization on
  * every row. Here the merge list is ONE referenced object and the
  * loop is tight bytecode inside whole-stage codegen.
  */
class BpeWordEncoder(val merges: Array[(String, String)]) extends Serializable {
  import BpeWordEncoder.Sep

  private val finds: Array[String] =
    merges.map { case (l, r) => Sep + l + Sep + Sep + r + Sep }
  private val repls: Array[String] =
    merges.map { case (l, r) => Sep + l + r + Sep }

  /** Seed symbols = code points (matches the `regexp_replace(w,
    * '([\s\S])', '$1␁␁')` char split both engines use: java.util.regex
    * and RE2 both advance `.`/`[\s\S]` by code point, not code unit). */
  def seeded(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 3 + 2)
    sb.append(Sep).append(Sep)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp)
      sb.append(Sep).append(Sep)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Applies every merge once, in rank order — the engine's documented
    * apply semantics (classic BPE re-scans for the lowest-rank pair
    * after every merge; on training data the two coincide because the
    * trainer derived rank order from exactly these replaces). */
  def encodeToSym(word: String): String = {
    var s = seeded(word)
    var i = 0
    while (i < finds.length) {
      // contains-gate: most merges don't apply to most words, and
      // contains() is the cheap half of replace()
      if (s.contains(finds(i))) s = s.replace(finds(i), repls(i))
      i += 1
    }
    s
  }

  def encode(word: UTF8String): ArrayData = {
    val s = encodeToSym(word.toString)
    // split(regex) drops TRAILING empties, keeps the leading one from
    // the opening boundary → tokens are parts[1..]
    val parts = s.split(Sep + Sep)
    val out = new Array[AnyRef](math.max(parts.length - 1, 0))
    var i = 1
    while (i < parts.length) {
      out(i - 1) = UTF8String.fromString(parts(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object BpeWordEncoder {
  /** Symbol separator; the word tables filter words containing it. */
  val Sep: String = "\u0001"
}

/** `graft_bpe(word, leftsArrayLiteral, rightsArrayLiteral)` — token array
  * of `word` under the merge list `lefts zip rights` (rank order). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val encoder = new BpeWordEncoder(merges.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe expects a string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val enc = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeWordEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$enc.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe"
}
