package graft.cast

import org.apache.spark.sql.types._
import graft.types.TypeLattice
import scala.collection.mutable.ListBuffer

/** Raised when a cast would lose data in strict mode, or when a required
  * target column is absent from the source (`schema_casting.py:91-93`). */
class CastingError(msg: String) extends RuntimeException(msg)

/** Result of validating a schema-to-schema cast
  * (`schema_casting.py:96-117`). */
final class CastValidationResult {
  val warnings: ListBuffer[String] = ListBuffer.empty
  val errors: ListBuffer[String] = ListBuffer.empty
  def addWarning(m: String): Unit = warnings += m
  def addError(m: String): Unit = errors += m
  def isSafe: Boolean = errors.isEmpty
}

/** Data-loss detection for DataFrame casts, run BEFORE any `Column.cast`.
  *
  * Spark's own cast is permissive (it would silently truncate floats into
  * ints, drop timezones, etc.), so the reference's validation matrix
  * (`schema_casting.py:120-411`) must run first and gate execution.
  *
  * Spark-type adaptation of the matrix:
  *  - TimestampType = tz-aware instant, TimestampNTZType = naive; Spark has
  *    a single µs precision so the reference's unit-downgrade rule
  *    (ns>us>ms>s ⇒ error) collapses away.
  *  - No unsigned ints ⇒ the unsigned→signed warning collapses away.
  */
object CastValidator {

  def missingRequiredTargetFields(
      source: StructType, target: StructType): Seq[StructField] = {
    val sourceNames = source.fieldNames.toSet
    target.fields.toSeq.filter(f => !sourceNames.contains(f.name) && !f.nullable)
  }

  def validateCast(source: StructType, target: StructType): CastValidationResult = {
    val result = new CastValidationResult
    val targetFields = target.fields.map(f => f.name -> f).toMap

    source.fields.foreach { sf =>
      targetFields.get(sf.name) match {
        case None =>
          result.addError(
            s"Field '${sf.name}' exists in source but not in target schema")
        case Some(tf) if sf.dataType == tf.dataType => // identical, no cast
        case Some(tf) =>
          checkTimestampCast(sf.dataType, tf.dataType, sf.name, result)
          checkTimeCast(sf.dataType, tf.dataType, sf.name, result)
          checkNumericCast(sf.dataType, tf.dataType, sf.name, result)
          checkStringCast(sf.dataType, tf.dataType, sf.name, result)
          if (!typesCompatible(sf.dataType, tf.dataType))
            result.addError(
              s"Field '${sf.name}': Type ${sf.dataType.simpleString} is not " +
                s"compatible with ${tf.dataType.simpleString}")
      }
    }

    // Fields in target missing from source: nullable ⇒ null-fill warning,
    // required ⇒ error (schema_casting.py:344-358)
    val sourceNames = source.fieldNames.toSet
    target.fields.foreach { tf =>
      if (!sourceNames.contains(tf.name)) {
        if (tf.nullable)
          result.addWarning(
            s"Field '${tf.name}' exists in target but not in source (will be null)")
        else
          result.addError(
            s"Required field '${tf.name}' exists in target but not in source schema")
      }
    }
    result
  }

  /** Timezone-awareness rules (`schema_casting.py:120-172`): naive→aware =
    * warning (assume UTC), aware→naive = error (loses tz). */
  private def checkTimestampCast(
      s: DataType, t: DataType, name: String, r: CastValidationResult): Unit =
    (s, t) match {
      case (TimestampNTZType, TimestampType) =>
        r.addWarning(s"Field '$name': Converting timezone-naive timestamp to " +
          "timezone-aware. Values will be interpreted as UTC.")
      case (TimestampType, TimestampNTZType) =>
        r.addError(s"Field '$name': Converting timezone-aware timestamp to " +
          "timezone-naive loses timezone information")
      case _ =>
    }

  /** TIME precision rules — the reference's timestamp unit-downgrade
    * matrix (`schema_casting.py:120-172`, ns>us>ms>s ⇒ error) applied to
    * Spark 4.1's native TimeType (fractional-second precision 0..6):
    * downgrade truncates sub-second digits = error, upgrade = safe. */
  private def checkTimeCast(
      s: DataType, t: DataType, name: String, r: CastValidationResult): Unit =
    (s, t) match {
      case (st: TimeType, tt: TimeType) if tt.precision < st.precision =>
        r.addError(s"Field '$name': Converting time(${st.precision}) to " +
          s"time(${tt.precision}) truncates fractional seconds")
      case _ =>
    }

  /** Numeric rules (`schema_casting.py:175-227`): float→int = error,
    * integer bit narrowing = error, decimal precision/scale narrowing =
    * error. */
  private def checkNumericCast(
      s: DataType, t: DataType, name: String, r: CastValidationResult): Unit = {
    if (TypeLattice.isFloating(s) && TypeLattice.isIntegral(t)) {
      r.addError(s"Field '$name': Converting float to integer truncates decimal values")
      return
    }
    (TypeLattice.integerBits(s), TypeLattice.integerBits(t)) match {
      case (Some(sb), Some(tb)) if sb > tb =>
        r.addError(s"Field '$name': Converting $sb-bit integer to $tb-bit may overflow")
      case _ =>
    }
    (s, t) match {
      case (sd: DecimalType, td: DecimalType) =>
        if (sd.precision > td.precision)
          r.addError(s"Field '$name': Converting decimal(${sd.precision}, ${sd.scale}) " +
            s"to decimal(${td.precision}, ${td.scale}) may lose precision")
        if (sd.scale > td.scale)
          r.addError(s"Field '$name': Converting decimal scale from ${sd.scale} " +
            s"to ${td.scale} truncates decimal places")
      case _ =>
    }
  }

  /** String/binary rules (`schema_casting.py:255-285`): binary→string =
    * warning (UTF-8 assumption), string→{string,binary} = safe,
    * string→anything else = error. */
  private def checkStringCast(
      s: DataType, t: DataType, name: String, r: CastValidationResult): Unit = {
    if (s == BinaryType && t == StringType)
      r.addWarning(s"Field '$name': Converting binary to string assumes valid UTF-8 encoding")
    if (s == StringType && t != StringType && t != BinaryType)
      r.addError(s"Field '$name': Converting string to ${t.simpleString} may lose data")
  }

  /** Broad compatibility matrix (`schema_casting.py:363-411`). */
  private[cast] def typesCompatible(s: DataType, t: DataType): Boolean = (s, t) match {
    case (a, b) if a == b => true
    case (a, b) if TypeLattice.isIntegral(a) && TypeLattice.isIntegral(b) => true
    case (a, b) if TypeLattice.isFloating(a) && TypeLattice.isFloating(b) => true
    case (a, b) if TypeLattice.isIntegral(a) && TypeLattice.isFloating(b) => true
    case (TimestampType | TimestampNTZType, TimestampType | TimestampNTZType) => true
    case (DateType, DateType) => true
    case (_: TimeType, _: TimeType) => true
    case (StringType, BinaryType) | (BinaryType, StringType) => true
    case (_: DecimalType, _: DecimalType) => true
    // nested: element-wise compatible
    case (ArrayType(ae, _), ArrayType(be, _)) => typesCompatible(ae, be)
    case (MapType(ak, av, _), MapType(bk, bv, _)) =>
      typesCompatible(ak, bk) && typesCompatible(av, bv)
    // structs compare BY NAME with evolution semantics (SafeCast rebuilds
    // them field-by-name): shared fields must be compatible, target-only
    // fields null-fill when nullable, source-only fields are dropped only
    // if nullable (mirrors the top-level sparse rules, recursively —
    // schema_casting.py:63-69)
    case (StructType(af), StructType(bf)) =>
      val aByName = af.map(f => f.name -> f).toMap
      bf.forall(b => aByName.get(b.name).fold(b.nullable)(a =>
        typesCompatible(a.dataType, b.dataType))) &&
        af.forall(a => a.nullable || bf.exists(_.name == a.name))
    case _ => false
  }
}
