package graft.types

import org.apache.spark.sql.types._

/** Type lattice + pre-write normalization.
  *
  * Mirrors the reference's Arrow→Iceberg conversion semantics
  * (`schema_converter.py:84-176`) and Iceberg-compat normalization
  * (`schema_casting.py:28-88`) re-based onto Spark's type system. Spark has
  * no uint/time32/decimal256/dictionary types, so the rules that survive
  * are: narrow ints widen to IntegerType, char/varchar collapse to
  * StringType, and nested types normalize recursively.
  */
object TypeLattice {

  /** Engine capability caps, matching the reference's declared destination
    * capabilities (`destination_client.py:1556-1596`). */
  val MaxDecimalPrecision = 38
  val MaxDecimalScale = 9
  val MaxIdentifierLength = 255

  /** Normalize one Spark type to the engine's storage lattice. */
  def normalize(dt: DataType): DataType = dt match {
    // int8/int16 → int32 (schema_converter.py:99-102: small ints widen to
    // IntegerType; Spark's ByteType/ShortType are the analogues)
    case ByteType | ShortType => IntegerType
    // char/varchar are parse-time veneers over string
    case _: VarcharType | _: CharType => StringType
    // decimal beyond the (38, 9) capability cap degrades to string with the
    // same "unsupported decimal" escape hatch as decimal256→string
    // (schema_casting.py:51-56)
    case d: DecimalType if d.precision > MaxDecimalPrecision => StringType
    // TIME normalizes to microsecond precision — the reference's
    // time32→time64(us) compat rule (schema_casting.py:47-48) and the
    // Iceberg TimeType micros unit (schema_converter.py:134-135). Spark
    // 4.1 caps TIME precision at 6, so this is always a widening.
    case t: TimeType if t.precision != TimeType.MICROS_PRECISION =>
      TimeType(TimeType.MICROS_PRECISION)
    case ArrayType(et, n) => ArrayType(normalize(et), n)
    case MapType(kt, vt, n) => MapType(normalize(kt), normalize(vt), n)
    case StructType(fields) =>
      StructType(fields.map(f => f.copy(dataType = normalize(f.dataType))))
    case other => other
  }

  /** Normalize a full schema (recursive). */
  def normalize(schema: StructType): StructType =
    normalize(schema: DataType).asInstanceOf[StructType]

  /** Safe type promotions per the Iceberg spec, as the reference enforces
    * them (`schema_evolution.py:53-87`): int→long, float→double, decimal
    * widening (p'>=p && s'>=s), same-type identity. Nested types recurse
    * (`schema_casting.py:63-69`): a struct promotes when every source
    * field promotes to its target counterpart and every target-only
    * field is nullable (Iceberg's add-optional-field rule); arrays/maps
    * promote element-/value-wise. */
  def canPromote(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if f == t => true
    case (f: DecimalType, t: DecimalType) =>
      t.precision >= f.precision && t.scale >= f.scale
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    // TIME precision widening is lossless (the timestamp unit-upgrade
    // analogue: s<ms<us); narrowing is NOT a promotion
    case (f: TimeType, t: TimeType) => t.precision >= f.precision
    case (StructType(ff), StructType(tf)) =>
      val fByName = ff.map(f => f.name -> f).toMap
      tf.forall(t =>
        fByName.get(t.name).fold(t.nullable)(f =>
          canPromote(f.dataType, t.dataType) &&
            // optional->required is forbidden (Iceberg rule): existing
            // nulls cannot retroactively satisfy a required contract
            (t.nullable || !f.nullable))) &&
        ff.forall(f => tf.exists(_.name == f.name))
    case (ArrayType(fe, _), ArrayType(te, _)) => canPromote(fe, te)
    case (MapType(fk, fv, _), MapType(tk, tv, _)) =>
      fk == tk && canPromote(fv, tv)
    case _ => false
  }

  /** True if `dt` is an integral (signed int) Spark type. */
  def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Bit width of integral types (schema_casting.py:230-240). */
  def integerBits(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(8)
    case ShortType => Some(16)
    case IntegerType => Some(32)
    case LongType => Some(64)
    case _ => None
  }

  def isFloating(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case _ => false
  }
}
