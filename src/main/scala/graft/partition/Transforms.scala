package graft.partition

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.PartitionFieldSpec
import graft.functions.IcebergBucket

/** Partition-transform hint with optional custom field name — the engine's
  * version of the reference's `x-partition` / `x-partition-transform` /
  * `x-partition-name` column hints (`adapter.py:188-276`). */
final case class PartitionHint(
    column: String,
    transform: Option[String] = None,
    name: Option[String] = None)

/** Builder shortcuts mirroring the `iceberg_adapter` helpers. */
object PartitionHint {
  def identity(col: String, name: String = null): PartitionHint =
    PartitionHint(col, Some("identity"), Option(name))
  def year(col: String, name: String = null): PartitionHint =
    PartitionHint(col, Some("year"), Option(name))
  def month(col: String, name: String = null): PartitionHint =
    PartitionHint(col, Some("month"), Option(name))
  def day(col: String, name: String = null): PartitionHint =
    PartitionHint(col, Some("day"), Option(name))
  def hour(col: String, name: String = null): PartitionHint =
    PartitionHint(col, Some("hour"), Option(name))
  def bucket(n: Int, col: String, name: String = null): PartitionHint =
    PartitionHint(col, Some(s"bucket[$n]"), Option(name))
  def truncate(w: Int, col: String, name: String = null): PartitionHint =
    PartitionHint(col, Some(s"truncate[$w]"), Option(name))
}

/** Transform parsing, validation, spec building and Column expressions —
  * the Spark realization of `partition_builder.py` (T1-T8). */
object Transforms {

  private val Parameterized = raw"^(\w+)\[(\d+)\]$$".r
  private val Temporal = Set("year", "month", "day", "hour")

  /** `parse_transform_hint` (`partition_builder.py:52-78`). */
  def parseHint(hint: String): (String, Option[Int]) = hint match {
    case Parameterized(t, p) => (t, Some(p.toInt))
    case simple => (simple, None)
  }

  private def isTemporalType(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  /** `validate_transform_for_type` (`partition_builder.py:81-133`). */
  def validate(transform: String, param: Option[Int], dt: DataType, col: String): Unit = {
    if (Temporal.contains(transform) && !isTemporalType(dt))
      throw new IllegalArgumentException(
        s"Temporal transform '$transform' cannot be applied to column '$col' " +
          s"with type ${dt.simpleString}. Use timestamp or date types.")
    if (transform == "bucket") {
      if (param.forall(_ <= 0))
        throw new IllegalArgumentException(
          s"Bucket transform requires a positive integer parameter for column '$col'")
      if (dt == BinaryType)
        throw new IllegalArgumentException(
          s"Bucket transform cannot be applied to binary column '$col'")
    }
    if (transform == "truncate") {
      if (param.forall(_ <= 0))
        throw new IllegalArgumentException(
          s"Truncate transform requires a positive integer parameter for column '$col'")
      val ok = dt match {
        case StringType | IntegerType | LongType | BinaryType | _: DecimalType => true
        case _ => false
      }
      if (!ok)
        throw new IllegalArgumentException(
          s"Truncate transform cannot be applied to column '$col' with type " +
            s"${dt.simpleString}. Use string, integer, long, decimal, or binary.")
    }
    val known = Temporal ++ Set("identity", "bucket", "truncate")
    if (!known.contains(transform))
      throw new IllegalArgumentException(
        s"Unknown transform type '$transform' for column '$col'")
    // TIME is a pruning-stat type only: the partition-key consumers (SPJ
    // key decode, DPP evaluation, dynamic-overwrite attribution) have no
    // TIME codec, so refuse at spec build rather than degrade silently
    if (dt.isInstanceOf[TimeType])
      throw new IllegalArgumentException(
        s"Partitioning by TIME column '$col' is not supported; " +
          "partition on a timestamp or derived string instead")
  }

  /** Default transform by type (`choose_partition_transform`,
    * `partition_builder.py:274-286`): temporal→month, discrete→identity,
    * else identity. */
  def defaultTransform(dt: DataType): String = dt match {
    case t if isTemporalType(t) => "month"
    case StringType | IntegerType | LongType => "identity"
    case _ => "identity"
  }

  private def transformName(transform: String, param: Option[Int]): String =
    param.fold(transform)(p => s"${transform}_$p")

  /** `build_partition_spec` (`partition_builder.py:136-209`): resolve each
    * hint against the schema (unknown columns skipped with a warning),
    * validate, default names `{col}_{transform}`. */
  def buildSpec(hints: Seq[PartitionHint], schema: StructType): Seq[PartitionFieldSpec] =
    hints.flatMap { h =>
      schema.fields.find(_.name == h.column) match {
        case None => None // reference logs + skips (partition_builder.py:178-182)
        case Some(field) =>
          val (t, p) = h.transform.map(parseHint)
            .getOrElse((defaultTransform(field.dataType), None))
          validate(t, p, field.dataType, h.column)
          Some(PartitionFieldSpec(h.column, t, p,
            h.name.getOrElse(s"${h.column}_${transformName(t, p)}")))
      }
    }

  /** Iceberg-spec ORDINAL partition values (table-spec "Partition
    * Transforms"): year → years since 1970, month → months since
    * 1970-01, day → days since epoch, hour → hours since epoch — for
    * byte-level fidelity with Iceberg partition metadata when
    * interoperating. The engine's own layout uses the human-readable
    * `expression` below (the reference's tests assert spec shape, not
    * values). */
  def icebergOrdinalExpression(spec: PartitionFieldSpec, dt: DataType): Column = {
    val src = col(spec.source)
    val ts = src.cast(TimestampType)
    spec.transform match {
      case "year" => (year(ts) - 1970).cast(IntegerType)
      case "month" => ((year(ts) - 1970) * 12 + month(ts) - 1).cast(IntegerType)
      case "day" => datediff(to_date(ts), lit("1970-01-01")).cast(IntegerType)
      case "hour" => (unix_timestamp(ts) / 3600L).cast(IntegerType)
      case _ => expression(spec, dt)
    }
  }

  /** The transform as a Column expression over the source column — used by
    * the write path as `df.withColumn(spec.name, expr).write.partitionBy`.
    * Temporal transforms yield human-readable values (our tests and the
    * reference's assert spec shape, not byte-level partition values);
    * bucket is Iceberg-hash-faithful via the custom expression. */
  def expression(spec: PartitionFieldSpec, dt: DataType): Column = {
    val src = col(spec.source)
    spec.transform match {
      case "identity" => src
      case "year" => year(src.cast(TimestampType))
      case "month" => date_format(src.cast(TimestampType), "yyyy-MM")
      case "day" => to_date(src.cast(TimestampType))
      case "hour" => date_format(src.cast(TimestampType), "yyyy-MM-dd-HH")
      case "bucket" => IcebergBucket(spec.param.get, src)
      case "truncate" =>
        val w = spec.param.get
        dt match {
          case StringType => substring(src, 1, w)
          case BinaryType => expr(s"substring(${spec.source}, 1, $w)")
          case IntegerType | LongType => src - pmod(src, lit(w))
          case d: DecimalType =>
            // truncate to multiple of w in the unscaled domain
            src - pmod(src, lit(new java.math.BigDecimal(
              java.math.BigInteger.valueOf(w), d.scale)))
          case other =>
            throw new IllegalArgumentException(
              s"truncate unsupported for ${other.simpleString}")
        }
    }
  }
}
