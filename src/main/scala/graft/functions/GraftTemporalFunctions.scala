package graft.functions

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine's temporal partition transforms (`year`/`month`/`day`/
  * `hour`, [[graft.partition.Transforms.expression]] semantics: calendar
  * year int, "yyyy-MM" string, date, "yyyy-MM-dd-HH" string — all under
  * the engine's pinned UTC sessions) served as V2 catalog functions, so
  * [[graft.catalog.SpjScan]]'s `KeyGroupedPartitioning` over
  * `days(ts)`-style transforms resolves on both sides of a join and a
  * ts-equality join of two day-partitioned tables plans shuffle-free.
  * `produceResult` must agree bit-for-bit with the write-side column
  * expressions — it is what Spark evaluates to route a plain relation
  * into the table's layout under one-sided SPJ shuffle. */
object GraftTemporalFunctions {

  val names: Seq[String] = Seq("years", "months", "days", "hours")

  def forName(name: String): Option[UnboundFunction] = name match {
    case "years" => Some(Unbound("years", IntegerType))
    case "months" => Some(Unbound("months", StringType))
    case "days" => Some(Unbound("days", DateType))
    case "hours" => Some(Unbound("hours", StringType))
    case _ => None
  }

  private final case class Unbound(fname: String, out: DataType)
      extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(col): graft temporal partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.fields.length != 1)
        throw new UnsupportedOperationException(
          s"$fname takes one temporal argument, got ${inputType.simpleString}")
      inputType.fields(0).dataType match {
        case dt @ (TimestampType | TimestampNTZType | DateType) =>
          Bound(fname, out, dt)
        case other => throw new UnsupportedOperationException(
          s"$fname does not support ${other.simpleString}")
      }
    }
  }

  private val monthFmt = DateTimeFormatter.ofPattern("yyyy-MM")
  private val hourFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd-HH")

  final case class Bound(fname: String, out: DataType, in: DataType)
      extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = Array(in)
    override def resultType(): DataType = out
    override def name(): String = fname
    override def canonicalName(): String = s"graft.$fname(${in.catalogString})"
    override def isResultNullable: Boolean = true

    private def localDateTime(row: InternalRow): LocalDateTime = in match {
      case DateType =>
        LocalDate.ofEpochDay(row.getInt(0).toLong).atStartOfDay()
      case _ => // micros since epoch, UTC wall clock (sessions pin UTC)
        LocalDateTime.ofInstant(
          Instant.EPOCH.plusNanos(row.getLong(0) * 1000L), ZoneOffset.UTC)
    }

    override def produceResult(input: InternalRow): Any = {
      if (input.isNullAt(0)) return null
      val t = localDateTime(input)
      fname match {
        case "years" => Integer.valueOf(t.getYear)
        case "months" => UTF8String.fromString(monthFmt.format(t))
        case "days" => Integer.valueOf(t.toLocalDate.toEpochDay.toInt)
        case "hours" => UTF8String.fromString(hourFmt.format(t))
        case other => throw new IllegalStateException(s"unbindable $other")
      }
    }
  }
}
