package graft.catalog

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.types._

/** Metadata-tier aggregate answering: global COUNT(*)/COUNT(col)/MIN/MAX
  * folded from the snapshot's per-file stats — zero file IO, O(manifest)
  * driver work. The tier ABOVE parquet-footer aggregate pushdown (which
  * still opens every footer: 10⁵ files = 10⁵ reads at 100 TB; this is
  * one in-memory fold over stats the scan already holds). The same
  * answering Iceberg performs from manifests.
  *
  * Strictly conservative — `answer` returns None (falling back to the
  * parquet tier) unless the result is provably exact from stats:
  *
  *  - no outstanding MoR deletes (callers guard; deleted rows would count),
  *  - no filters of any kind (a filter changes every aggregate),
  *  - no GROUP BY, no DISTINCT,
  *  - COUNT(col) needs a null count on EVERY file (schema-evolution
  *    stragglers that predate the column refuse),
  *  - MIN/MAX only for numeric/date/timestamp columns — string footer
  *    stats may be writer-truncated, so they are never trusted — and
  *    only when every file carries the bound or is provably all-null.
  */
object MetaAgg {

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  /** Types whose canonical stat encoding round-trips exactly (see
    * [[graft.write.Stager.statColumn]]): numerics as themselves, dates
    * as epoch-day, timestamps as epoch-micros. Strings are excluded —
    * parquet writers may truncate binary footer stats. */
  private def minMaxSupported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | _: DecimalType | DateType | TimestampType |
        TimestampNTZType => true
    case _ => false
  }

  private def decode(dt: DataType, s: String): Any = dt match {
    case ByteType => s.toByte
    case ShortType => s.toShort
    case IntegerType => s.toInt
    case LongType => s.toLong
    case FloatType => s.toFloat
    case DoubleType => s.toDouble
    case d: DecimalType => new java.math.BigDecimal(s)
    case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(s.toLong))
    case TimestampType =>
      val micros = s.toLong
      val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      t
    case TimestampNTZType =>
      val micros = s.toLong
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case other => throw new IllegalStateException(s"MetaAgg.decode: $other")
  }

  /** Try to answer the whole pushed aggregation from stats. Returns the
    * scan output schema (PARTIAL-aggregate shape: Spark re-aggregates
    * the single returned row, so counts are LongType and min/max carry
    * the column type) plus the one row of values. */
  def answer(agg: Aggregation, schema: StructType,
      files: Seq[DataFile]): Option[(StructType, Row)] = {
    if (agg.groupByExpressions().nonEmpty) return None
    val totalRows = files.map(_.rowCount).sum

    def countCol(name: String): Option[Long] = {
      if (!schema.fieldNames.contains(name)) return None
      val nulls = files.map(_.stats.get(name).flatMap(_.nullCount))
      if (nulls.exists(_.isEmpty)) None
      else Some(totalRows - nulls.flatten.sum)
    }

    def bound(name: String, wantMin: Boolean): Option[Option[Any]] = {
      if (!schema.fieldNames.contains(name)) return None
      val dt = schema(name).dataType
      if (!minMaxSupported(dt)) return None
      // every file must either carry the bound or be provably all-null
      val perFile: Seq[Option[Option[String]]] = files.map { f =>
        f.stats.get(name) match {
          case Some(cs) =>
            val b = if (wantMin) cs.min else cs.max
            b match {
              case Some(v) => Some(Some(v))
              case None if cs.nullCount.contains(f.rowCount) => Some(None)
              case None => None // stats present but bound missing: refuse
            }
          case None => None
        }
      }
      if (perFile.exists(_.isEmpty)) return None
      val bounds = perFile.flatten.flatten
      if (bounds.isEmpty) Some(None) // zero non-null values: NULL result
      else {
        val pick = bounds.reduce { (a, b) =>
          val c = StatCompare.compare(dt, a, b)
          if ((c <= 0) == wantMin) a else b
        }
        Some(Some(decode(dt, pick)))
      }
    }

    val answered: Seq[Option[(StructField, Any)]] =
      agg.aggregateExpressions().toSeq.zipWithIndex.map {
        case (_: CountStar, i) =>
          Some((StructField(s"a$i", LongType, nullable = false), totalRows))
        case (c: Count, i) if !c.isDistinct =>
          fieldOf(c.column).flatMap(countCol).map(v =>
            (StructField(s"a$i", LongType, nullable = false), v))
        case (m: Min, i) =>
          fieldOf(m.column).flatMap(n => bound(n, wantMin = true).map(v =>
            (StructField(s"a$i", schema(n).dataType), v.orNull)))
        case (m: Max, i) =>
          fieldOf(m.column).flatMap(n => bound(n, wantMin = false).map(v =>
            (StructField(s"a$i", schema(n).dataType), v.orNull)))
        case _ => None
      }
    if (answered.exists(_.isEmpty)) None
    else {
      val cols = answered.flatten
      Some((StructType(cols.map(_._1)), Row(cols.map(_._2): _*)))
    }
  }
}
