package graft.catalog

import java.util.{Optional, OptionalLong}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Column-level statistics for cost-based optimization.
  *
  * Spark's CBO (join reordering, selectivity estimation) reads per-column
  * NDV/null/min-max through the DSv2 `Statistics.columnStats()` surface
  * (`DataSourceV2Relation.transformV2Stats` converts them into catalyst
  * `ColumnStat`s when `spark.sql.cbo.enabled` is on). The engine already
  * keeps EXACT per-file null counts and min/max in commit-time footer
  * stats; the one number a scan cannot derive from per-file metadata is
  * the table-wide distinct count — that is what `ANALYZE` computes (the
  * same HLL estimate Spark's own `ANALYZE TABLE ... FOR COLUMNS` uses)
  * and stores in table properties, snapshot-stamped so staleness is
  * visible.
  *
  * At 100 TB the payoff is plan shape, not scan speed: with NDVs a
  * multi-join query orders the joins by estimated cardinality instead of
  * raw byte size, and an equi-join on a low-NDV column stops being
  * under-estimated. Reporting is gated on `cboEnabled`, so a default
  * session's plans are byte-identical.
  */
object ColumnStatsSupport {

  /** `graft.stats.<col>` property value: `ndv:nulls:avgLen:maxLen`
    * (-1 = absent). */
  val PropPrefix = "graft.stats."
  val SnapshotProp = "graft.stats.snapshot-id"

  private[catalog] final case class Analyzed(
      ndv: Long, nulls: Long, avgLen: Long, maxLen: Long)

  private def parse(v: String): Option[Analyzed] =
    v.split(":") match {
      case Array(a, b, c, d) =>
        try Some(Analyzed(a.toLong, b.toLong, c.toLong, d.toLong))
        catch { case _: NumberFormatException => None }
      case _ => None
    }

  /** Types the single-pass analyzer covers (HLL over nested types is
    * meaningless for CBO estimation). */
  private def analyzable(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => false
    case _ => true
  }

  /** One distributed pass: HLL distinct + null count per column, length
    * stats for strings/binary. Commits the results as table properties
    * stamped with the analyzed snapshot id. Returns (rowCount, columns
    * analyzed). */
  def analyze(t: GraftTable, requested: Seq[String]): (Long, Seq[String]) = {
    val m = t.metadata
    val targets =
      (if (requested.isEmpty) m.schema.fields.toSeq
       else requested.map(c => m.schema.fields.find(_.name == c).getOrElse(
         throw new IllegalArgumentException(s"no such column: $c"))))
        .filter(f => analyzable(f.dataType))
    require(targets.nonEmpty, "no analyzable columns")
    val df = t.read()
    val aggs = count(lit(1)).as("__rows") +: targets.flatMap { f =>
      val c = col(f.name)
      val lenCol = f.dataType match {
        case StringType => Some(length(c))
        case BinaryType => Some(octet_length(c))
        case _ => None
      }
      Seq(approx_count_distinct(c).as(s"__ndv_${f.name}"),
        count(when(c.isNull, 1)).as(s"__nulls_${f.name}")) ++
        lenCol.toSeq.flatMap(lc => Seq(
          avg(lc).cast("long").as(s"__avglen_${f.name}"),
          max(lc).cast("long").as(s"__maxlen_${f.name}")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def l(name: String): Long =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(
        row.fieldIndex(name))) row.getLong(row.fieldIndex(name)) else -1L
    val rows = l("__rows")
    val props = targets.map { f =>
      val a = Analyzed(l(s"__ndv_${f.name}"), l(s"__nulls_${f.name}"),
        l(s"__avglen_${f.name}"), l(s"__maxlen_${f.name}"))
      s"$PropPrefix${f.name}" -> s"${a.ndv}:${a.nulls}:${a.avgLen}:${a.maxLen}"
    }.toMap
    t.commit { fresh =>
      fresh.copy(properties = fresh.properties ++ props +
        (SnapshotProp -> fresh.currentSnapshotId.getOrElse(0L).toString))
    }
    (rows, targets.map(_.name))
  }

  /** Catalyst-typed min/max from the canonical footer-stat encoding
    * (epoch day/micros for temporal types) — only for types whose
    * catalyst value is a primitive the stats estimator accepts. */
  private def catalystValue(dt: DataType, s: String): Option[Any] =
    try dt match {
      case ByteType => Some(java.lang.Byte.valueOf(s.toByte))
      case ShortType => Some(java.lang.Short.valueOf(s.toShort))
      case IntegerType | DateType => Some(Integer.valueOf(s.toInt))
      case LongType | TimestampType | TimestampNTZType =>
        Some(java.lang.Long.valueOf(s.toLong))
      case FloatType => Some(java.lang.Float.valueOf(s.toFloat))
      case DoubleType => Some(java.lang.Double.valueOf(s.toDouble))
      case _ => None
    } catch { case _: NumberFormatException => None }

  /** Merge analyzed NDVs with per-file exact stats for the CURRENT file
    * set: null counts and min/max come from footer stats when every live
    * file carries them (exact and fresh even after later loads), NDV and
    * length stats from the last ANALYZE. Columns with neither source are
    * omitted. */
  def columnStats(schema: StructType, properties: Map[String, String],
      files: Seq[DataFile]):
      java.util.Map[NamedReference, ColumnStatistics] = {
    val out = new java.util.HashMap[NamedReference, ColumnStatistics]()
    schema.fields.foreach { f =>
      val analyzed = properties.get(s"$PropPrefix${f.name}").flatMap(parse)
      val perFile = files.flatMap(_.stats.get(f.name))
      val exactNulls =
        if (files.nonEmpty && perFile.length == files.length &&
            perFile.forall(_.nullCount.isDefined))
          Some(perFile.flatMap(_.nullCount).sum)
        else None
      val mins = perFile.flatMap(_.min.flatMap(catalystValue(f.dataType, _)))
      val maxs = perFile.flatMap(_.max.flatMap(catalystValue(f.dataType, _)))
      val num = (x: Any) => x.asInstanceOf[Number].doubleValue()
      val minV =
        if (mins.length == files.length && files.nonEmpty) mins.minByOption(num)
        else None
      val maxV =
        if (maxs.length == files.length && files.nonEmpty) maxs.maxByOption(num)
        else None
      if (analyzed.isDefined || exactNulls.isDefined) {
        out.put(Expressions.column(f.name), new ColumnStatistics {
          override def distinctCount(): OptionalLong =
            analyzed.filter(_.ndv >= 0)
              .map(a => OptionalLong.of(a.ndv)).getOrElse(OptionalLong.empty())
          override def nullCount(): OptionalLong =
            exactNulls.orElse(analyzed.filter(_.nulls >= 0).map(_.nulls))
              .map(OptionalLong.of).getOrElse(OptionalLong.empty())
          override def min(): Optional[AnyRef] =
            minV.map(v => Optional.of(v.asInstanceOf[AnyRef]))
              .getOrElse(Optional.empty())
          override def max(): Optional[AnyRef] =
            maxV.map(v => Optional.of(v.asInstanceOf[AnyRef]))
              .getOrElse(Optional.empty())
          override def avgLen(): OptionalLong =
            analyzed.filter(_.avgLen >= 0)
              .map(a => OptionalLong.of(a.avgLen)).getOrElse(OptionalLong.empty())
          override def maxLen(): OptionalLong =
            analyzed.filter(_.maxLen >= 0)
              .map(a => OptionalLong.of(a.maxLen)).getOrElse(OptionalLong.empty())
        })
      }
    }
    out
  }

  /** Whether the table carries any analyzed column stats at all (cheap
    * gate before wrapping scans). */
  def hasStats(properties: Map[String, String]): Boolean =
    properties.keys.exists(_.startsWith(PropPrefix))
}

/** Forwarding scan that enriches the inner scan's statistics with
  * column-level stats and the engine's exact row count (Spark's parquet
  * V2 scan reports only bytes; CBO cardinality estimation starts from
  * rows) — used on the plain (non-SPJ) hot path when CBO is enabled.
  * Case class so exchange reuse between identical scans is preserved. */
final case class ColStatsScan(inner: Scan,
    colStats: java.util.Map[NamedReference, ColumnStatistics],
    exactRows: Long)
  extends Scan with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  // Runtime filtering must survive the wrap: without this delegation,
  // enabling CBO would silently disable runtime filtering on the clean
  // scan path. A V1 SupportsRuntimeFiltering inner converts through its
  // inherited default filter(Predicate[]).
  override def filterAttributes(): Array[NamedReference] = inner match {
    case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
      f.filterAttributes()
    case _ => Array.empty
  }
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]):
      Unit = inner match {
    case f: org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering =>
      f.filter(predicates)
    case _ => ()
  }

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = inner.description()
  override def toBatch: Batch = inner.toBatch
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
  override def supportedCustomMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    inner.reportDriverMetrics()

  override def estimateStatistics(): Statistics = {
    val base = inner match {
      case s: SupportsReportStatistics => s.estimateStatistics()
      case _ => new Statistics {
        override def sizeInBytes = OptionalLong.empty()
        override def numRows = OptionalLong.empty()
      }
    }
    new Statistics {
      override def sizeInBytes: OptionalLong = base.sizeInBytes()
      override def numRows: OptionalLong =
        if (base.numRows().isPresent) base.numRows()
        else OptionalLong.of(exactRows)
      override def columnStats():
          java.util.Map[NamedReference, ColumnStatistics] = colStats
    }
  }
}
