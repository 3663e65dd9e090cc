package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Expression => V2Expression}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned-join support: wraps the hot-path parquet [[Scan]]
  * of a bucket/identity-partitioned table so it reports Spark's
  * `KeyGroupedPartitioning` — two graft tables co-partitioned on the
  * join key then sort-merge join with ZERO shuffle on either side (and a
  * `GROUP BY` on the partition key aggregates exchange-free). This is
  * the DSv2 connector contract Iceberg uses; Spark's own file sources
  * cannot do it, and at 100 TB it deletes the single largest cost of a
  * fact-fact join (re-shuffling both sides on every query) in favor of
  * the layout the writer already paid for once.
  *
  * The per-file partition key comes from commit-time footer stats: the
  * [[graft.write.Stager]] clusters every partitioned write by the
  * derived transform columns, so each data file's derived-column stats
  * have `min == max` — that value IS the file's partition tuple (an
  * all-null source column groups to a null tuple via `nullCount ==
  * rowCount`). Files that predate the current spec (spec evolution) or
  * straddle values make the table ineligible and the scan is returned
  * unwrapped — correctness never depends on the wrap.
  *
  * Split granularity is preserved: each inner [[FilePartition]] is
  * re-cut per key, not collapsed to one partition per key, so when SPJ
  * does not apply the scan parallelism stays byte-sized; Spark's
  * `BatchScanExec.groupPartitions` merges same-key splits only when a
  * key-grouped plan is actually chosen. Gated on
  * `spark.sql.sources.v2.bucketing.enabled` at build() (Spark ignores
  * the report when the flag is off, so an unwrapped scan is the exact
  * pre-SPJ plan). */
object SpjScan {

  /** Wrap `scan` if every partition-spec field is identity/bucket and
    * every current data file carries a decodable single-valued partition
    * tuple; otherwise return `scan` unchanged. */
  def wrap(scan: Scan, spec: Seq[PartitionFieldSpec], schema: StructType,
      files: Seq[DataFile]): Scan = {
    if (spec.isEmpty || files.isEmpty) return scan
    val supported =
      Set("identity", "bucket", "year", "month", "day", "hour", "truncate")
    if (!spec.forall(s => supported.contains(s.transform))) return scan
    // derived stat type per transform — must agree with the canonical
    // stat encoding (TableMetadata.statTypeOf / Stager.statColumn)
    val fieldTypes: Seq[DataType] = spec.map { s =>
      s.transform match {
        case "bucket" | "year" => IntegerType
        case "month" | "hour" => StringType
        case "day" => DateType
        case _ => schema.fields.find(_.name == s.source).map(_.dataType)
          .getOrElse(return scan)
      }
    }
    val decoded: Seq[(String, (String, InternalRow))] = files.map { f =>
      val vals = spec.zip(fieldTypes).map { case (s, dt) =>
        decodeKey(f, s.name, dt).getOrElse(return scan)
      }
      // injective tuple id: length-prefixed value strings (a separator
      // collision would silently merge two partition groups)
      val tupleId = vals.map {
        case null => "~"
        case v => { val s = v.toString; s.length.toString + ":" + s }
      }.mkString("|")
      val row: InternalRow = new GenericInternalRow(vals.toArray)
      normPath(f.path) -> (tupleId, row)
    }
    val keyExprs: Array[V2Expression] = spec.map { s =>
      s.transform match {
        case "bucket" =>
          Expressions.bucket(s.param.getOrElse(return scan), s.source)
        case "year" => Expressions.years(s.source)
        case "month" => Expressions.months(s.source)
        case "day" => Expressions.days(s.source)
        case "hour" => Expressions.hours(s.source)
        // width baked into the function name: a literal-argument report
        // fails Spark's leaves-must-be-join-keys clustering check (see
        // GraftTemporalFunctions.TruncateUnbound)
        case "truncate" => Expressions.apply(
          s"truncate_${s.param.getOrElse(return scan)}",
          Expressions.column(s.source))
        case _ => Expressions.identity(s.source)
      }
    }.toArray
    val nKeys = decoded.map(_._2._1).distinct.size
    new GroupedScan(scan, keyExprs, decoded.toMap, nKeys)
  }

  /** The file's single partition value for one derived column, as a
    * catalyst internal value; None ⇒ ineligible (absent stats, straddling
    * values, partial nulls, or an undecodable type). */
  private def decodeKey(f: DataFile, name: String, dt: DataType): Option[Any] = {
    val st = f.stats.get(name).getOrElse(return None)
    val nulls = st.nullCount.getOrElse(0L)
    if (nulls == f.rowCount && f.rowCount > 0) return Some(null)
    if (nulls != 0L) return None
    (st.min, st.max) match {
      case (Some(lo), Some(hi)) if lo == hi => decodeValue(dt, lo)
      case _ => None
    }
  }

  /** Canonical stat string → catalyst internal value (the encoding
    * [[graft.write.Stager.statColumn]] wrote: epoch-day ints for dates,
    * epoch-micros longs for timestamps). */
  private def decodeValue(dt: DataType, s: String): Option[Any] =
    try dt match {
      case IntegerType | DateType => Some(s.toInt)
      case LongType | TimestampType | TimestampNTZType => Some(s.toLong)
      case ShortType => Some(s.toShort)
      case ByteType => Some(s.toByte)
      case StringType => Some(UTF8String.fromString(s))
      case FloatType => Some(s.toFloat)
      case DoubleType => Some(s.toDouble)
      case d: DecimalType =>
        Some(Decimal(new java.math.BigDecimal(s), d.precision, d.scale))
      case _ => None
    } catch { case _: NumberFormatException => None }

  /** Engine metadata stores plain absolute paths; PartitionedFile carries
    * a URI-ish SparkPath ("file:///..."). Compare on the URI path. */
  private def normPath(p: String): String =
    try {
      val u = new java.net.URI(p)
      if (u.getScheme != null && u.getPath != null) u.getPath else p
    } catch { case _: java.net.URISyntaxException => p }

  private final class GroupedScan(
      inner: Scan,
      keyExprs: Array[V2Expression],
      keyByPath: Map[String, (String, InternalRow)],
      nKeys: Int)
    extends Scan with Batch with SupportsReportPartitioning
      with SupportsReportStatistics {

    override def readSchema(): StructType = inner.readSchema()
    override def description(): String = s"graft-spj ${inner.description()}"
    override def toBatch: Batch = this
    override def columnarSupportMode(): Scan.ColumnarSupportMode =
      inner.columnarSupportMode()
    override def supportedCustomMetrics():
        Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      inner.supportedCustomMetrics()
    override def reportDriverMetrics():
        Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
      inner.reportDriverMetrics()

    /** Join sizing must not degrade under the wrap: forward the parquet
      * scan's exact estimate (broadcast decisions depend on it). */
    override def estimateStatistics(): Statistics = inner match {
      case s: SupportsReportStatistics => s.estimateStatistics()
      case _ => new Statistics {
        override def sizeInBytes = java.util.OptionalLong.empty()
        override def numRows = java.util.OptionalLong.empty()
      }
    }

    override def outputPartitioning(): Partitioning =
      new KeyGroupedPartitioning(keyExprs, nKeys)

    override def createReaderFactory(): PartitionReaderFactory =
      inner.toBatch.createReaderFactory()

    /** Re-cut each inner split on key boundaries, tagging every emitted
      * split with its `HasPartitionKey`. Any file the key map does not
      * cover (never expected — the map is built from the same snapshot
      * file list the parquet table reads) falls back to the inner
      * partitions verbatim rather than planning a wrong grouping. */
    override def planInputPartitions(): Array[InputPartition] = {
      val parts = inner.toBatch.planInputPartitions()
      val out = Array.newBuilder[InputPartition]
      var idx = 0
      parts.foreach {
        case fp: FilePartition =>
          val withKeys = fp.files.map { pf =>
            val k = keyByPath.get(normPath(pf.urlEncodedPath))
              .orElse(keyByPath.get(normPath(
                java.net.URLDecoder.decode(pf.urlEncodedPath, "UTF-8"))))
              .getOrElse(return parts)
            pf -> k
          }
          withKeys.groupBy(_._2._1).foreach { case (_, pairs) =>
            val key = pairs.head._2._2
            out += new FilePartition(idx, pairs.map(_._1)) with HasPartitionKey {
              override def partitionKey(): InternalRow = key
            }
            idx += 1
          }
        case _ => return parts
      }
      out.result()
    }
  }
}
