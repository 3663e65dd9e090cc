package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.catalog.{GraftCatalog, GraftTable}

/** Streaming change-data-feed over a graft table — `changesBetween`
  * exposed as an incremental streaming source (the `readChangeFeed`
  * idea): each micro-batch delivers the change rows between the last
  * processed snapshot and the current one, under the table schema plus
  * `_change_type` (`insert` | `delete`).
  *
  * {{{
  * spark.readStream
  *   .format(classOf[GraftCdcSourceProvider].getName)
  *   .option("warehouse", "/warehouse")
  *   .option("table", "main.events")
  *   .load()
  * }}}
  *
  * Offsets are snapshot ids (monotonic by construction), checkpointed
  * by Spark — a restart resumes from the last COMMITTED snapshot and
  * replays any in-flight window identically (`changesBetween` is a pure
  * function of the two snapshots, so replay is deterministic as long as
  * the window's snapshots are not expired — keep expiry retention above
  * restart latency, the same rule as [[StreamingLoader]]). The first
  * batch bootstraps: the whole starting snapshot surfaces as `insert`
  * rows. Content-neutral rewrites (compact/zorder/apply-deletes) inside
  * a window contribute zero change rows (rewrite-tolerant changelog). */
final class GraftCdcSource(
    ctx: SQLContext,
    warehouse: String,
    ns: String,
    tableName: String) extends Source {

  private def table: GraftTable =
    new GraftCatalog(ctx.sparkSession, warehouse).loadTable(ns, tableName)

  override val schema: StructType = GraftCdcSource.schemaOf(table)

  override def getOffset: Option[Offset] =
    table.metadata.currentSnapshotId.map(new GraftCdcOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val t = table
    val endId = idOf(end)
    val changes = start.map(idOf) match {
      case Some(startId) if startId == endId =>
        t.read().limit(0).withColumn("_change_type", lit(""))
      case Some(startId) => t.changesBetween(startId, endId)
      // bootstrap: the whole starting snapshot is the initial insert set
      case None =>
        t.readSnapshot(endId).withColumn("_change_type", lit("insert"))
    }
    org.apache.spark.sql.classic.GraftSqlShims.asStreaming(changes)
  }

  private def idOf(o: Offset): Long = o match {
    case g: GraftCdcOffset => g.snapshotId
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()
}

/** Snapshot-id offset; json round-trips through the checkpoint log. */
final class GraftCdcOffset(val snapshotId: Long) extends Offset {
  override def json: String = snapshotId.toString
}

object GraftCdcSource {
  def schemaOf(t: GraftTable): StructType =
    StructType(t.metadata.schema.fields :+
      StructField("_change_type", StringType, nullable = false))

  private[streaming] def parse(params: Map[String, String]): (String, String, String) = {
    val wh = params.getOrElse("warehouse", throw new IllegalArgumentException(
      "graft-cdc source requires option 'warehouse'"))
    val full = params.getOrElse("table", throw new IllegalArgumentException(
      "graft-cdc source requires option 'table' as <namespace>.<name>"))
    val i = full.lastIndexOf('.')
    if (i <= 0) throw new IllegalArgumentException(
      s"graft-cdc table must be <namespace>.<name>, got '$full'")
    (wh, full.substring(0, i), full.substring(i + 1))
  }
}

/** V1 stream-source provider (the `FileStreamSource` registration
  * shape): `changesBetween` builds each micro-batch as a DataFrame, so
  * the DataFrame-returning V1 `Source` contract is the natural fit —
  * a partition-level MicroBatchStream cannot express the changelog's
  * delete-key joins. */
final class GraftCdcSourceProvider extends StreamSourceProvider {

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val (wh, ns, name) = GraftCdcSource.parse(parameters)
    ("graft-cdc", GraftCdcSource.schemaOf(
      new GraftCatalog(ctx.sparkSession, wh).loadTable(ns, name)))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (wh, ns, name) = GraftCdcSource.parse(parameters)
    new GraftCdcSource(ctx, wh, ns, name)
  }
}
