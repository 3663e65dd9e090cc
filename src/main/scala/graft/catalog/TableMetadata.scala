package graft.catalog

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Per-column min/max/null stats for one data file, stored as strings and
  * re-typed through the table schema on use. Powers file pruning (the Spark
  * analogue of the reference's PyIceberg manifest pruning on
  * `row_filter` scans, `destination_client.py:320-322`). `bloom` is an
  * optional base64 [[KeyBloom]] filter for point-lookup pruning on
  * columns whose min/max spans the keyspace (UUID keys). */
final case class ColumnStats(
    min: Option[String],
    max: Option[String],
    nullCount: Option[Long],
    bloom: Option[String] = None)

final case class DataFile(
    path: String,
    rowCount: Long,
    sizeBytes: Long,
    stats: Map[String, ColumnStats])

/** One table snapshot = the complete file list after a load — 1 snapshot
  * per table per load, the reference's atomicity invariant
  * (`destination_client.py:977-1024`). */
final case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // append | overwrite | delete-insert | upsert
    loadId: Option[String],
    files: Seq[DataFile]) {
  def rowCount: Long = files.map(_.rowCount).sum
}

/** Partition spec entry: `name = transform(source)` — the shape the
  * reference builds in `build_partition_spec`
  * (`partition_builder.py:136-209`). `param` carries bucket N / truncate W. */
final case class PartitionFieldSpec(
    source: String,
    transform: String,
    param: Option[Int],
    name: String)

/** Full table metadata, persisted as `metadata/v<N>.metadata.json` — our
  * Iceberg-spec-inspired layer (SURVEY §7.0), discovery-compatible with the
  * reference's newest-metadata-file resolution (`sql_client.py:151-222`). */
final case class TableMetadata(
    formatVersion: Int,
    identifier: String,
    location: String,
    schemaJson: String,
    schemaVersion: Int,
    partitionSpec: Seq[PartitionFieldSpec],
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[Snapshot]) {

  lazy val schema: StructType =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]

  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))

  def currentFiles: Seq[DataFile] =
    currentSnapshot.map(_.files).getOrElse(Nil)

  def withSchema(s: StructType): TableMetadata =
    copy(schemaJson = s.json, schemaVersion = schemaVersion + 1)

  def nextSnapshotId: Long =
    snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1L

  /** Append a snapshot and make it current. */
  def withSnapshot(op: String, loadId: Option[String], files: Seq[DataFile],
      nowMs: Long = System.currentTimeMillis()): TableMetadata = {
    val snap = Snapshot(nextSnapshotId, currentSnapshotId, nowMs, op, loadId, files)
    copy(currentSnapshotId = Some(snap.snapshotId), snapshots = snapshots :+ snap)
  }
}

object TableMetadata {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  def toJson(m: TableMetadata): String =
    JsonMethods.pretty(Extraction.decompose(m))

  def fromJson(json: String): TableMetadata =
    JsonMethods.parse(json).extract[TableMetadata]

  def create(identifier: String, location: String, schema: StructType,
      spec: Seq[PartitionFieldSpec], properties: Map[String, String]): TableMetadata =
    TableMetadata(
      formatVersion = 1,
      identifier = identifier,
      location = location,
      schemaJson = schema.json,
      schemaVersion = 1,
      partitionSpec = spec,
      properties = properties,
      currentSnapshotId = None,
      snapshots = Nil)
}
