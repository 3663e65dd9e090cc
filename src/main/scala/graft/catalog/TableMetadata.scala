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
  * (`destination_client.py:977-1024`).
  *
  * The file list lives in immutable [[ManifestIO]] manifest files
  * referenced by path; unchanged file groups are REUSED across snapshots,
  * so commit IO is proportional to the files that changed, never the
  * table's file count times history depth. `files` carries the legacy
  * inline form for metadata written before manifests existed. */
final case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // append | overwrite | delete-insert | upsert
    loadId: Option[String],
    manifests: Option[Seq[String]] = None,
    files: Option[Seq[DataFile]] = None) {
  def dataFiles: Seq[DataFile] =
    files.getOrElse(manifests.getOrElse(Nil).flatMap(ManifestIO.read))
  def manifestPaths: Seq[String] = manifests.getOrElse(Nil)
  def rowCount: Long = dataFiles.map(_.rowCount).sum
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
    currentSnapshot.map(_.dataFiles).getOrElse(Nil)

  def withSchema(s: StructType): TableMetadata =
    copy(schemaJson = s.json, schemaVersion = schemaVersion + 1)

  def nextSnapshotId: Long =
    snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1L

  /** Append a snapshot holding exactly `files` and make it current.
    *
    * Manifest reuse: any parent manifest whose files ALL appear unchanged
    * in the new file set is carried over by reference; only the remainder
    * is written as one new manifest. An append therefore writes one
    * manifest of the staged files, a merge rewrites only the manifests
    * that lost a file, and an overwrite writes one fresh manifest —
    * commit IO tracks the delta, not the table size. */
  def withSnapshot(op: String, loadId: Option[String], files: Seq[DataFile],
      nowMs: Long = System.currentTimeMillis()): TableMetadata = {
    val metadataDir = java.nio.file.Paths.get(location).resolve("metadata")
    var remaining = files.map(f => f.path -> f).toMap
    val reused = currentSnapshot.toSeq.flatMap(_.manifestPaths).filter { mp =>
      val mfiles = ManifestIO.read(mp)
      val allPresent = mfiles.nonEmpty &&
        mfiles.forall(f => remaining.get(f.path).contains(f))
      if (allPresent) mfiles.foreach(f => remaining -= f.path)
      allPresent
    }
    // preserve input order for the files not covered by reused manifests
    val rest = files.filter(f => remaining.contains(f.path))
    val manifests = reused ++
      (if (rest.nonEmpty) Seq(ManifestIO.write(metadataDir, rest)) else Nil)
    val snap = Snapshot(nextSnapshotId, currentSnapshotId, nowMs, op, loadId,
      manifests = Some(manifests))
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
