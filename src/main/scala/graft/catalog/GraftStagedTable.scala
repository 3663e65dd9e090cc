package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.{Set => JSet}
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** How a staged CTAS/RTAS resolves at commit time. */
private[catalog] object StagedMode extends Enumeration {
  val Create, Replace, CreateOrReplace = Value
}

/** Atomic `CREATE TABLE AS SELECT` / `REPLACE TABLE AS SELECT` through
  * Spark's [[org.apache.spark.sql.connector.catalog.StagingTableCatalog]]
  * protocol, built on the engine's own invisibility convention: data
  * files under a table's `data/` directory are dead bytes until a
  * snapshot references them, so the SELECT's output can be fully staged
  * in place and "commit" is a single metadata CAS —
  *
  *  - '''create''': bootstrap `v1.metadata.json` ALREADY CARRYING the
  *    first snapshot, written with `CREATE_NEW` ([[GraftTable.create]]).
  *    Concurrent readers either see no table or the complete one; a
  *    concurrent create loses the CAS and fails. Mirrors the reference's
  *    create-then-append (`destination_client.py:1303-1333`, `:1384`)
  *    collapsed into one atomic publish.
  *  - '''replace''': one snapshot-CAS commit on the EXISTING table that
  *    swaps schema, partition spec, and properties to the new definition
  *    and commits an overwrite snapshot referencing only the staged
  *    files. History survives — time travel to pre-replace snapshots
  *    resolves under their pinned schema versions, like the engine's
  *    Replace disposition (S6: logical truncate retains old files).
  *
  * `abortStagedChanges` deletes exactly this load's staged directory
  * (stage dirs are loadId-prefixed); manifests are only written inside
  * the commit closure, so a failed write leaves no metadata residue.
  *
  * The write itself rides the engine conventions end-to-end:
  * [[graft.cast.SafeCast]] to the declared schema, [[graft.write.Stager]]
  * staging with the value-exact fanout layout (a partitioned CTAS is
  * storage-partitioned-join eligible from birth), footer stats, and
  * bloom filters when `graft.bloom-columns` is declared.
  */
final class GraftStagedTable(
    qualifiedName: String,
    ns: String,
    tableName: String,
    cat: GraftCatalog,
    target: StructType,
    spec: Seq[PartitionFieldSpec],
    transforms: Array[Transform],
    props: Map[String, String],
    location: Option[String],
    mode: StagedMode.Value)
  extends StagedTable with SupportsWrite {

  private val loadId =
    s"ctas-${java.util.UUID.randomUUID().toString.take(12)}"

  /** Final table directory: the existing table's resolved location for a
    * replace, else the declared or default layout. Pinned at stage time
    * so the write and the commit agree. */
  private val dir: Path = {
    val exists = cat.tableExists(ns, tableName)
    if (exists) cat.tableLocation(ns, tableName)
    else location.map(Paths.get(_)).getOrElse(cat.tableLocation(ns, tableName))
  }

  @volatile private var staged: Seq[DataFile] = Nil
  @volatile private var wrote = false

  override def name(): String = qualifiedName
  override def schema(): StructType = target
  override def partitioning(): Array[Transform] = transforms
  override def properties(): java.util.Map[String, String] = props.asJava
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // RTAS plans an OverwriteByExpression(true): replace semantics are
      // the commit's job here, truncation is inherent to the overwrite
      // snapshot, so the flag needs no action
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data, _) => {
            val cast = graft.cast.SafeCast(data, target, strict = true)
            val bloomCols = props.get(graft.write.GraftWriter.BloomColumnsProperty)
              .toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
            val sketchCols = props.get(graft.write.GraftWriter.SketchColumnsProperty)
              .toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
            staged = graft.write.Stager.stage(cast, dir.resolve("data"),
              loadId, spec, bloomColumns = bloomCols,
              sketchColumns = sketchCols,
              // a TBLPROPERTIES-declared sort order applies from the
              // very first (CTAS/RTAS) load, same as later appends
              sortBy = graft.write.GraftWriter.sortOrder(props,
                cast.schema.fieldNames))
            wrote = true
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    require(wrote, s"commitStagedChanges before any write for $qualifiedName")
    val exists = cat.tableExists(ns, tableName)
    mode match {
      case StagedMode.Create if exists =>
        throw new TableAlreadyExistsError(s"$ns.$tableName")
      case StagedMode.Replace if !exists =>
        throw new NoSuchTableError(s"$ns.$tableName")
      case _ => ()
    }
    if (exists) commitReplace() else commitCreate()
  }

  private def commitCreate(): Unit = {
    cat.createNamespace(ns)
    // the manifest this writes lands under dir/metadata BEFORE the v1
    // CAS; if a concurrent create wins the CAS the manifest is an orphan
    // (UUID-named, vacuum-collectable), never a visible table state
    val m = TableMetadata
      .create(s"$ns.$tableName", dir.toString, target, spec, props)
      .withSnapshot("append", Some(loadId), staged)
    GraftTable.create(cat.spark, dir, m)
    // custom location: visibility comes from the catalog pointer, written
    // last (atomic tmp+move) — same publish order as registerTable
    if (location.isDefined &&
        dir.toAbsolutePath.normalize !=
          cat.tableLocation(ns, tableName).toAbsolutePath.normalize)
      cat.registerTable(ns, tableName, dir.toString)
    ()
  }

  private def commitReplace(): Unit = {
    val t = cat.loadTable(ns, tableName)
    t.commit { m =>
      // REPLACE TABLE is definition-level: the new schema/spec/properties
      // win wholesale (no evolution gate — this is DDL, not a load), but
      // schema history is preserved so time travel keeps snapshot-time
      // schemas, and partition-spec history keeps its stats-corruption
      // guards (a historical derived-name reuse still rejects)
      val m1 = if (m.schema == target) m else m.withSchema(target)
      val m2 = if (m.partitionSpec == spec) m1 else m1.withPartitionSpec(spec)
      m2.copy(properties = props)
        .withSnapshotReplace("overwrite", Some(loadId), staged)
    }
    ()
  }

  override def abortStagedChanges(): Unit = {
    val dataDir = dir.resolve("data")
    if (Files.isDirectory(dataDir))
      PathIO.list(dataDir)
        .filter(_.getFileName.toString.startsWith(s"$loadId-"))
        .foreach(PathIO.deleteRecursively)
    // a create that staged into a fresh directory tree removes it again
    // (an existing table's dir always has metadata and survives)
    if (!Files.exists(dir.resolve("metadata")) && Files.isDirectory(dir)) {
      if (Files.isDirectory(dataDir) && PathIO.list(dataDir).isEmpty)
        Files.delete(dataDir)
      if (PathIO.list(dir).isEmpty) Files.delete(dir)
    }
  }
}
