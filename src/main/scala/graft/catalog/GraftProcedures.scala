package graft.catalog

import java.util.{Collections, Iterator => JIterator}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-maintenance operations as Spark 4 SQL stored procedures
  * (`ProcedureCatalog`), the idiomatic-Spark surface for what the
  * reference delegates to PyIceberg utilities:
  *
  * {{{
  * CALL graft.system.compact('main.users')
  * CALL graft.system.zorder('main.events', 'user_id,ts')
  * CALL graft.system.expire_snapshots('main.users', 5)
  * CALL graft.system.vacuum_orphans('main.users', 0)
  * CALL graft.system.rollback('main.users', 3)
  * CALL graft.system.apply_deletes('main.users')
  * }}}
  *
  * Each call runs the engine-native [[graft.write.Maintenance]] /
  * [[GraftTable]] operation (distributed restage jobs, atomic snapshot
  * commits with rebase-on-conflict) and returns a one-row result via
  * `LocalScan`. Argument coercion, named arguments, and declared
  * defaults are Spark's analyzer's job (`BindProcedures`), not re-done
  * here. */
object GraftProcedures {

  /** Procedure namespace under the catalog: `cat.system.<name>`. */
  val Namespace: Array[String] = Array("system")

  val names: Seq[String] = Seq("compact", "zorder", "expire_snapshots",
    "vacuum_orphans", "rollback", "apply_deletes", "analyze",
    "create_branch", "publish_branch", "drop_branch", "rewrite_manifests",
    "delete_backlog", "file_health", "iceberg_export", "iceberg_attach",
    "prune_signatures", "prune_assignments", "semdedup_health")

  def forName(cat: GraftCatalog, name: String): Option[UnboundProcedure] =
    name match {
      case "compact" => Some(Compact(cat))
      case "zorder" => Some(Zorder(cat))
      case "expire_snapshots" => Some(ExpireSnapshots(cat))
      case "vacuum_orphans" => Some(VacuumOrphans(cat))
      case "rollback" => Some(Rollback(cat))
      case "apply_deletes" => Some(ApplyDeletes(cat))
      case "analyze" => Some(Analyze(cat))
      case "create_branch" => Some(CreateBranch(cat))
      case "publish_branch" => Some(PublishBranch(cat))
      case "drop_branch" => Some(DropBranch(cat))
      case "rewrite_manifests" => Some(RewriteManifests(cat))
      case "delete_backlog" => Some(DeleteBacklog(cat))
      case "file_health" => Some(FileHealth(cat))
      case "iceberg_export" => Some(IcebergExport(cat))
      case "iceberg_attach" => Some(IcebergAttach(cat))
      case "prune_signatures" => Some(PruneSignatures(cat))
      case "prune_assignments" => Some(PruneAssignments(cat))
      case "semdedup_health" => Some(SemDedupHealth(cat))
      case _ => None
    }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def inDefault(name: String, dt: DataType, sql: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(sql).build()

  private def tableOf(cat: GraftCatalog, raw: UTF8String): GraftTable = {
    val parts = String.valueOf(raw).split("\\.")
    require(parts.length == 2,
      s"procedure table argument must be 'namespace.table', got '$raw'")
    cat.loadTable(parts(0), parts(1))
  }

  /** One-row procedure result delivered through the DSv2 local-scan
    * contract (driver-side literals; no job). */
  private final case class Result(schema: StructType, values: Seq[Any])
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] =
      Array(new GenericInternalRow(values.toArray))
  }

  private def one(schema: StructType, values: Any*): JIterator[Scan] =
    Collections.singletonList(Result(schema, values.toSeq): Scan).iterator()

  /** Shared shape: every graft procedure is self-binding (fixed
    * parameter list; Spark coerces arguments to the declared types). */
  private sealed trait GraftProcedure extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  private final case class Compact(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "bin-pack small data files; content-neutral compaction snapshot"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      inDefault("small_file_bytes", LongType, (32L << 20).toString),
      inDefault("target_file_bytes", LongType, (128L << 20).toString))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val compacted = graft.write.Maintenance.compact(t,
        input.getLong(1), input.getLong(2))
      one(StructType(Seq(StructField("compacted", BooleanType, nullable = false))),
        java.lang.Boolean.valueOf(compacted))
    }
  }

  private final case class Zorder(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "zorder"
    override def description(): String =
      "restage data in z-order on the given columns (comma-separated)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("columns", StringType),
      inDefault("target_files", IntegerType, "0"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val cols = String.valueOf(input.getUTF8String(1))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val done = graft.write.Maintenance.zorder(t, cols, input.getInt(2))
      one(StructType(Seq(StructField("reordered", BooleanType, nullable = false))),
        java.lang.Boolean.valueOf(done))
    }
  }

  private final case class ExpireSnapshots(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "expire_snapshots"
    override def description(): String =
      "drop snapshot history beyond keep_last (branch chains protected)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      inDefault("keep_last", IntegerType, "1"),
      // streaming-replay guard override: expiring a streaming batch's
      // snapshot inside the restart window turns a checkpoint replay
      // into a duplicate apply — without force the call refuses
      inDefault("force", BooleanType, "false"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val removed = graft.write.Maintenance.expireSnapshots(t, input.getInt(1),
        force = !input.isNullAt(2) && input.getBoolean(2))
      one(StructType(Seq(StructField("expired", IntegerType, nullable = false))),
        Integer.valueOf(removed.size))
    }
  }

  private final case class VacuumOrphans(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "vacuum_orphans"
    override def description(): String =
      "delete unreferenced data/delete files older than min_age_ms"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      inDefault("min_age_ms", LongType,
        graft.write.Maintenance.DefaultVacuumMinAgeMs.toString))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val deleted = graft.write.Maintenance.vacuumOrphans(t, input.getLong(1))
      one(StructType(Seq(StructField("deleted", IntegerType, nullable = false))),
        Integer.valueOf(deleted.size))
    }
  }

  private final case class Rollback(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "rollback"
    override def description(): String =
      "point the table back at an earlier snapshot (new rollback commit)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("snapshot_id", LongType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val m = t.rollbackTo(input.getLong(1))
      one(StructType(Seq(
        StructField("current_snapshot_id", LongType, nullable = false))),
        java.lang.Long.valueOf(m.currentSnapshotId.getOrElse(-1L)))
    }
  }

  private final case class ApplyDeletes(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "apply_deletes"
    override def description(): String =
      "rewrite merge-on-read delete files into the data files"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val applied = graft.write.Maintenance.applyDeletes(t)
      one(StructType(Seq(StructField("applied", BooleanType, nullable = false))),
        java.lang.Boolean.valueOf(applied))
    }
  }

  /** `CALL cat.system.prune_signatures('ns.docs', 'ns.sigs')` —
    * retention maintenance for the near-dedup state tables: rewrite the
    * signature table (and its `_bands` index, when present) down to the
    * documents still live in the corpus table. The SQL face of
    * [[graft.streaming.StreamingLoader.pruneOrphanSignatures]]. */
  private final case class PruneSignatures(cat: GraftCatalog)
      extends GraftProcedure {
    override def name(): String = "prune_signatures"
    override def description(): String =
      "prune near-dedup signatures/bands of documents erased from the corpus"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("docs_table", StringType), in("sigs_table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      def split(raw: UTF8String): (String, String) = {
        val parts = raw.toString.split("\\.")
        require(parts.length == 2, s"expected ns.table, got $raw")
        (parts(0), parts(1))
      }
      val (dns, docs) = split(input.getUTF8String(0))
      val (sns, sigs) = split(input.getUTF8String(1))
      require(dns == sns, "docs and sigs tables must share a namespace")
      val pruned = new graft.streaming.StreamingLoader(cat)
        .pruneOrphanSignatures(dns, docs, sigs)
      one(StructType(Seq(StructField("pruned", LongType, nullable = false))),
        java.lang.Long.valueOf(pruned))
    }
  }

  /** `CALL cat.system.prune_assignments('ns.vecs', 'ns.assign')` —
    * retention maintenance for the SEMANTIC-dedup state: rewrite the
    * k-means assignment table down to the vectors still live in the
    * corpus table (identity(cluster) layout preserved). The SQL face of
    * [[graft.streaming.StreamingLoader.pruneOrphanAssignments]]. */
  private final case class PruneAssignments(cat: GraftCatalog)
      extends GraftProcedure {
    override def name(): String = "prune_assignments"
    override def description(): String =
      "prune semantic-dedup assignments of vectors erased from the corpus"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("vecs_table", StringType), in("assign_table", StringType),
      inDefault("id_col", StringType, "'vec_id'"))
    override def call(input: InternalRow): JIterator[Scan] = {
      def split(raw: UTF8String): (String, String) = {
        val parts = raw.toString.split("\\.")
        require(parts.length == 2, s"expected ns.table, got $raw")
        (parts(0), parts(1))
      }
      val (vns, vecs) = split(input.getUTF8String(0))
      val (ans, assign) = split(input.getUTF8String(1))
      require(vns == ans, "vecs and assignment tables must share a namespace")
      val idCol =
        if (input.isNullAt(2)) "vec_id" else input.getUTF8String(2).toString
      val pruned = new graft.streaming.StreamingLoader(cat)
        .pruneOrphanAssignments(vns, vecs, assign, idCol = idCol)
      one(StructType(Seq(StructField("pruned", LongType, nullable = false))),
        java.lang.Long.valueOf(pruned))
    }
  }

  /** `CALL cat.system.semdedup_health('ns.assign' [, max_skew])` —
    * the cluster-occupancy maintenance signal for semantic dedup (the
    * `file_health`/`delete_backlog` pattern): per-batch verification
    * cost concentrates as batch_share × max_cluster, so a mega-cluster
    * (skew ≫ 1) is the quadratic failure mode cluster bucketing cannot
    * outrun. `needs_rebalance` true ⇒ re-train with larger k (replace
    * the committed centroid table + one full re-assign commit). */
  private final case class SemDedupHealth(cat: GraftCatalog)
      extends GraftProcedure {
    override def name(): String = "semdedup_health"
    override def description(): String =
      "report semantic-dedup cluster-occupancy skew and whether the " +
        "corpus needs a larger-k re-train"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("assign_table", StringType),
      inDefault("max_skew", DoubleType, "4.0"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val maxSkew =
        if (input.isNullAt(1)) 4.0 else input.getDouble(1)
      val h = graft.llmops.SemanticDedup.clusterHealth(t.read(), maxSkew)
      one(StructType(Seq(
        StructField("n_vectors", LongType, nullable = false),
        StructField("n_clusters", IntegerType, nullable = false),
        StructField("max_cluster", LongType, nullable = false),
        StructField("avg_cluster", DoubleType, nullable = false),
        StructField("skew", DoubleType, nullable = false),
        StructField("needs_rebalance", BooleanType, nullable = false))),
        java.lang.Long.valueOf(h.nVectors),
        Integer.valueOf(h.nClusters),
        java.lang.Long.valueOf(h.maxCluster),
        java.lang.Double.valueOf(h.avgCluster),
        java.lang.Double.valueOf(h.skew),
        java.lang.Boolean.valueOf(h.needsRebalance))
    }
  }

  /** `CALL cat.system.analyze('ns.t' [, 'c1,c2'])` — one distributed
    * pass computing per-column HLL distinct counts (the number CBO needs
    * that per-file footer stats cannot provide), persisted as
    * snapshot-stamped table properties and served to join planning via
    * `Statistics.columnStats` when `spark.sql.cbo.enabled` is on. */
  private final case class Analyze(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "analyze"
    override def description(): String =
      "compute column NDV/null/length statistics for cost-based optimization"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      inDefault("columns", StringType, "''"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val cols =
        if (input.isNullAt(1)) Nil
        else String.valueOf(input.getUTF8String(1))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val (rows, analyzed) = ColumnStatsSupport.analyze(t, cols)
      one(StructType(Seq(
        StructField("rows", LongType, nullable = false),
        StructField("columns", IntegerType, nullable = false))),
        java.lang.Long.valueOf(rows), Integer.valueOf(analyzed.size))
    }
  }

  // Write-audit-publish refs through SQL — the procedure surface over
  // GraftTable.createBranch/publish/dropBranch. A "tag" is a ref the
  // caller never publishes (reads resolve it via VERSION AS OF 'name').

  /** `CALL cat.system.create_branch('ns.t', 'audit' [, from_snapshot])` */
  private final case class CreateBranch(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "create_branch"
    override def description(): String =
      "create a named branch/tag ref at a snapshot (default: current head)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("name", StringType),
      inDefault("from_snapshot", LongType, "-1"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val raw = input.getLong(2)
      val from = if (raw >= 0) Some(raw) else None
      val m = t.createBranch(String.valueOf(input.getUTF8String(1)), from)
      one(StructType(Seq(StructField("at_snapshot", LongType, nullable = false))),
        java.lang.Long.valueOf(
          m.refId(String.valueOf(input.getUTF8String(1))).getOrElse(-1L)))
    }
  }

  /** `CALL cat.system.publish_branch('ns.t', 'audit')` — fast-forward
    * main to the branch head; refuses a diverged main. */
  private final case class PublishBranch(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "publish_branch"
    override def description(): String =
      "fast-forward main to the branch head and drop the ref"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("name", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val m = t.publish(String.valueOf(input.getUTF8String(1)))
      one(StructType(Seq(StructField("head_snapshot", LongType, nullable = false))),
        java.lang.Long.valueOf(m.currentSnapshotId.getOrElse(-1L)))
    }
  }

  /** `CALL cat.system.rewrite_manifests('ns.t')` — metadata-only
    * compaction of the snapshot's manifest-ref list into one manifest;
    * content-neutral, sequence-preserving (MoR delete fencing
    * untouched). */
  private final case class RewriteManifests(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "rewrite_manifests"
    override def description(): String =
      "merge the current snapshot's manifests into one (metadata only)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val done = graft.write.Maintenance.rewriteManifests(t)
      one(StructType(Seq(StructField("rewritten", BooleanType, nullable = false))),
        java.lang.Boolean.valueOf(done))
    }
  }

  /** `CALL cat.system.delete_backlog('ns.t')` — the merge-on-read
    * maintenance signal: metadata-only delete-to-data row accounting,
    * with `needs_maintenance` true once the ratio passes the table's
    * `graft.mor.max-delete-ratio` property or the backlog crosses the
    * scan layer's driver-state gate. Pair with
    * `CALL cat.system.apply_deletes` / `compact` to clear it. */
  private final case class DeleteBacklog(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "delete_backlog"
    override def description(): String =
      "report the outstanding merge-on-read delete backlog and whether it needs maintenance"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val r = graft.write.Maintenance.deleteBacklog(t)
      one(StructType(Seq(
        StructField("data_rows", LongType, nullable = false),
        StructField("delete_rows", LongType, nullable = false),
        StructField("delete_files", IntegerType, nullable = false),
        StructField("ratio", DoubleType, nullable = false),
        StructField("needs_maintenance", BooleanType, nullable = false))),
        java.lang.Long.valueOf(r.dataRows),
        java.lang.Long.valueOf(r.deleteRows),
        Integer.valueOf(r.deleteFileCount),
        java.lang.Double.valueOf(r.ratio),
        java.lang.Boolean.valueOf(r.needsMaintenance))
    }
  }

  /** `CALL cat.system.file_health('ns.t')` — the small-file twin of
    * `delete_backlog`: zero-IO accounting of the live data-file
    * population, with `needs_compaction` true once the count of files
    * under `graft.compact.small-file-bytes` passes
    * `graft.compact.max-small-files`. Pair with `CALL compact` (or the
    * `graft.write.auto-compact` property) to clear it. */
  private final case class FileHealth(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "file_health"
    override def description(): String =
      "report the live data-file population and whether it needs compaction"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val r = graft.write.Maintenance.fileHealth(t)
      one(StructType(Seq(
        StructField("file_count", IntegerType, nullable = false),
        StructField("small_files", IntegerType, nullable = false),
        StructField("avg_file_bytes", LongType, nullable = false),
        StructField("needs_compaction", BooleanType, nullable = false))),
        Integer.valueOf(r.fileCount),
        Integer.valueOf(r.smallFileCount),
        java.lang.Long.valueOf(r.avgFileBytes),
        java.lang.Boolean.valueOf(r.needsCompaction))
    }
  }

  private final case class IcebergExport(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "iceberg_export"
    override def description(): String =
      "export the current snapshot as an Apache Iceberg v2 metadata tree " +
        "(data files referenced in place); returns the metadata.json path"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      val mdPath = graft.iceberg.IcebergInterop.exportTable(t)
      one(StructType(Seq(
        StructField("metadata_json", StringType, nullable = false),
        StructField("data_files", IntegerType, nullable = false))),
        UTF8String.fromString(mdPath.toString),
        Integer.valueOf(t.metadata.currentFiles.size))
    }
  }

  private final case class IcebergAttach(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "iceberg_attach"
    override def description(): String =
      "attach an external Apache Iceberg v2 table as a graft table " +
        "(data files referenced in place, no bytes copied)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("location", StringType),
      // optional: attach a HISTORICAL snapshot of the tree (external
      // time travel into a live table); 0 = current
      inDefault("snapshot_id", LongType, "0"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val parts = String.valueOf(input.getUTF8String(0)).split("\\.")
      require(parts.length == 2,
        s"procedure table argument must be 'namespace.table'")
      val asOf =
        if (input.numFields < 3 || input.isNullAt(2) || input.getLong(2) == 0L)
          None
        else Some(input.getLong(2))
      val t = graft.iceberg.IcebergInterop.importAsTable(cat,
        parts(0), parts(1), String.valueOf(input.getUTF8String(1)), asOf)
      one(StructType(Seq(
        StructField("attached", BooleanType, nullable = false),
        StructField("row_count", LongType, nullable = false))),
        java.lang.Boolean.TRUE, java.lang.Long.valueOf(t.rowCount))
    }
  }

  private final case class DropBranch(cat: GraftCatalog) extends GraftProcedure {
    override def name(): String = "drop_branch"
    override def description(): String = "drop a branch/tag ref (data untouched)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("name", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val t = tableOf(cat, input.getUTF8String(0))
      t.dropBranch(String.valueOf(input.getUTF8String(1)))
      one(StructType(Seq(StructField("dropped", BooleanType, nullable = false))),
        java.lang.Boolean.TRUE)
    }
  }
}
