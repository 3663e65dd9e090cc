package graft.catalog

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, SupportsDelta, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL `UPDATE` / `MERGE INTO` through the V2 catalog — the group-based
  * (copy-on-write) row-level operation protocol. Spark rewrites the DML
  * into a [[org.apache.spark.sql.connector.read.Scan]] of the table's
  * pinned snapshot followed by a `ReplaceData` write of the post-DML row
  * set; this class supplies the executor-side write: each task streams
  * its partition into ONE staged parquet file (Spark's own codegen'd
  * parquet writer — no per-row driver involvement), and commit folds
  * footer stats and swaps the SCANNED file set for the staged one
  * through the snapshot CAS protocol. The reference reaches the same end
  * state via PyIceberg upsert (`destination_client.py:1437-1469`) with
  * delete-expression pushdown narrowing the rewrite
  * (`merge_utils.py:17-42`); here the whole operation stays declarative
  * so Catalyst plans the join/update itself.
  *
  * Scale shape — GROUP granularity is the FILE, not the table. The
  * operation scan ([[GroupScan]]) narrows the rewrite twice:
  *
  *  - statically: pushed DML predicates prune candidate files through
  *    the per-file min/max/bloom stats ([[StatsPrune]]);
  *  - at runtime ([[SupportsRuntimeV2Filtering]] on `_file`): Spark's
  *    row-level group filtering runs the matching-rows subquery
  *    (target ⋈ source for MERGE, the WHERE for UPDATE) and delivers
  *    the distinct origin files of matched rows — only those files are
  *    scanned, rewritten, and replaced; every other file survives the
  *    commit BY PATH, untouched on disk.
  *
  * So a MERGE touching 0.1% of rows rewrites ~0.1% of files instead of
  * 100%. Tables with OUTSTANDING merge-on-read deletes fall back to the
  * full-group V1 scan (deletes applied in the scan; the rewrite clears
  * them) — compaction restores the narrowed path.
  *
  * Concurrency: commit refuses when the live file set OR delete set no
  * longer equals the planning snapshot's (the scan's row basis) — the
  * same staleness rule as compaction and `deleteWhere`. */
final class GraftRowLevelOperation(
    ns: String,
    tableName: String,
    cat: GraftCatalog,
    scanOf: CaseInsensitiveStringMap => ScanBuilder,
    tableSchema: StructType,
    cmd: RowLevelOperation.Command,
    snapshotFiles: Seq[DataFile],
    plannedDeletePaths: Set[String]) extends RowLevelOperation {

  private val useGroupScan = plannedDeletePaths.isEmpty
  private val state = new GroupScanState(snapshotFiles)

  override def command(): RowLevelOperation.Command = cmd

  /** `_file` rides along with every scanned row so the runtime group
    * filter can resolve it on the operation relation (and the write
    * exec's metadata projection strips it before rows reach the
    * writer). Only on the group-scan path — the V1 fallback cannot
    * serve per-row metadata through `ReplaceData`. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (useGroupScan) Array(Expressions.column(GroupScan.FileColumn))
    else Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    if (useGroupScan)
      new GroupScanBuilder(SparkSession.active, tableSchema, state)
    else GraftV2Table.wrapV1(scanOf(options))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // the DECLARED write layout: authoritative column names for the rows
    // Spark hands the writing task (the table columns, possibly preceded
    // by metadata columns such as the row operation)
    val writeSchema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftReplaceBatchWrite(ns, tableName, cat, tableSchema,
            writeSchema, cmd.toString.toLowerCase,
            snapshotFiles.map(_.path).toSet, plannedDeletePaths,
            if (useGroupScan) Some(state) else None)
      }
    }
  }
}

/** Per-task result: the staged file (empty string when the task saw no
  * rows and wrote nothing) and its row count. */
final case class GraftWriteMessage(path: String, rows: Long)
  extends WriterCommitMessage

final class GraftReplaceBatchWrite(
    ns: String,
    tableName: String,
    cat: GraftCatalog,
    schema: StructType,
    writeSchema: StructType,
    op: String,
    plannedPaths: Set[String],
    plannedDeletePaths: Set[String],
    groupState: Option[GroupScanState] = None) extends BatchWrite {

  private val loadId =
    s"sql-$op-${java.util.UUID.randomUUID().toString.take(12)}"

  private def table: GraftTable = cat.loadTable(ns, tableName)

  private lazy val destDir = {
    val d = table.dataDir.resolve(loadId)
    java.nio.file.Files.createDirectories(d)
    d
  }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // ParquetFileFormat.prepareWrite wires the session's parquet output
    // conf (codec, legacy format, timestamp type, rebase modes) into the
    // job conf and returns the serializable writer factory Spark's own
    // file sink uses — the executor-side writer is exactly the codegen'd
    // ParquetOutputWriter, not a re-implementation
    val owf = new ParquetFileFormat()
      .prepareWrite(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        job, Map.empty, schema)
    new GraftDataWriterFactory(owf,
      new SerializableConfiguration(job.getConfiguration), schema,
      writeSchema, destDir.toString)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.collect { case m: GraftWriteMessage => m }
    val staged = all.filter(m => m.rows > 0 && m.path.nonEmpty)
    val files = staged.map(_.path).sorted.toSeq
    // the replaced set = what the operation scan ACTUALLY read (the
    // written rows are its output): the full planned set on the V1
    // fallback, the statically+runtime narrowed group set otherwise.
    // On the GROUP path a scan that was never planned means ZERO groups
    // were read — Spark's runtime group filtering found no matching
    // files and empty-relation propagation elided the scan subtree
    // entirely (planInputPartitions never ran), so the write's rows are
    // pure inserts. Falling back to plannedPaths there would replace
    // EVERY live file with insert-only output: mass row loss (caught by
    // the model checker's seed-7 pure-insert MERGE on a multi-file
    // table).
    val replaced = groupState match {
      case Some(st) => st.scannedPaths.getOrElse(Set.empty[String])
      case None => plannedPaths
    }
    if (files.isEmpty && replaced.isEmpty) return // zero matched groups
    val t = table
    val spec = t.metadata.partitionSpec
    // partitioned tables need stats over DERIVED transform values (one
    // column-pruned scan); unpartitioned fold straight from footers
    val dataFiles =
      if (files.isEmpty) Nil
      else if (spec.isEmpty) graft.write.FooterStats.collect(files, schema)
      else graft.write.Stager.collectStats(
        SparkSession.active, files, schema, spec)
    t.commit({ fresh =>
      if (fresh.currentFiles.map(_.path).toSet != plannedPaths)
        throw new ValidationError(
          s"SQL $op superseded by a concurrent commit that changed the " +
            "data-file set; re-run the statement")
      val freshDeletes =
        (fresh.currentSnapshot.map(_.deletes).getOrElse(Nil).map(_.path) ++
          fresh.currentSnapshot.map(_.posDeletes).getOrElse(Nil).map(_.path)).toSet
      if (freshDeletes != plannedDeletePaths)
        throw new ValidationError(
          s"SQL $op superseded by a concurrent merge-on-read delete; " +
            "re-run the statement")
      // group replace: the scanned files are rewritten (on the V1
      // fallback that is every planned file, with deletes applied — so
      // outstanding delete files have no remaining victims and clear);
      // files outside the scanned groups survive by path
      fresh.withSnapshotDelta(op, Some(loadId), dataFiles, replaced,
        clearDeletes = replaced == plannedPaths)
    }, maxRetries = 5, backoffBase = 2.0, unitMs = 50L)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.collect { case GraftWriteMessage(p, _) if p.nonEmpty => p }
      .foreach(p =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)))
    ()
  }
}

/** Ships the parquet writer factory + job conf to executors; each task
  * writes at most one file (created lazily, so empty partitions emit
  * nothing). */
final class GraftDataWriterFactory(
    owf: OutputWriterFactory,
    conf: SerializableConfiguration,
    schema: StructType,
    writeSchema: StructType,
    destDir: String) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var writer: OutputWriter = null
      private var path: String = ""
      private var rows = 0L
      private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = null
      private var checkedShape = false

      private def open(): Unit = {
        val ctx = new TaskAttemptContextImpl(conf.value,
          new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP,
            partitionId), (taskId % Int.MaxValue).toInt))
        // taskId in the name keeps speculative/retried attempts distinct;
        // the commit coordinator admits exactly one message per partition
        path = s"$destDir/part-$partitionId-$taskId${owf.getFileExtension(ctx)}"
        writer = owf.newInstance(path, schema, ctx)
      }

      /** Table-column ordinals in the arriving rows, derived BY NAME from
        * the declared write schema when the arity matches it; the one
        * layout Spark hands over undeclared — group-based ReplaceData
        * rows as `[__row_operation:int, <declared cols>]` when the plain
        * writing task runs (its row projection applies only on the
        * metadata path) — is accepted exactly, and anything else fails
        * loudly instead of writing shifted columns. */
      private def resolveLayout(numFields: Int): Unit = {
        val P = org.apache.spark.sql.catalyst.ProjectingInternalRow
        if (numFields == writeSchema.length &&
            schema.fieldNames.forall(writeSchema.fieldNames.contains)) {
          val ord = schema.fieldNames.toIndexedSeq.map(writeSchema.fieldIndex)
          proj = if (ord == schema.indices.toIndexedSeq) null
                 else P(schema, ord)
        } else if (numFields == writeSchema.length + 1 &&
            writeSchema.fieldNames.sameElements(schema.fieldNames)) {
          proj = P(schema, (1 to schema.length).toIndexedSeq)
        } else throw new IllegalStateException(
          s"row-level write layout mismatch: row has $numFields fields, " +
            s"declared write schema is ${writeSchema.catalogString}, " +
            s"table schema is ${schema.catalogString}")
      }

      override def write(row: InternalRow): Unit = {
        if (writer == null) open()
        if (!checkedShape) { checkedShape = true; resolveLayout(row.numFields) }
        if (proj == null) writer.write(row)
        else { proj.project(row); writer.write(proj) }
        rows += 1
      }

      override def commit(): WriterCommitMessage = {
        if (writer != null) writer.close()
        GraftWriteMessage(path, rows)
      }

      override def abort(): Unit = {
        if (writer != null) {
          writer.close()
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
        }
      }

      override def close(): Unit = ()
    }
}

/** Merge-on-read SQL DML — the delta-based row-level protocol
  * ([[SupportsDelta]]), selected by [[GraftV2Table]] when the table
  * carries `graft.delete.mode = merge-on-read` AND a
  * `graft.primary-key` property. Row identity is the PRIMARY KEY (the
  * same equality-delete key model the engine's MoR writes use —
  * Iceberg v2 equality deletes), so no hidden metadata columns are
  * needed: Spark scans ONLY the matched rows, and each task streams
  * its deletes into one tiny equality-delete key file and its
  * inserts/updated rows into one data file. Commit is O(delta):
  * parent data files are never read or rewritten, sequence stamping in
  * `withSnapshotDelta` fences the new delete keys so a batch never
  * deletes its own inserts — exactly the `morCommit` contract, now
  * reachable from SQL UPDATE / MERGE INTO / DELETE.
  *
  * `representUpdateAsDeleteAndInsert = true`: an update IS
  * delete-key + reinsert under equality-delete semantics. */
final class GraftDeltaOperation(
    ns: String,
    tableName: String,
    cat: GraftCatalog,
    scanOf: CaseInsensitiveStringMap => ScanBuilder,
    tableSchema: StructType,
    cmd: RowLevelOperation.Command,
    pk: Seq[String],
    plannedPaths: Set[String],
    plannedDeletePaths: Set[String]) extends SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    pk.map(Expressions.column).toArray

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    GraftV2Table.wrapV1(scanOf(options))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new GraftDeltaBatchWrite(ns, tableName, cat, tableSchema, pk,
            cmd.toString.toLowerCase, plannedPaths, plannedDeletePaths)
      }
    }
}

final case class GraftDeltaMessage(
    dataPath: String, dataRows: Long,
    delPath: String, delRows: Long) extends WriterCommitMessage

final class GraftDeltaBatchWrite(
    ns: String,
    tableName: String,
    cat: GraftCatalog,
    schema: StructType,
    pk: Seq[String],
    op: String,
    plannedPaths: Set[String],
    plannedDeletePaths: Set[String]) extends DeltaBatchWrite {

  private val loadId =
    s"sql-mor-$op-${java.util.UUID.randomUUID().toString.take(12)}"

  private val keySchema =
    StructType(pk.map(n => schema.fields.find(_.name == n).getOrElse(
      throw new ValidationError(
        s"graft.primary-key column '$n' not in table schema"))))

  private def table: GraftTable = cat.loadTable(ns, tableName)

  private lazy val dataDir = {
    val d = table.dataDir.resolve(loadId)
    java.nio.file.Files.createDirectories(d)
    d
  }
  private lazy val delDir = {
    val d = table.dir.resolve("deletes").resolve(loadId)
    java.nio.file.Files.createDirectories(d)
    d
  }

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val spark = SparkSession.active
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val dataJob = Job.getInstance(spark.sessionState.newHadoopConf())
    val dataOwf = new ParquetFileFormat().prepareWrite(spark, dataJob, Map.empty, schema)
    val keyJob = Job.getInstance(spark.sessionState.newHadoopConf())
    val keyOwf = new ParquetFileFormat().prepareWrite(spark, keyJob, Map.empty, keySchema)
    new GraftDeltaWriterFactory(
      dataOwf, new SerializableConfiguration(dataJob.getConfiguration), schema,
      dataDir.toString,
      keyOwf, new SerializableConfiguration(keyJob.getConfiguration), keySchema,
      delDir.toString)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.collect { case m: GraftDeltaMessage => m }
    val t = table
    val spec = t.metadata.partitionSpec
    val dataFiles = {
      val fs = all.filter(m => m.dataRows > 0 && m.dataPath.nonEmpty)
        .map(_.dataPath).sorted.toSeq
      if (fs.isEmpty) Nil
      // partitioned tables need stats over DERIVED transform values so
      // the new files stay prunable (same rule as the CoW path)
      else if (spec.isEmpty) graft.write.FooterStats.collect(fs, schema)
      else graft.write.Stager.collectStats(SparkSession.active, fs, schema, spec)
    }
    val delFiles = {
      val fs = all.filter(m => m.delRows > 0 && m.delPath.nonEmpty)
        .map(_.delPath).sorted.toSeq
      if (fs.isEmpty) Nil
      else graft.write.FooterStats.collect(fs, keySchema)
        .map(f => DeleteFile(f.path, pk, f.rowCount, 0L, f.stats))
    }
    if (dataFiles.isEmpty && delFiles.isEmpty) return
    // O(delta) commit, same shape as morCommit: no parent file is read
    // or rewritten; sequence fencing makes the delete keys apply only to
    // OLDER files, so this batch never deletes its own inserts. UNLIKE
    // blind engine upserts, though, SQL MERGE/UPDATE decisions are
    // predicate-dependent — a concurrent commit that changed the row
    // basis (rewrote files or added deletes) invalidates the matched
    // set, so commit refuses staleness exactly like the CoW path.
    t.commit({ fresh =>
      if (fresh.currentFiles.map(_.path).toSet != plannedPaths)
        throw new ValidationError(
          s"SQL $op (merge-on-read) superseded by a concurrent commit " +
            "that changed the data-file set; re-run the statement")
      val freshDeletes =
        (fresh.currentSnapshot.map(_.deletes).getOrElse(Nil).map(_.path) ++
          fresh.currentSnapshot.map(_.posDeletes).getOrElse(Nil).map(_.path)).toSet
      if (freshDeletes != plannedDeletePaths)
        throw new ValidationError(
          s"SQL $op (merge-on-read) superseded by a concurrent " +
            "merge-on-read delete; re-run the statement")
      fresh.withSnapshotDelta(op, Some(loadId), dataFiles, Set.empty,
        newDeletes = delFiles)
    }, maxRetries = 5, backoffBase = 2.0, unitMs = 50L)
    if (delFiles.nonEmpty)
      graft.write.Maintenance.autoApplyIfNeeded(t, retryUnitMs = 50L)
    graft.write.Maintenance.autoCompactIfNeeded(t, retryUnitMs = 50L)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.collect { case m: GraftDeltaMessage => m }.foreach { m =>
      if (m.dataPath.nonEmpty)
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(m.dataPath))
      if (m.delPath.nonEmpty)
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(m.delPath))
    }
    ()
  }
}

final class GraftDeltaWriterFactory(
    dataOwf: OutputWriterFactory, dataConf: SerializableConfiguration,
    dataSchema: StructType, dataDir: String,
    keyOwf: OutputWriterFactory, keyConf: SerializableConfiguration,
    keySchema: StructType, delDir: String) extends DeltaWriterFactory {

  private final class LazyFile(owf: OutputWriterFactory,
      conf: SerializableConfiguration, schema: StructType, dir: String,
      partitionId: Int, taskId: Long) {
    private var writer: OutputWriter = null
    var path: String = ""
    var rows = 0L
    def write(row: InternalRow): Unit = {
      if (writer == null) {
        val ctx = new TaskAttemptContextImpl(conf.value,
          new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP,
            partitionId), (taskId % Int.MaxValue).toInt))
        path = s"$dir/part-$partitionId-$taskId${owf.getFileExtension(ctx)}"
        writer = owf.newInstance(path, schema, ctx)
      }
      writer.write(row)
      rows += 1
    }
    def close(): Unit = if (writer != null) writer.close()
    def abort(): Unit = {
      close()
      if (path.nonEmpty)
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
    }
  }

  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val data =
        new LazyFile(dataOwf, dataConf, dataSchema, dataDir, partitionId, taskId)
      private val keys =
        new LazyFile(keyOwf, keyConf, keySchema, delDir, partitionId, taskId)

      override def delete(meta: InternalRow, id: InternalRow): Unit =
        keys.write(id)
      override def insert(row: InternalRow): Unit = data.write(row)
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        // not reached with representUpdateAsDeleteAndInsert=true, but
        // the semantics are identical either way
        keys.write(id); data.write(row)
      }
      override def commit(): WriterCommitMessage = {
        data.close(); keys.close()
        GraftDeltaMessage(data.path, data.rows, keys.path, keys.rows)
      }
      override def abort(): Unit = { data.abort(); keys.abort() }
      override def close(): Unit = ()
    }
}
