package graft.catalog

import java.util.{Set => JSet}
import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** The V2 table handed out by [[GraftSparkCatalog]]: reads delegate to a
  * snapshot-pinned V2 parquet table (pushdown, pruning, sparse
  * null-fill), and SQL writes route through the ENGINE's write path via
  * the V1Write shim — `INSERT INTO` is an Append load and
  * `INSERT OVERWRITE` a Replace load, so SQL ingestion gets the same
  * safe-casting, schema-evolution, staging stats, and atomic CAS commit
  * as programmatic loads (a raw file-writing V2 sink would bypass all of
  * it). Merge keeps requiring the programmatic API: a bare INSERT
  * carries no primary-key/disposition contract.
  *
  * Merge-on-read snapshots (outstanding equality [[DeleteFile]]s) cannot
  * be served by a raw parquet scan — that would resurrect deleted rows —
  * so the scan falls back to a V1 relation wrapping [[MorRead]] (filters
  * re-applied by Spark above it; parquet-level pushdown returns after
  * `Maintenance.applyDeletes`). */
final class GraftV2Table(
    ns: String,
    tableName: String,
    cat: GraftCatalog,
    reader: Table,
    committedSchema: StructType,
    morFiles: Seq[DataFile] = Nil,
    morDeletes: Seq[DeleteFile] = Nil) extends Table with SupportsRead with SupportsWrite {

  override def name(): String = reader.name()
  override def schema(): StructType = committedSchema

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    if (morDeletes.isEmpty)
      reader.asInstanceOf[SupportsRead].newScanBuilder(options)
    else new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = committedSchema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = committedSchema
            override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
              MorRead.read(context.sparkSession, committedSchema,
                morFiles, morDeletes).rdd
          }.asInstanceOf[T]
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data, _) => {
            val w = new graft.write.GraftWriter(cat)
            w.writeTable(ns, tableName, Seq(data),
              if (overwrite) graft.write.Replace else graft.write.Append,
              graft.write.WriteConfig(retryUnitMs = 50),
              loadId = s"sql-${java.util.UUID.randomUUID().toString.take(12)}")
            ()
          }
      }
    }
}
