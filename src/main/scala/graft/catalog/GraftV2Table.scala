package graft.catalog

import java.util.{Set => JSet}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
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
  * carries no primary-key/disposition contract. */
final class GraftV2Table(
    ns: String,
    tableName: String,
    cat: GraftCatalog,
    reader: Table,
    committedSchema: StructType) extends Table with SupportsRead with SupportsWrite {

  override def name(): String = reader.name()
  override def schema(): StructType = committedSchema

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    reader.asInstanceOf[SupportsRead].newScanBuilder(options)

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
