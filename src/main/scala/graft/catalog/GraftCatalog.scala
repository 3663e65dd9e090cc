package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** File-backed catalog: the warehouse directory IS the catalog (like
  * Iceberg's HadoopCatalog). Location layout `{warehouse}/{namespace}/
  * {table}` follows the reference's `_get_table_location`
  * (`destination_client.py:736-766`); discovery walks for
  * `metadata/v*.metadata.json` like `_register_tables_from_storage`
  * (`destination_client.py:768-851`).
  */
final class GraftCatalog(val spark: SparkSession, warehouse: String) {

  val warehousePath: Path = Paths.get(warehouse)
  Files.createDirectories(warehousePath)
  // engine expressions (iceberg_bucket, ...) resolve via the session registry
  graft.functions.GraftFunctions.register(spark)

  private def nsDir(ns: String): Path = warehousePath.resolve(ns)
  private def tableDir(ns: String, table: String): Path = nsDir(ns).resolve(table)
  private def ident(ns: String, table: String) = s"$ns.$table"

  // --- namespaces (destination_client.py:853-880) ---

  def createNamespace(ns: String): Unit = Files.createDirectories(nsDir(ns))

  def namespaceExists(ns: String): Boolean = Files.isDirectory(nsDir(ns))

  def listNamespaces(): Seq[String] =
    if (!Files.isDirectory(warehousePath)) Nil
    else Files.list(warehousePath).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted

  def dropNamespace(ns: String, cascade: Boolean = false): Unit = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceError(ns)
    if (!cascade && listTables(ns).nonEmpty) throw new NamespaceNotEmptyError(ns)
    deleteRecursively(nsDir(ns))
  }

  // --- tables ---

  def createTable(ns: String, table: String, schema: StructType,
      spec: Seq[PartitionFieldSpec] = Nil,
      properties: Map[String, String] = Map.empty,
      location: Option[String] = None): GraftTable = {
    createNamespace(ns) // auto-create, like initialize_storage
    val dir = location.map(Paths.get(_)).getOrElse(tableDir(ns, table))
    if (Files.exists(dir.resolve("metadata").resolve("v1.metadata.json")))
      throw new TableAlreadyExistsError(ident(ns, table))
    val m = TableMetadata.create(ident(ns, table), dir.toString, schema, spec, properties)
    GraftTable.create(spark, dir, m)
  }

  def loadTable(ns: String, table: String): GraftTable = {
    val dir = tableDir(ns, table)
    val t = new GraftTable(spark, dir)
    if (t.currentVersion < 1) throw new NoSuchTableError(ident(ns, table))
    t
  }

  def tableExists(ns: String, table: String): Boolean =
    new GraftTable(spark, tableDir(ns, table)).currentVersion >= 1

  def listTables(ns: String): Seq[String] =
    if (!Files.isDirectory(nsDir(ns))) Nil
    else Files.list(nsDir(ns)).iterator().asScala
      .filter(d => Files.exists(d.resolve("metadata").resolve("v1.metadata.json")))
      .map(_.getFileName.toString).toSeq.sorted

  /** Drop a table. `purge` also deletes data files — the reference prefers
    * `purge_table` in `drop_tables` (`destination_client.py:892-931`);
    * plain drop removes only the catalog entry (metadata). */
  def dropTable(ns: String, table: String, purge: Boolean = true): Unit = {
    if (!tableExists(ns, table)) throw new NoSuchTableError(ident(ns, table))
    val dir = tableDir(ns, table)
    if (purge) deleteRecursively(dir)
    else deleteRecursively(dir.resolve("metadata"))
  }

  /** Logical truncate: commit a snapshot referencing no files; history is
    * retained for time travel (SURVEY S6/S9). */
  def truncateTable(ns: String, table: String): Unit =
    loadTable(ns, table).commit(_.withSnapshot("overwrite", None, Nil))

  def dropStorage(): Unit =
    listNamespaces().foreach(ns => dropNamespace(ns, cascade = true))

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
}
