package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.sql.{Connection, DriverManager}

/** SQL-backed catalog store — the reference's `sqlite://` catalog kind
  * (`destination_client.py:679-734`) re-based onto the JVM: the embedded
  * SQL engine is Apache Derby (shipped with Spark, filesystem-local, no
  * egress), playing exactly the role sqlite plays for PyIceberg's
  * SqlCatalog.
  *
  * Layout split, matching Iceberg's JdbcCatalog semantics:
  *  - DATA and metadata JSON live in the warehouse directory with the
  *    same per-table layout as [[GraftCatalog]] — except metadata files
  *    are UUID-named and non-authoritative;
  *  - the AUTHORITY is the SQL pointer row: `GRAFT_TABLES(ns, name,
  *    metadata_location)`. A commit writes a fresh metadata file under a
  *    unique name, then compare-and-swaps the pointer in one UPDATE
  *    (`WHERE metadata_location = <planned-from>`); zero rows updated =
  *    conflict, the loser deletes its orphan file, refreshes, rebases,
  *    and retries — the same refresh-before-retry recovery as the file
  *    catalog's CREATE_NEW CAS, but valid on storage WITHOUT atomic
  *    create (object stores), because the decision happens in the
  *    transactional store, never in the filesystem.
  *
  * At 100 TB this is the deployment shape for S3-class storage: commit
  * traffic is one small row CAS per load against the SQL store, data IO
  * goes straight to storage, and nothing scales with table count but
  * rows in two tiny registry tables. */
final class SqlCatalogStore(dbPath: String, val warehouse: Path) {

  private val jdbcUrl = s"jdbc:derby:$dbPath;create=true"

  // Derby's embedded driver registers on first class touch
  Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
  initSchema()

  private def withConn[T](f: Connection => T): T = {
    val c = DriverManager.getConnection(jdbcUrl)
    try f(c) finally c.close()
  }

  private def initSchema(): Unit = withConn { c =>
    val existing = {
      val rs = c.getMetaData.getTables(null, null, "GRAFT_TABLES", null)
      try rs.next() finally rs.close()
    }
    if (!existing) {
      val st = c.createStatement()
      try {
        st.executeUpdate(
          "CREATE TABLE graft_namespaces (ns VARCHAR(255) PRIMARY KEY)")
        st.executeUpdate(
          """CREATE TABLE graft_tables (
            |  ns VARCHAR(255) NOT NULL,
            |  name VARCHAR(255) NOT NULL,
            |  metadata_location VARCHAR(1024) NOT NULL,
            |  PRIMARY KEY (ns, name))""".stripMargin)
      } finally st.close()
    }
  }

  // ---- namespaces ----------------------------------------------------

  def createNamespace(ns: String): Unit = withConn { c =>
    val ps = c.prepareStatement(
      "INSERT INTO graft_namespaces (ns) VALUES (?)")
    try { ps.setString(1, ns); ps.executeUpdate(); () }
    catch {
      case _: java.sql.SQLIntegrityConstraintViolationException =>
        throw new ValidationError(s"namespace $ns already exists")
    } finally ps.close()
  }

  def namespaceExists(ns: String): Boolean = withConn { c =>
    val ps = c.prepareStatement(
      "SELECT 1 FROM graft_namespaces WHERE ns = ?")
    try { ps.setString(1, ns); val rs = ps.executeQuery()
      try rs.next() finally rs.close() } finally ps.close()
  }

  def listNamespaces(): Seq[String] = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery("SELECT ns FROM graft_namespaces ORDER BY ns")
      val b = Seq.newBuilder[String]
      try { while (rs.next()) b += rs.getString(1) } finally rs.close()
      b.result()
    } finally st.close()
  }

  // ---- tables --------------------------------------------------------

  def tableDir(ns: String, name: String): Path =
    warehouse.resolve(ns).resolve(name)

  private def writeMetadataFile(ns: String, name: String,
      m: TableMetadata): String = {
    val dir = tableDir(ns, name).resolve("metadata")
    Files.createDirectories(dir)
    val p = dir.resolve(
      s"${java.util.UUID.randomUUID().toString.take(12)}.metadata.json")
    Files.write(p, TableMetadata.toJson(m).getBytes(UTF_8))
    p.toString
  }

  def createTable(ns: String, name: String, m: TableMetadata): Unit = {
    // idempotent ensure: two concurrent createTable calls for a new
    // namespace race the check-then-act — the loser's duplicate-key
    // error means the namespace now exists, which is what it wanted
    if (!namespaceExists(ns))
      try createNamespace(ns) catch { case _: ValidationError => () }
    val loc = writeMetadataFile(ns, name, m)
    withConn { c =>
      val ps = c.prepareStatement(
        "INSERT INTO graft_tables (ns, name, metadata_location) VALUES (?, ?, ?)")
      try { ps.setString(1, ns); ps.setString(2, name); ps.setString(3, loc)
        ps.executeUpdate(); () }
      catch {
        case _: java.sql.SQLIntegrityConstraintViolationException =>
          Files.deleteIfExists(Paths.get(loc))
          throw new TableAlreadyExistsError(s"$ns.$name")
      } finally ps.close()
    }
  }

  def tableExists(ns: String, name: String): Boolean =
    metadataLocation(ns, name).isDefined

  def listTables(ns: String): Seq[String] = withConn { c =>
    val ps = c.prepareStatement(
      "SELECT name FROM graft_tables WHERE ns = ? ORDER BY name")
    try {
      ps.setString(1, ns)
      val rs = ps.executeQuery()
      val b = Seq.newBuilder[String]
      try { while (rs.next()) b += rs.getString(1) } finally rs.close()
      b.result()
    } finally ps.close()
  }

  def metadataLocation(ns: String, name: String): Option[String] = withConn { c =>
    val ps = c.prepareStatement(
      "SELECT metadata_location FROM graft_tables WHERE ns = ? AND name = ?")
    try {
      ps.setString(1, ns); ps.setString(2, name)
      val rs = ps.executeQuery()
      try { if (rs.next()) Some(rs.getString(1)) else None } finally rs.close()
    } finally ps.close()
  }

  def loadMetadata(ns: String, name: String): TableMetadata = {
    val loc = metadataLocation(ns, name).getOrElse(
      throw new NoSuchTableError(s"$ns.$name"))
    TableMetadata.fromJson(
      new String(Files.readAllBytes(Paths.get(loc)), UTF_8))
  }

  /** Atomic commit through the pointer CAS: refresh, rebase via
    * `update`, publish a fresh metadata file, swap the pointer iff it
    * still names the refreshed file. Same retry taxonomy as
    * [[GraftTable.commit]]. */
  def commit(ns: String, name: String,
      update: TableMetadata => TableMetadata,
      maxRetries: Int = 5, backoffBase: Double = 2.0,
      unitMs: Long = 1000L): TableMetadata =
    Retry.withRetries(maxRetries, backoffBase, unitMs) { () =>
      val from = metadataLocation(ns, name).getOrElse(
        throw new NoSuchTableError(s"$ns.$name"))
      val fresh = TableMetadata.fromJson(
        new String(Files.readAllBytes(Paths.get(from)), UTF_8))
      val next = update(fresh)
      val loc = writeMetadataFile(ns, name, next)
      val swapped = withConn { c =>
        val ps = c.prepareStatement(
          """UPDATE graft_tables SET metadata_location = ?
            |WHERE ns = ? AND name = ? AND metadata_location = ?""".stripMargin)
        try {
          ps.setString(1, loc); ps.setString(2, ns)
          ps.setString(3, name); ps.setString(4, from)
          ps.executeUpdate() == 1
        } finally ps.close()
      }
      if (!swapped) {
        Files.deleteIfExists(Paths.get(loc)) // orphan from the lost race
        throw new CommitConflictError(s"$ns.$name", -1, null)
      }
      next
    }

  def dropTable(ns: String, name: String): Boolean = withConn { c =>
    val ps = c.prepareStatement(
      "DELETE FROM graft_tables WHERE ns = ? AND name = ?")
    try { ps.setString(1, ns); ps.setString(2, name)
      ps.executeUpdate() == 1 } finally ps.close()
  }
}
