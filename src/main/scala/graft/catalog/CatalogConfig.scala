package graft.catalog

import org.apache.spark.sql.SparkSession

/** Catalog kind, auto-detected from the URI scheme exactly like the
  * reference (`destination_client.py:679-690`, `destination.py:143-150`):
  * `sqlite://`/`postgresql://` are SQL catalogs, `http(s)://` are REST,
  * `file://` (or a bare path) is the directory-backed catalog this
  * engine ships. */
sealed trait CatalogKind
object CatalogKind {
  case object FileKind extends CatalogKind
  case object RestKind extends CatalogKind
  case object SqlKind extends CatalogKind
}

/** The full connection/config surface of the reference destination
  * (`destination_client.py:679-734`, mirrored in `destination.py:143-191`):
  * URI + warehouse, OAuth2 client credentials or bearer token, AWS SigV4
  * request signing, and S3-compatible object-store settings.
  *
  * This sandbox has no egress, so only `file://` catalogs can actually be
  * opened; REST/SQL configs parse, validate, and flatten to the same
  * property map the reference hands `load_catalog`, then fail cleanly at
  * `open()` with a `CatalogUnavailableError` naming the kind — the API
  * shape a networked deployment needs, minus the socket.
  */
final case class CatalogConfig(
    uri: String,
    warehouse: Option[String] = None,
    // OAuth2 client credentials ("client_id:client_secret" + token endpoint)
    credential: Option[String] = None,
    oauth2ServerUri: Option[String] = None,
    scope: Option[String] = Some("PRINCIPAL_ROLE:ALL"),
    // or a pre-issued bearer token
    token: Option[String] = None,
    // AWS SigV4 request signing (Glue-style REST catalogs)
    sigv4Enabled: Boolean = false,
    signingRegion: Option[String] = None,
    signingName: String = "execute-api",
    // S3-compatible object-store settings (MinIO etc.)
    s3Endpoint: Option[String] = None,
    s3AccessKeyId: Option[String] = None,
    s3SecretAccessKey: Option[String] = None,
    s3Region: Option[String] = None) {

  def kind: CatalogKind = CatalogConfig.kindOf(uri)

  /** Validate cross-field constraints; returns this for chaining.
    * Mirrors the reference's auth precedence (credential+oauth2 server,
    * else token) but fails loudly where the reference would silently
    * ignore half-configured auth. */
  def validated: CatalogConfig = {
    kind // rejects unknown schemes
    credential.foreach { c =>
      if (!c.contains(":"))
        throw new ValidationError(
          "credential must be \"client_id:client_secret\"")
      if (oauth2ServerUri.isEmpty)
        throw new ValidationError(
          "credential requires oauth2ServerUri (OAuth2 token endpoint)")
    }
    if (credential.nonEmpty && token.nonEmpty)
      throw new ValidationError(
        "configure either OAuth2 credential or bearer token, not both")
    if (sigv4Enabled && kind != CatalogKind.RestKind)
      throw new ValidationError("SigV4 signing applies only to REST catalogs")
    if (kind == CatalogKind.FileKind && warehouse.isEmpty && filePath.isEmpty)
      throw new ValidationError(s"file catalog needs a path: $uri")
    this
  }

  /** The flattened property map the reference passes to `load_catalog`
    * (`destination_client.py:691-734`) — same keys, same conditioning. */
  def properties: Map[String, String] = {
    validated
    val b = Map.newBuilder[String, String]
    b += "type" -> (kind match {
      case CatalogKind.SqlKind => "sql"
      case CatalogKind.RestKind => "rest"
      case CatalogKind.FileKind => "file"
    })
    b += "uri" -> uri
    warehouse.foreach(b += "warehouse" -> _)
    (credential, oauth2ServerUri) match {
      case (Some(c), Some(o)) =>
        b += "credential" -> c
        b += "oauth2-server-uri" -> o
        scope.foreach(b += "scope" -> _)
      case _ => token.foreach(b += "token" -> _)
    }
    if (sigv4Enabled) {
      b += "rest.sigv4-enabled" -> "true"
      signingRegion.foreach(b += "rest.signing-region" -> _)
      b += "rest.signing-name" -> signingName
    }
    s3Endpoint.foreach(b += "s3.endpoint" -> _)
    s3AccessKeyId.foreach(b += "s3.access-key-id" -> _)
    s3SecretAccessKey.foreach(b += "s3.secret-access-key" -> _)
    s3Region.foreach(b += "s3.region" -> _)
    b.result()
  }

  private def filePath: Option[String] = {
    // same single canonicalization rule as every other path boundary
    // (scheme strip + percent decode) — a file: URI with an encoded
    // character must resolve to the real directory
    val p = graft.functions.UriPath.decode(uri)
    if (p.isEmpty || p == "file:") None else Some(p)
  }

  /** Open the catalog. `file://` resolves to the directory-backed
    * [[GraftCatalog]]; REST/SQL validate fully, then fail with a clean,
    * non-retryable error (no connectivity in this environment — use
    * [[openRestClient]] for the REST wire path against an in-process
    * [[RestCatalogServer]]). */
  def open(spark: SparkSession): GraftCatalog = {
    validated
    kind match {
      case CatalogKind.FileKind =>
        new GraftCatalog(spark, warehouse.orElse(filePath).get)
      case k =>
        throw new CatalogUnavailableError(k, uri)
    }
  }

  /** The `sqlite://` scheme's real store: the reference's SQL catalog
    * kind served by the JVM's embedded SQL engine (Apache Derby, shipped
    * with Spark — the same filesystem-local role sqlite plays for
    * PyIceberg). The path after the scheme is the Derby database
    * directory; `warehouse` holds data + metadata files; the commit CAS
    * is a transactional pointer swap in the store (valid on storage
    * without atomic create). */
  def openSqlStore(): SqlCatalogStore = {
    validated
    if (kind != CatalogKind.SqlKind)
      throw new ValidationError(s"not a SQL catalog uri: $uri")
    if (uri.startsWith("postgresql://"))
      throw new CatalogUnavailableError(kind, uri) // needs a network server
    val dbPath = uri.stripPrefix("sqlite:///").stripPrefix("sqlite://")
    val wh = warehouse.getOrElse(
      throw new ValidationError("SQL catalog needs a warehouse path"))
    new SqlCatalogStore(
      java.nio.file.Paths.get("/", dbPath.stripPrefix("/")).toString,
      java.nio.file.Paths.get(wh))
  }

  /** The `rest` scheme's real client: control plane over HTTP (DDL,
    * metadata, commit CAS), data plane direct to storage. Auth follows
    * this config's precedence — OAuth2 client credentials against
    * `oauth2ServerUri`, else the bearer `token`, else anonymous. */
  def openRestClient(): RestCatalogClient = {
    validated
    if (kind != CatalogKind.RestKind)
      throw new ValidationError(s"not a REST catalog uri: $uri")
    RestCatalogClient.connect(this)
  }
}

object CatalogConfig {
  def kindOf(uri: String): CatalogKind =
    if (uri.startsWith("sqlite://") || uri.startsWith("postgresql://"))
      CatalogKind.SqlKind
    else if (uri.startsWith("http://") || uri.startsWith("https://"))
      CatalogKind.RestKind
    else if (uri.startsWith("file://") || uri.startsWith("file:") ||
      uri.startsWith("/") || uri.startsWith("./"))
      CatalogKind.FileKind
    else
      throw new ValidationError(s"Unsupported catalog URI scheme: $uri")
}
