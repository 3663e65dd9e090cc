package graft.catalog

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** In-process Iceberg-REST-shaped catalog server over a graft warehouse
  * (the reference's REST tier, `destination_client.py:679-734`,
  * exercised by `tests/test_destination_rest_catalog.py`). Route shapes
  * follow the Iceberg REST spec (`/v1/config`, `/v1/namespaces`,
  * `/v1/namespaces/{ns}/tables/{t}`, `/v1/oauth/tokens`); payloads are
  * graft-native metadata JSON — this is the engine's own control-plane
  * wire protocol, not a PyIceberg interop layer.
  *
  * The split is the production Iceberg-REST split: the DATA plane
  * (parquet staging, manifest writes) goes direct to storage; only the
  * CONTROL plane (namespace/table DDL, metadata reads, the commit CAS)
  * crosses HTTP. Commit concurrency is a snapshot-id compare-and-swap:
  * the client names the snapshot it built on, the server refuses with
  * 409 when the table moved — same contract as the local CAS loop.
  *
  * JDK `com.sun.net.httpserver`, zero new dependencies; bind to port 0
  * for an ephemeral loopback port. Auth: optional OAuth2 client
  * credentials (the `/v1/oauth/tokens` endpoint issues a bearer) or a
  * pre-shared bearer token; every other route then requires
  * `Authorization: Bearer`. */
final class RestCatalogServer(
    spark: SparkSession,
    warehouse: String,
    credential: Option[String] = None,
    staticToken: Option[String] = None) {

  private implicit val fmts: Formats = DefaultFormats
  private val cat = new GraftCatalog(spark, warehouse)
  private val issued =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  def port: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$port"

  private def authed(ex: HttpExchange): Boolean = {
    if (credential.isEmpty && staticToken.isEmpty) return true
    val h = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    if (!h.startsWith("Bearer ")) return false
    val tok = h.stripPrefix("Bearer ")
    staticToken.contains(tok) || issued.contains(tok)
  }

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def bodyOf(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  /** `/v1/oauth/tokens`: client_credentials grant against the configured
    * `credential` ("id:secret"); issues a random bearer. */
  private def oauth(ex: HttpExchange): Unit = {
    val form = bodyOf(ex).split('&').map(_.split("=", 2))
      .collect { case Array(k, v) =>
        k -> java.net.URLDecoder.decode(v, UTF_8) }.toMap
    val ok = credential.exists { c =>
      val Array(id, secret) = c.split(":", 2)
      form.get("grant_type").contains("client_credentials") &&
        form.get("client_id").contains(id) &&
        form.get("client_secret").contains(secret)
    }
    if (!ok) reply(ex, 401, """{"error":"invalid_client"}""")
    else {
      val tok = java.util.UUID.randomUUID().toString
      issued.add(tok)
      reply(ex, 200,
        s"""{"access_token":"$tok","token_type":"bearer","expires_in":3600}""")
    }
  }

  private def route(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    if (path == "/v1/oauth/tokens" && method == "POST") return oauth(ex)
    if (!authed(ex)) return reply(ex, 401, """{"error":"unauthorized"}""")

    val parts = path.stripPrefix("/").split("/").toList
    (method, parts) match {
      case ("GET", List("v1", "config")) =>
        reply(ex, 200, JsonMethods.compact(JsonMethods.render(
          ("defaults" -> JObject()) ~
            ("overrides" -> ("warehouse" -> warehouse)))))

      case ("GET", List("v1", "namespaces")) =>
        reply(ex, 200, JsonMethods.compact(JsonMethods.render(
          JObject("namespaces" ->
            JArray(cat.listNamespaces().toList.map(n =>
              JArray(List(JString(n)))))))))

      case ("POST", List("v1", "namespaces")) =>
        val ns = (JsonMethods.parse(bodyOf(ex)) \ "namespace")
          .extract[Seq[String]].mkString(".")
        cat.createNamespace(ns)
        reply(ex, 200, s"""{"namespace":["$ns"],"properties":{}}""")

      case ("GET", List("v1", "namespaces", ns)) =>
        if (cat.namespaceExists(ns))
          reply(ex, 200, s"""{"namespace":["$ns"],"properties":{}}""")
        else reply(ex, 404, """{"error":"no such namespace"}""")

      case ("GET", List("v1", "namespaces", ns, "tables")) =>
        if (!cat.namespaceExists(ns))
          reply(ex, 404, """{"error":"no such namespace"}""")
        else reply(ex, 200, JsonMethods.compact(JsonMethods.render(
          JObject("identifiers" -> JArray(cat.listTables(ns).toList.map(t =>
            JObject("namespace" -> JArray(List(JString(ns))),
              "name" -> JString(t))))))))

      case ("POST", List("v1", "namespaces", ns, "tables")) =>
        val j = JsonMethods.parse(bodyOf(ex))
        val name = (j \ "name").extract[String]
        val schema = DataType.fromJson((j \ "schema-json").extract[String])
          .asInstanceOf[StructType]
        if (cat.tableExists(ns, name))
          reply(ex, 409, """{"error":"table exists"}""")
        else {
          val t = cat.createTable(ns, name, schema)
          reply(ex, 200, tableJson(t))
        }

      case ("GET", List("v1", "namespaces", ns, "tables", name)) =>
        if (!cat.tableExists(ns, name))
          reply(ex, 404, """{"error":"no such table"}""")
        else reply(ex, 200, tableJson(cat.loadTable(ns, name)))

      case ("DELETE", List("v1", "namespaces", ns, "tables", name)) =>
        if (!cat.tableExists(ns, name))
          reply(ex, 404, """{"error":"no such table"}""")
        else { cat.dropTable(ns, name); reply(ex, 204, "") }

      case ("POST", List("v1", "namespaces", ns, "tables", name, "commit")) =>
        if (!cat.tableExists(ns, name))
          return reply(ex, 404, """{"error":"no such table"}""")
        val j = JsonMethods.parse(bodyOf(ex))
        val expectedBase = (j \ "expected-snapshot-id").extractOpt[Long]
        val next = TableMetadata.fromJson(
          JsonMethods.compact(JsonMethods.render(j \ "metadata")))
        val t = cat.loadTable(ns, name)
        try {
          t.commit({ fresh =>
            // snapshot-id CAS: the client built `next` on expectedBase;
            // anything newer on the server side is a lost-update hazard
            if (fresh.currentSnapshotId != expectedBase)
              throw new ValidationError(
                s"commit conflict: table is at ${fresh.currentSnapshotId}, " +
                  s"client expected $expectedBase")
            next
          }, maxRetries = 0)
          reply(ex, 200, tableJson(cat.loadTable(ns, name)))
        } catch {
          case e: ValidationError if e.getMessage.contains("commit conflict") =>
            reply(ex, 409, s"""{"error":"${e.getMessage}"}""")
        }

      case _ => reply(ex, 404, """{"error":"no such route"}""")
    }
  } catch {
    case e: Throwable =>
      reply(ex, 500, JsonMethods.compact(JsonMethods.render(
        JObject("error" -> JString(String.valueOf(e.getMessage))))))
  }

  private def tableJson(t: GraftTable): String = {
    val m = t.metadata
    JsonMethods.compact(JsonMethods.render(JObject(
      "metadata-json" -> JString(TableMetadata.toJson(m)),
      "version" -> JInt(t.currentVersion))))
  }

  server.createContext("/", (ex: HttpExchange) => route(ex))
  server.setExecutor(null)

  def start(): RestCatalogServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

/** HTTP client for [[RestCatalogServer]] — the `rest` scheme's wire
  * path. Control plane over `java.net.http.HttpClient`; the data plane
  * (staging parquet + manifests) writes direct to the table location
  * exactly like a networked Iceberg writer. Auth per [[CatalogConfig]]:
  * OAuth2 client credentials fetch a bearer from `/v1/oauth/tokens`,
  * else the configured static token rides every request. */
final class RestCatalogClient private (base: String, token: Option[String]) {

  private implicit val fmts: Formats = DefaultFormats
  private val http = HttpClient.newHttpClient()

  private def req(path: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(java.net.URI.create(s"$base$path"))
    token.fold(b)(t => b.header("Authorization", s"Bearer $t"))
  }

  private def send(r: HttpRequest, okCodes: Set[Int] = Set(200, 204)): String = {
    val resp = http.send(r, HttpResponse.BodyHandlers.ofString())
    if (!okCodes.contains(resp.statusCode()))
      throw new ValidationError(
        s"REST catalog ${r.method()} ${r.uri()} -> ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  private def post(path: String, body: String): String =
    send(req(path).POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json").build())

  def config(): Map[String, String] =
    (JsonMethods.parse(send(req("/v1/config").GET().build())) \ "overrides")
      .extract[Map[String, String]]

  def createNamespace(ns: String): Unit = {
    post("/v1/namespaces", s"""{"namespace":["$ns"]}"""); ()
  }

  def namespaceExists(ns: String): Boolean =
    http.send(req(s"/v1/namespaces/$ns").GET().build(),
      HttpResponse.BodyHandlers.ofString()).statusCode() == 200

  def listNamespaces(): Seq[String] =
    (JsonMethods.parse(send(req("/v1/namespaces").GET().build())) \ "namespaces")
      .extract[Seq[Seq[String]]].map(_.mkString("."))

  def listTables(ns: String): Seq[String] =
    (JsonMethods.parse(send(req(s"/v1/namespaces/$ns/tables").GET().build()))
      \ "identifiers").extract[Seq[JObject]]
      .map(o => (o \ "name").extract[String])

  def createTable(ns: String, name: String, schema: StructType): TableMetadata =
    metadataOf(post(s"/v1/namespaces/$ns/tables", JsonMethods.compact(
      JsonMethods.render(JObject(
        "name" -> JString(name), "schema-json" -> JString(schema.json))))))

  def tableExists(ns: String, name: String): Boolean =
    http.send(req(s"/v1/namespaces/$ns/tables/$name").GET().build(),
      HttpResponse.BodyHandlers.ofString()).statusCode() == 200

  def loadMetadata(ns: String, name: String): TableMetadata =
    metadataOf(send(req(s"/v1/namespaces/$ns/tables/$name").GET().build()))

  def dropTable(ns: String, name: String): Unit = {
    send(req(s"/v1/namespaces/$ns/tables/$name").DELETE().build()); ()
  }

  /** CAS commit: `next` was built on `expectedBase`; 409 surfaces as a
    * ValidationError for the caller's retry loop. */
  def commit(ns: String, name: String, expectedBase: Option[Long],
      next: TableMetadata): TableMetadata = {
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "expected-snapshot-id" ->
        expectedBase.fold[JValue](JNull)(JLong(_)),
      "metadata" -> JsonMethods.parse(TableMetadata.toJson(next)))))
    metadataOf(post(s"/v1/namespaces/$ns/tables/$name/commit", body))
  }

  /** Append a load: data plane stages parquet directly under the table
    * location (what a distributed writer does), control plane commits
    * the snapshot delta over HTTP with the snapshot-id CAS. */
  def appendLoad(spark: SparkSession, ns: String, name: String,
      df: DataFrame, loadId: String): TableMetadata = {
    val base = loadMetadata(ns, name)
    val staged = graft.write.Stager.stage(df,
      java.nio.file.Paths.get(base.location).resolve("data"), loadId,
      base.partitionSpec)
    val next = base.withSnapshotDelta("append", Some(loadId), staged, Set.empty)
    commit(ns, name, base.currentSnapshotId, next)
  }

  private def metadataOf(tableJson: String): TableMetadata =
    TableMetadata.fromJson(
      (JsonMethods.parse(tableJson) \ "metadata-json").extract[String])
}

object RestCatalogClient {
  /** Connect per [[CatalogConfig]]: client-credentials OAuth against the
    * configured token endpoint, or the pre-issued bearer, or anonymous. */
  def connect(cfg: CatalogConfig): RestCatalogClient = {
    cfg.validated
    require(cfg.kind == CatalogKind.RestKind,
      s"not a REST catalog uri: ${cfg.uri}")
    val token = (cfg.credential, cfg.oauth2ServerUri) match {
      case (Some(cred), Some(tokenUri)) =>
        val Array(id, secret) = cred.split(":", 2)
        val form = s"grant_type=client_credentials&client_id=" +
          java.net.URLEncoder.encode(id, UTF_8) + "&client_secret=" +
          java.net.URLEncoder.encode(secret, UTF_8)
        val resp = HttpClient.newHttpClient().send(
          HttpRequest.newBuilder(java.net.URI.create(tokenUri))
            .POST(HttpRequest.BodyPublishers.ofString(form))
            .header("Content-Type", "application/x-www-form-urlencoded")
            .build(),
          HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() != 200)
          throw new ValidationError(
            s"OAuth2 token request failed (${resp.statusCode()}): ${resp.body()}")
        implicit val fmts: Formats = DefaultFormats
        Some((JsonMethods.parse(resp.body()) \ "access_token").extract[String])
      case _ => cfg.token
    }
    new RestCatalogClient(cfg.uri, token)
  }
}
