package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.catalog.CatalogKind._

/** S12: URI-scheme catalog dispatch + config flattening + error taxonomy,
  * mirroring destination_client.py:679-734 / destination.py:143-191. */
class CatalogConfigSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("scheme detection matches the reference's auto-detect") {
    assert(CatalogConfig.kindOf("sqlite:///tmp/cat.db") == SqlKind)
    assert(CatalogConfig.kindOf("postgresql://host/db") == SqlKind)
    assert(CatalogConfig.kindOf("https://rest.example/catalog") == RestKind)
    assert(CatalogConfig.kindOf("http://localhost:8181") == RestKind)
    assert(CatalogConfig.kindOf("file:///tmp/wh") == FileKind)
    assert(CatalogConfig.kindOf("/tmp/wh") == FileKind)
    intercept[ValidationError] { CatalogConfig.kindOf("ftp://x") }
  }

  test("properties flatten with the reference's keys and auth precedence") {
    val oauth = CatalogConfig("https://rest.example", warehouse = Some("s3://wh"),
      credential = Some("id:secret"), oauth2ServerUri = Some("https://auth/token"))
      .properties
    assert(oauth("type") == "rest" && oauth("warehouse") == "s3://wh")
    assert(oauth("credential") == "id:secret")
    assert(oauth("oauth2-server-uri") == "https://auth/token")
    assert(oauth("scope") == "PRINCIPAL_ROLE:ALL") // reference default
    assert(!oauth.contains("token"))

    val bearer = CatalogConfig("https://rest.example", token = Some("tok")).properties
    assert(bearer("token") == "tok" && !bearer.contains("credential"))

    val sigv4 = CatalogConfig("https://glue.example", sigv4Enabled = true,
      signingRegion = Some("eu-west-1"),
      s3Endpoint = Some("https://minio:9000"), s3Region = Some("eu-west-1"),
      s3AccessKeyId = Some("ak"), s3SecretAccessKey = Some("sk")).properties
    assert(sigv4("rest.sigv4-enabled") == "true")
    assert(sigv4("rest.signing-region") == "eu-west-1")
    assert(sigv4("rest.signing-name") == "execute-api") // reference default
    assert(sigv4("s3.endpoint") == "https://minio:9000")
    assert(sigv4("s3.access-key-id") == "ak")
  }

  test("validation fails loudly on half-configured auth and misuse") {
    intercept[ValidationError] { // credential without token endpoint
      CatalogConfig("https://r", credential = Some("id:sec")).validated
    }
    intercept[ValidationError] { // malformed credential
      CatalogConfig("https://r", credential = Some("nocolon"),
        oauth2ServerUri = Some("https://auth")).validated
    }
    intercept[ValidationError] { // both auth modes
      CatalogConfig("https://r", credential = Some("a:b"),
        oauth2ServerUri = Some("https://auth"), token = Some("t")).validated
    }
    intercept[ValidationError] { // SigV4 on a non-REST catalog
      CatalogConfig("sqlite:///tmp/x.db", sigv4Enabled = true).validated
    }
  }

  test("REST round-trip: DDL, load commit, and read-back over HTTP") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-rest-wh-").toString
    // OAuth2 client-credentials end to end: the server issues bearers
    // from /v1/oauth/tokens; the client fetches one per its config
    val server = new RestCatalogServer(spark, wh,
      credential = Some("svc:hunter2")).start()
    try {
      val client = CatalogConfig(
        uri = server.uri,
        credential = Some("svc:hunter2"),
        oauth2ServerUri = Some(s"${server.uri}/v1/oauth/tokens")).openRestClient()

      assert(client.config().get("warehouse").contains(wh))
      client.createNamespace("main")
      assert(client.namespaceExists("main"))
      assert(client.listNamespaces().contains("main"))

      val schema = Seq((0L, "")).toDF("id", "v").schema
      client.createTable("main", "t", schema)
      assert(client.listTables("main") == Seq("t"))
      assert(client.tableExists("main", "t"))

      // commit a load: parquet staged direct to storage, snapshot CAS
      // over HTTP
      val m1 = client.appendLoad(spark, "main", "t",
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "l1")
      assert(m1.currentSnapshotId.isDefined)
      val m2 = client.appendLoad(spark, "main", "t",
        Seq((3L, "c")).toDF("id", "v"), "l2")
      assert(m2.snapshots.size == 2)

      // read back THROUGH the wire metadata...
      assert(client.loadMetadata("main", "t").currentFiles.map(_.rowCount).sum == 3)
      // ...and through a local engine catalog over the same warehouse
      val local = new GraftCatalog(spark, wh)
      assert(local.loadTable("main", "t").read()
        .orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))

      // CAS conflict: a commit built on a stale base is refused with 409
      val stale = m1 // built on snapshot 1, table is at snapshot 2
      val e = intercept[ValidationError] {
        client.commit("main", "t", stale.currentSnapshotId, stale)
      }
      assert(e.getMessage.contains("409"), e.getMessage)

      client.dropTable("main", "t")
      assert(!client.tableExists("main", "t"))
    } finally server.stop()
  }

  test("REST auth: bad credentials and missing bearer are rejected") {
    val wh = Files.createTempDirectory("graft-rest-auth-").toString
    val server = new RestCatalogServer(spark, wh,
      staticToken = Some("sesame")).start()
    try {
      // wrong token -> 401 surfaces as a loud error
      val bad = CatalogConfig(uri = server.uri, token = Some("nope"))
        .openRestClient()
      val e = intercept[ValidationError] { bad.listNamespaces() }
      assert(e.getMessage.contains("401"), e.getMessage)
      // right token works
      val good = CatalogConfig(uri = server.uri, token = Some("sesame"))
        .openRestClient()
      good.createNamespace("main")
      assert(good.namespaceExists("main"))
      // bad OAuth credentials are refused at token issue time
      val e2 = intercept[ValidationError] {
        CatalogConfig(uri = server.uri, credential = Some("svc:wrong"),
          oauth2ServerUri = Some(s"${server.uri}/v1/oauth/tokens"))
          .openRestClient()
      }
      assert(e2.getMessage.contains("401") ||
        e2.getMessage.contains("invalid_client"), e2.getMessage)
    } finally server.stop()
  }

  test("file:// opens a working catalog; REST/SQL fail cleanly offline") {
    val wh = Files.createTempDirectory("graft-cfg-")
    val cat = CatalogConfig(s"file://$wh").open(spark)
    cat.createNamespace("ns")
    assert(cat.namespaceExists("ns"))

    val e = intercept[CatalogUnavailableError] {
      CatalogConfig("https://rest.example", token = Some("t")).open(spark)
    }
    assert(!e.retryable && e.getMessage.contains("file://"))
    intercept[CatalogUnavailableError] {
      CatalogConfig("postgresql://host/db").open(spark)
    }
  }

  test("sqlite:// SQL store round-trip: namespace + table + data commit + pointer-CAS conflict retry") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-sqlcat-")
    val cfg = CatalogConfig(uri = s"sqlite://$base/catalog.db",
      warehouse = Some(s"$base/wh"))
    assert(cfg.kind == SqlKind)
    val store = cfg.openSqlStore()

    store.createNamespace("main")
    assert(store.namespaceExists("main"))
    assert(store.listNamespaces() == Seq("main"))
    intercept[ValidationError](store.createNamespace("main"))

    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    val dir = store.tableDir("main", "t")
    store.createTable("main", "t",
      TableMetadata.create("main.t", dir.toString, schema, Nil, Map.empty))
    assert(store.tableExists("main", "t"))
    assert(store.listTables("main") == Seq("t"))
    intercept[TableAlreadyExistsError](store.createTable("main", "t",
      TableMetadata.create("main.t", dir.toString, schema, Nil, Map.empty)))

    // data commit through the pointer CAS: stage real parquet, publish
    def append(rows: Seq[(Long, String)], loadId: String): Unit = {
      val staged = graft.write.Stager.stage(
        rows.toDF("id", "v"), dir.resolve("data"), loadId)
      store.commit("main", "t",
        _.withSnapshotDelta("append", Some(loadId), staged, Set.empty),
        unitMs = 1)
    }
    append(Seq((1L, "a"), (2L, "b")), "l1")

    // concurrent-conflict retry: two racing committers must BOTH land
    // (the loser refreshes off the swapped pointer and rebases)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val latch = new java.util.concurrent.CountDownLatch(1)
    def submit(id: Long, tag: String) = pool.submit(new Runnable {
      def run(): Unit = { latch.await(); append(Seq((id, tag)), s"race-$tag") }
    })
    val f1 = submit(10L, "x"); val f2 = submit(11L, "y")
    latch.countDown()
    f1.get(60, java.util.concurrent.TimeUnit.SECONDS)
    f2.get(60, java.util.concurrent.TimeUnit.SECONDS)
    pool.shutdown()

    val m = store.loadMetadata("main", "t")
    assert(m.snapshots.size == 3, s"all three commits must land: ${m.snapshots.size}")
    val back = spark.read.schema(schema)
      .parquet(m.currentFiles.map(_.path): _*)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(back.toSeq == Seq((1L, "a"), (2L, "b"), (10L, "x"), (11L, "y")))

    // drop removes the pointer row; the metadata file becomes unreachable
    assert(store.dropTable("main", "t"))
    assert(!store.tableExists("main", "t"))
    intercept[NoSuchTableError](store.loadMetadata("main", "t"))
  }
}
