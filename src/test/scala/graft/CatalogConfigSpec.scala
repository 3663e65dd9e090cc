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
}
