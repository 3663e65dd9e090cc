package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.UriPath

/** The metadata-path canonicalizer: literal engine paths pass through,
  * scheme-ful URIs yield the DECODED path, and the index-arithmetic fast
  * path must agree byte-for-byte with java.net.URI's semantics (the
  * source of truth the slow path delegates to). */
class UriPathSpec extends AnyFunSuite {

  private def uriRef(s: String): String =
    try {
      val u = new java.net.URI(s)
      if (u.getScheme != null && u.getPath != null) u.getPath else s
    } catch { case _: java.net.URISyntaxException => s }

  test("literal engine paths pass through untouched (no allocation path)") {
    for (p <- Seq("/wh/ns/t/data/f.parquet", "/wh/p=a b/f.parquet",
        "/wh/p=a%20b/f.parquet", "relative/path", "", "/a+b/c",
        "/weird:colon/after/slash")) {
      // note "/a%20b" literal: no scheme => NOT decoded (it is a real
      // directory named a%20b in engine metadata)
      assert(UriPath.decode(p) == p, p)
    }
  }

  test("scheme-ful URIs decode to the path, matching java.net.URI exactly") {
    val cases = Seq(
      "file:///wh/p=a%20b/f.parquet",
      "file:/wh/p=a%20b/f.parquet",
      "file://localhost/wh/f.parquet",
      "file:///wh/p=%25raw/f.parquet", // literal '%' round-trips
      "file:///wh/p=a+b/f.parquet", // '+' is NOT a space in URIs
      "file:///wh/p=%E2%82%AC/f.parquet", // multi-byte UTF-8 (euro sign)
      "s3://bucket/key/p=a%20b/f.parquet",
      "hdfs://nn:8020/wh/f.parquet",
      "file:///plain/no/escapes.parquet",
      "mailto:x@y", // opaque: no path => passthrough
      "file:relative") // opaque-ish: passthrough
    for (s <- cases)
      assert(UriPath.decode(s) == uriRef(s), s)
  }

  test("fast path (no %) equals the URI slow path on a generated grid") {
    val schemes = Seq("file://", "file:///", "file://host", "s3://b", "file:")
    val paths = Seq("/a/b.parquet", "/p=a+b/f", "/x", "", "/")
    for (sc <- schemes; p <- paths) {
      val s = sc + p
      assert(UriPath.decode(s) == uriRef(s), s)
    }
  }
}
