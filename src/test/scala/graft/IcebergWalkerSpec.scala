package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.iceberg.IcebergInterop
import graft.write._

/** Cross-implementation check: `tools/iceberg_walk.py` is a pure-Python
  * Iceberg v2 walker (hand-rolled Avro decoder + DuckDB) sharing NO code
  * or assumptions with the JVM export/import paths — a genuinely third
  * implementation. This spec exports trees through the engine, has the
  * walker recover the live rows to parquet, and compares full content in
  * Spark — so a shared-assumption bug between exporter and importer
  * (the same-author blind spot) fails `sbt test`, not just the tools
  * tier. Cancels (not fails) when the driver-side python environment is
  * absent. */
class IcebergWalkerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val pythonOk: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb, pandas")
      .start().waitFor() == 0
    catch { case _: Throwable => false }

  private def walk(tree: String, out: String,
      snapshot: Option[Long] = None): Int = {
    val cmd = Seq("python3", "tools/iceberg_walk.py", tree,
      "--dump", out) ++ snapshot.toSeq.flatMap(s =>
      Seq("--snapshot", s.toString))
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File("/root/repo"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    assert(code == 0, s"walker failed ($code):\n${log.takeRight(800)}")
    code
  }

  test("independent Python walker recovers a MoR tree's live rows exactly") {
    assume(pythonOk, "driver-side python3+duckdb not available")
    val cat = new GraftCatalog(spark,
      Files.createTempDirectory("graft-walk-").toString)
    val w = new GraftWriter(cat)
    val cfg = WriteConfig(retryUnitMs = 1, primaryKey = Seq("id"),
      mergeOnRead = true,
      partitions = Seq(graft.partition.PartitionHint.bucket(4, "id")))
    val base = (1L to 500L).map(i => (i, s"v$i", i * 1.5)).toDF("id", "v", "x")
    w.writeTable("main", "t", Seq(base), Append, cfg, "l1")
    // MoR upsert (equality deletes) + predicate delete (positional)
    w.writeTable("main", "t",
      Seq((1L to 500L by 10).map(i => (i, s"u$i", i * 2.5))
        .toDF("id", "v", "x")), Merge("upsert"), cfg, "l2")
    w.deleteWhere("main", "t", col("id") % 7 === 0, cfg)
    val t = cat.loadTable("main", "t")
    require(t.metadata.currentSnapshot.exists(s =>
      s.deletes.nonEmpty && s.posDeletes.nonEmpty),
      "fixture must carry an OUTSTANDING eq+pos delete backlog")
    IcebergInterop.exportTable(t)
    val dump = Files.createTempDirectory("graft-walk-out-")
      .resolve("live.parquet").toString
    walk(t.dir.resolve("iceberg").toString, dump)
    val walked = spark.read.parquet(dump)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val engine = t.read().select("id", "v", "x")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(walked == engine,
      s"walker diverged: extra=${(walked -- engine).take(3)} " +
        s"missing=${(engine -- walked).take(3)}")
  }

  test("independent walker serves per-snapshot schemas across an evolution boundary") {
    assume(pythonOk, "driver-side python3+duckdb not available")
    val cat = new GraftCatalog(spark,
      Files.createTempDirectory("graft-walk2-").toString)
    val w = new GraftWriter(cat)
    val cfg = WriteConfig(retryUnitMs = 1)
    w.writeTable("main", "t",
      Seq(Seq((1L, "a"), (2L, "b")).toDF("id", "v")), Append, cfg, "l1")
    w.writeTable("main", "t",
      Seq(Seq((3L, "c", 9L)).toDF("id", "v", "extra")), Append, cfg, "l2")
    val t = cat.loadTable("main", "t")
    IcebergInterop.exportTable(t)
    val outDir = Files.createTempDirectory("graft-walk2-out-")
    walk(t.dir.resolve("iceberg").toString,
      outDir.resolve("past.parquet").toString, snapshot = Some(1L))
    val past = spark.read.parquet(outDir.resolve("past.parquet").toString)
    assert(past.columns.toSeq == Seq("id", "v"),
      s"snapshot 1 must serve the pre-evolution schema, got " +
        s"${past.columns.toSeq}")
    assert(past.count() == 2)
    walk(t.dir.resolve("iceberg").toString,
      outDir.resolve("now.parquet").toString)
    val now = spark.read.parquet(outDir.resolve("now.parquet").toString)
    assert(now.columns.toSeq == Seq("id", "v", "extra") && now.count() == 3)
    // pre-evolution stragglers null-fill under the current schema
    assert(now.filter(col("extra").isNull).count() == 2)
  }
}
