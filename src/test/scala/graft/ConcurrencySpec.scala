package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** Full write-path concurrency + degenerate-input robustness. */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(): GraftCatalog =
    new GraftCatalog(spark, Files.createTempDirectory("graft-cc-").toString)

  private val cfg = WriteConfig(retryUnitMs = 1, maxRetries = 20)

  test("four concurrent append loads all land (CAS rebase on real writes)") {
    val cat = freshCatalog()
    cat.createTable("main", "t", StructType(Seq(StructField("x", LongType))))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futures = (1 to 4).map { i =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          val w = new GraftWriter(cat)
          w.writeTable("main", "t",
            Seq(Seq((i * 10).toLong, (i * 10 + 1).toLong).toDF("x")),
            Append, cfg, s"load-$i")
        }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    val t = cat.loadTable("main", "t")
    assert(t.metadata.snapshots.size == 4)
    assert(t.read().count() == 8)
    assert(t.metadata.snapshots.map(_.loadId.get).toSet ==
      (1 to 4).map(i => s"load-$i").toSet)
  }

  test("concurrent merges on disjoint keys both survive the rebase") {
    val cat = freshCatalog()
    val w0 = new GraftWriter(cat)
    val mcfg = cfg.copy(primaryKey = Seq("id"))
    w0.writeTable("main", "m",
      Seq(Seq((1L, "a"), (100L, "x")).toDF("id", "v")), Merge("upsert"), mcfg, "seed")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val futures = Seq((1L, "a2"), (100L, "x2")).zipWithIndex.map { case ((id, v), i) =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          new GraftWriter(cat).writeTable("main", "m",
            Seq(Seq((id, v)).toDF("id", "v")), Merge("upsert"), mcfg, s"m-$i")
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    val got = cat.loadTable("main", "m").read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (100L, "x2")))
  }

  test("concurrent merge-on-read merges both land; overlapping keys resolve by sequence") {
    val cat = freshCatalog()
    val w0 = new GraftWriter(cat)
    val mcfg = cfg.copy(primaryKey = Seq("id"), mergeOnRead = true)
    w0.writeTable("main", "m",
      Seq(Seq((1L, "a"), (100L, "x")).toDF("id", "v")), Merge("upsert"), mcfg, "seed")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val futures = Seq((1L, "a2"), (100L, "x2")).zipWithIndex.map { case ((id, v), i) =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          new GraftWriter(cat).writeTable("main", "m",
            Seq(Seq((id, v)).toDF("id", "v")), Merge("upsert"), mcfg, s"m-$i")
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
    val t = cat.loadTable("main", "m")
    val got = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a2"), (100L, "x2")))
    // both MoR commits' delete files survived the CAS rebase; physical
    // apply converges to the same content
    assert(t.metadata.currentSnapshot.get.deletes.size == 2)
    Maintenance.applyDeletes(t, retryUnitMs = 1)
    val applied = t.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(applied.toSeq == Seq((1L, "a2"), (100L, "x2")))
  }

  test("empty batch append commits an empty snapshot; empty merge is safe") {
    val cat = freshCatalog()
    val w = new GraftWriter(cat)
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    w.writeTable("main", "t", Seq(empty), Append, cfg, "l0")
    val t = cat.loadTable("main", "t")
    assert(t.read().count() == 0)
    assert(t.metadata.snapshots.size == 1)

    w.writeTable("main", "t", Seq(Seq((1L, "a")).toDF("id", "v")), Append, cfg, "l1")
    w.writeTable("main", "t", Seq(empty), Merge("delete-insert"),
      cfg.copy(primaryKey = Seq("id")), "l2")
    assert(t.read().count() == 1) // empty merge removed nothing
  }

  test("null values in text columns flow through dedup and text ops") {
    val docs = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1L, "the quick brown fox jumps over it"),
        org.apache.spark.sql.Row(2L, null)),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    // null text: dropped by shingling (size(null) is null), fingerprint null-groups
    assert(graft.llmops.Dedup.shingles(docs, 3).count() > 0)
    val stats = graft.llmops.TextOps.tokenStats(docs).collect()
    assert(stats.length == 2) // row preserved, stats null for the null doc
  }

  /** Fork a Spark-free committer JVM (graft.tools.CommitRacer) against
    * the compiled classes + Spark jars. */
  private def forkRacer(args: String*): Process = {
    val cp = "target/scala-2.13/classes" +
      java.io.File.pathSeparator + "/opt/spark/jars/*"
    val cmd = Seq("java", "-cp", cp, "graft.tools.CommitRacer") ++ args
    new ProcessBuilder(cmd: _*).inheritIO().start()
  }

  test("cross-process CAS: a second JVM races 20 commits against 20 in-process, none lost") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-xproc-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    w.writeTable("main", "t", Seq(Seq((1L, "a")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "seed")
    val dir = cat.loadTable("main", "t").dir.toString

    val proc = forkRacer("file", dir, "20", "procB")
    val t = cat.loadTable("main", "t")
    (1 to 20).foreach { i =>
      t.commit(_.withSnapshotDelta("append", Some(s"procA-$i"), Nil,
        Set.empty), maxRetries = 100, backoffBase = 1.2, unitMs = 2)
    }
    assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "forked committer timed out")
    assert(proc.exitValue() == 0, "forked committer failed")

    val m = cat.loadTable("main", "t").metadata
    assert(m.snapshots.size == 41,
      s"1 seed + 40 raced commits must ALL land, got ${m.snapshots.size}")
    val loadIds = m.snapshots.flatMap(_.loadId)
    assert(loadIds.distinct.size == loadIds.size, "duplicate snapshot")
    (1 to 20).foreach { i =>
      assert(loadIds.contains(s"procA-$i") && loadIds.contains(s"procB-$i"))
    }
    // versions are a gapless CAS chain: every commit observed the one
    // before it (the cross-process serialization proof)
    assert(m.snapshots.map(_.snapshotId).sorted == (1L to 41L))
  }

  test("cross-process REST CAS: a second JVM's client races the in-process client through one server") {
    val wh = java.nio.file.Files.createTempDirectory("graft-xrest-").toString
    val server = new RestCatalogServer(spark, wh).start()
    try {
      val client = CatalogConfig(uri = server.uri).openRestClient()
      client.createNamespace("main")
      client.createTable("main", "t", org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))

      val proc = forkRacer("rest", server.uri, "main.t", "10", "remote")
      (1 to 10).foreach { i =>
        Retry.withRetries(maxRetries = 100, backoffBase = 1.2, unitMs = 2) { () =>
          val base = client.loadMetadata("main", "t")
          val next = base.withSnapshotDelta("append", Some(s"local-$i"),
            Nil, Set.empty)
          try client.commit("main", "t", base.currentSnapshotId, next)
          catch {
            case e: ValidationError
                if e.getMessage.contains("409") ||
                  e.getMessage.toLowerCase.contains("conflict") =>
              throw new CommitConflictError("main.t", -1, e)
          }
        }
      }
      assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "forked REST committer timed out")
      assert(proc.exitValue() == 0, "forked REST committer failed")
      val m = client.loadMetadata("main", "t")
      assert(m.snapshots.size == 20,
        s"all 20 REST commits must land, got ${m.snapshots.size}")
      val ids = m.snapshots.flatMap(_.loadId)
      (1 to 10).foreach { i =>
        assert(ids.contains(s"local-$i") && ids.contains(s"remote-$i"))
      }
    } finally server.stop()
  }
}
