package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._

/** SQL stored procedures (`CALL cat.system.<proc>(...)`) — the Spark 4
  * ProcedureCatalog surface over the engine's maintenance operations.
  * Each procedure must (a) run the real engine operation, (b) return its
  * declared one-row result, and (c) stay content-neutral where the
  * operation promises it. */
class ProcedureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(name: String): GraftCatalog = {
    val wh = Files.createTempDirectory(s"graft-proc-$name-").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    new GraftCatalog(spark, wh)
  }

  test("compact, expire_snapshots, vacuum_orphans via CALL") {
    val cat = freshCatalog("gproc")
    val w = new GraftWriter(cat)
    // 5 loads of small files -> plenty to bin-pack
    (1 to 5).foreach { l =>
      w.writeTable("main", "t",
        Seq((1 to 200).map(i => (l * 1000L + i, s"v$i")).toDF("id", "v")),
        Append, WriteConfig(retryUnitMs = 1), s"l$l")
    }
    val before = cat.loadTable("main", "t").metadata.currentFiles.size
    assert(before >= 5)

    val r = spark.sql("CALL gproc.system.compact('main.t')").collect()
    assert(r.length == 1 && r(0).getBoolean(0), "compact should report true")
    val t = cat.loadTable("main", "t")
    assert(t.metadata.currentFiles.size < before)
    assert(spark.sql("SELECT COUNT(*) FROM gproc.main.t")
      .collect()(0).getLong(0) == 1000L, "compaction must be content-neutral")

    // named arguments go through Spark's BindProcedures
    val exp = spark.sql(
      "CALL gproc.system.expire_snapshots(table => 'main.t', keep_last => 1)")
      .collect()
    assert(exp(0).getInt(0) >= 1, "history beyond the head should expire")

    // the pre-compaction files are now unreferenced by every snapshot
    val vac = spark.sql(
      "CALL gproc.system.vacuum_orphans('main.t', 0)").collect()
    assert(vac(0).getInt(0) >= 1, "expired files should vacuum")
    assert(spark.sql("SELECT COUNT(*) FROM gproc.main.t")
      .collect()(0).getLong(0) == 1000L)
  }

  test("zorder and rollback via CALL") {
    val cat = freshCatalog("gproc2")
    val w = new GraftWriter(cat)
    w.writeTable("main", "ev",
      Seq((1 to 4000).map(i => (i.toLong % 97, (i * 31L) % 101, i.toLong))
        .toDF("a", "b", "x")), Append, WriteConfig(retryUnitMs = 1), "l1")
    val snap1 = cat.loadTable("main", "ev").metadata.currentSnapshotId.get

    val z = spark.sql(
      "CALL gproc2.system.zorder('main.ev', 'a, b', 4)").collect()
    assert(z(0).getBoolean(0))
    assert(spark.sql("SELECT COUNT(*) FROM gproc2.main.ev")
      .collect()(0).getLong(0) == 4000L, "zorder must be content-neutral")

    w.writeTable("main", "ev", Seq(Seq((999L, 999L, 9L)).toDF("a", "b", "x")),
      Append, WriteConfig(retryUnitMs = 1), "l2")
    assert(spark.sql("SELECT COUNT(*) FROM gproc2.main.ev")
      .collect()(0).getLong(0) == 4001L)

    val rb = spark.sql(
      s"CALL gproc2.system.rollback('main.ev', $snap1)").collect()
    assert(rb(0).getLong(0) != -1L)
    assert(spark.sql("SELECT COUNT(*) FROM gproc2.main.ev")
      .collect()(0).getLong(0) == 4000L, "rollback should restore snapshot 1's rows")
  }

  test("apply_deletes via CALL folds MoR delete files into data") {
    val cat = freshCatalog("gproc3")
    val w = new GraftWriter(cat)
    val cfg = WriteConfig(retryUnitMs = 1, primaryKey = Seq("id"),
      mergeOnRead = true)
    w.writeTable("main", "m",
      Seq((1 to 100).map(i => (i.toLong, i)).toDF("id", "v")),
      Append, cfg, "l1")
    w.writeTable("main", "m", Seq(Seq((7L, 700)).toDF("id", "v")),
      Merge("upsert"), cfg, "l2")
    assert(cat.loadTable("main", "m").metadata.currentSnapshot
      .exists(_.deletes.nonEmpty), "MoR upsert should leave a delete file")

    val r = spark.sql("CALL gproc3.system.apply_deletes('main.m')").collect()
    assert(r(0).getBoolean(0))
    assert(cat.loadTable("main", "m").metadata.currentSnapshot
      .exists(_.deletes.isEmpty), "deletes should be folded in")
    val row = spark.sql("SELECT v FROM gproc3.main.m WHERE id = 7").collect()
    assert(row.map(_.getInt(0)).toSeq == Seq(700))
  }

  test("prune_signatures via CALL rewrites sigs+bands down to the live corpus") {
    val cat = freshCatalog("gproc8")
    val w = new GraftWriter(cat)
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .filter(org.apache.spark.sql.functions.col("doc_id") < 40)
    w.writeTable("main", "docs", Seq(docs), Append,
      WriteConfig(retryUnitMs = 1), "l1")
    val sigs = graft.llmops.Dedup.minHashSignatures(docs)
    w.writeTable("main", "sigs", Seq(sigs), Append,
      WriteConfig(retryUnitMs = 1), "l1")
    w.writeTable("main", "sigs_bands",
      Seq(graft.llmops.Dedup.sigBandKeys(sigs)), Append,
      WriteConfig(retryUnitMs = 1, partitions =
        Seq(graft.partition.PartitionHint.bucket(4, "bkey"))), "l1")
    w.deleteWhere("main", "docs",
      org.apache.spark.sql.functions.col("doc_id") < 20,
      WriteConfig(retryUnitMs = 1))
    val r = spark.sql(
      "CALL gproc8.system.prune_signatures('main.docs', 'main.sigs')")
      .collect()
    assert(r(0).getLong(0) > 0, "erased docs must have had signatures")
    val live = cat.loadTable("main", "docs").read()
      .select("doc_id").as[Long].collect().toSet
    val sigIds = cat.loadTable("main", "sigs").read()
      .select("doc_id").as[Long].collect().toSet
    val bandIds = cat.loadTable("main", "sigs_bands").read()
      .select("doc_id").as[Long].collect().toSet
    assert(sigIds.subsetOf(live) && bandIds == sigIds)
    // idempotent: second call prunes nothing
    assert(spark.sql(
      "CALL gproc8.system.prune_signatures('main.docs', 'main.sigs')")
      .collect()(0).getLong(0) == 0L)
  }

  test("unknown procedures fail with the available list; discovery works") {
    val cat = freshCatalog("gproc4")
    val w = new GraftWriter(cat)
    w.writeTable("main", "t", Seq(Seq((1L, "a")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    val e = intercept[Exception] {
      spark.sql("CALL gproc4.system.no_such_proc('main.t')").collect()
    }
    // Spark wraps the catalog's error in FAILED_TO_LOAD_ROUTINE; the
    // available-procedure list rides in the cause chain
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(messages.contains("compact"),
      s"error chain should list available procedures, got: $messages")
    val listed = spark.sql("SHOW PROCEDURES IN gproc4.system").collect()
      .map(_.toSeq.mkString(" ")).mkString("\n")
    assert(graft.catalog.GraftProcedures.names.forall(listed.contains),
      s"SHOW PROCEDURES should list all graft procedures, got:\n$listed")
  }

  test("branch lifecycle through CALL: create, audit-read, publish, drop") {
    val cat = freshCatalog("gproc5")
    val w = new GraftWriter(cat)
    w.writeTable("main", "t", Seq((1 to 10).map(i => (i.toLong, i))
      .toDF("id", "v")), Append, WriteConfig(retryUnitMs = 1), "l1")

    val c = spark.sql(
      "CALL gproc5.system.create_branch('main.t', 'audit')").collect()
    assert(c(0).getLong(0) > 0)
    // write to the branch; main must not see it until publish
    w.writeTable("main", "t", Seq(Seq((100L, 100)).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1, toBranch = Some("audit")), "l2")
    assert(spark.sql("SELECT count(*) FROM gproc5.main.t")
      .collect()(0).getLong(0) == 10)
    assert(spark.sql(
      "SELECT count(*) FROM gproc5.main.t VERSION AS OF 'audit'")
      .collect()(0).getLong(0) == 11)
    val p = spark.sql(
      "CALL gproc5.system.publish_branch('main.t', 'audit')").collect()
    assert(p(0).getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM gproc5.main.t")
      .collect()(0).getLong(0) == 11)

    // a tag: a ref never published; drop removes only the ref
    spark.sql("CALL gproc5.system.create_branch('main.t', 'v1_tag')").collect()
    assert(spark.sql("CALL gproc5.system.drop_branch('main.t', 'v1_tag')")
      .collect()(0).getBoolean(0))
    val e = intercept[Exception](spark.sql(
      "CALL gproc5.system.publish_branch('main.t', 'v1_tag')").collect())
    assert(e.getMessage.contains("v1_tag"), e.getMessage)
  }

  test("rewrite_manifests merges refs, preserves content AND MoR fencing") {
    val cat = freshCatalog("gproc6")
    val w = new GraftWriter(cat)
    val mcfg = WriteConfig(primaryKey = Seq("id"), retryUnitMs = 1,
      mergeOnRead = true)
    (0 until 4).foreach { i =>
      w.writeTable("main", "m",
        Seq(Seq((i.toLong, s"v$i")).toDF("id", "v")), Append,
        WriteConfig(retryUnitMs = 1), s"l$i")
    }
    // MoR merge leaves an equality-delete file whose fencing depends on
    // the data files' ORIGINAL sequences
    w.writeTable("main", "m", Seq(Seq((1L, "updated")).toDF("id", "v")),
      Merge("upsert"), mcfg, "l9")
    val before = cat.loadTable("main", "m").metadata.currentSnapshot.get
    assert(before.manifestPaths.size > 1 && before.deletes.nonEmpty)

    val r = spark.sql("CALL gproc6.system.rewrite_manifests('main.m')").collect()
    assert(r(0).getBoolean(0))
    val after = cat.loadTable("main", "m").metadata.currentSnapshot.get
    assert(after.manifestPaths.size == 1,
      s"expected one merged manifest, got ${after.manifestPaths.size}")
    assert(after.deletes.map(_.path) == before.deletes.map(_.path))
    // content-neutral INCLUDING the outstanding delete: id=1 still reads
    // as the post-merge value, never the resurrected original
    val got = spark.sql("SELECT id, v FROM gproc6.main.m ORDER BY id")
      .collect().map(r2 => (r2.getLong(0), r2.getString(1)))
    assert(got.toSeq == Seq((0L, "v0"), (1L, "updated"), (2L, "v2"), (3L, "v3")),
      got.toSeq)
    // the changelog skips the rewrite snapshot (content-neutral op)
    val t = cat.loadTable("main", "m")
    val changes = t.changesBetween(before.snapshotId, after.snapshotId)
    assert(changes.isEmpty, "rewrite-manifests must contribute no changes")
    // idempotent: already-compact tables report false
    assert(!spark.sql("CALL gproc6.system.rewrite_manifests('main.m')")
      .collect()(0).getBoolean(0))
  }

  test("iceberg_export + iceberg_attach close the migration loop via CALL") {
    val cat = freshCatalog("gproc7")
    val w = new GraftWriter(cat)
    w.writeTable("main", "t",
      Seq(Seq((1L, "a"), (2L, "b")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "l1")
    val r = spark.sql("CALL gproc7.system.iceberg_export('main.t')")
      .collect()(0)
    assert(r.getString(0).endsWith("v1.metadata.json") && r.getInt(1) >= 1)
    val loc = java.nio.file.Paths.get(r.getString(0)).getParent.getParent
    val a = spark.sql(
      s"CALL gproc7.system.iceberg_attach('main.t2', '$loc')").collect()(0)
    assert(a.getBoolean(0) && a.getLong(1) == 2L, a)
    assert(spark.sql("SELECT v FROM gproc7.main.t2 ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("prune_assignments via CALL; expire_snapshots streaming-replay guard") {
    val cat = freshCatalog("gproc9")
    val w = new GraftWriter(cat)
    // semantic-dedup state pair: corpus vectors + identity(cluster)
    // assignment table
    val vecs = (0L until 10L).map(i => (i, Seq.fill(4)(i.toDouble)))
      .toDF("vec_id", "embedding")
    w.writeTable("main", "vc", Seq(vecs), Append,
      WriteConfig(retryUnitMs = 1), "l1")
    val assign = (0L until 10L).map(i =>
        (i, (i % 3).toInt, Seq.fill(4)(i.toDouble)))
      .toDF("vec_id", "cluster", "v")
    w.writeTable("main", "va", Seq(assign), Append,
      WriteConfig(retryUnitMs = 1,
        partitions = Seq(graft.partition.PartitionHint.identity("cluster"))),
      "l1")
    w.deleteWhere("main", "vc", org.apache.spark.sql.functions.col("vec_id") < 4,
      WriteConfig(retryUnitMs = 1))
    // cluster-skew maintenance signal before the prune: 10 vectors over
    // 3 clusters (sizes 4/3/3) — balanced
    val h0 = spark.sql(
      "CALL gproc9.system.semdedup_health('main.va')").collect()(0)
    assert(h0.getLong(0) == 10L && h0.getInt(1) == 3 &&
      h0.getLong(2) == 4L && !h0.getBoolean(5), h0)
    // tight max_skew flips the signal without touching the table
    assert(spark.sql(
      "CALL gproc9.system.semdedup_health('main.va', max_skew => 1.1)")
      .collect()(0).getBoolean(5))
    val pr = spark.sql(
      "CALL gproc9.system.prune_assignments('main.vc', 'main.va')").collect()
    assert(pr(0).getLong(0) == 4L, s"4 erased vectors must prune: ${pr.toSeq}")
    assert(spark.sql("SELECT COUNT(*) FROM gproc9.main.va")
      .collect()(0).getLong(0) == 6L)

    // streaming-replay guard: a table whose history carries young
    // streaming batch loadIds refuses expiry without force
    w.writeTable("main", "st", Seq(Seq((1L, "a")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "q-batch-0")
    w.writeTable("main", "st", Seq(Seq((2L, "b")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "q-batch-1")
    val e = intercept[Exception] {
      spark.sql(
        "CALL gproc9.system.expire_snapshots('main.st', 1)").collect()
    }
    assert(e.getMessage.contains("streaming") ||
      Option(e.getCause).exists(_.getMessage.contains("streaming")),
      s"guard must explain the streaming-replay hazard: ${e.getMessage}")
    assert(cat.loadTable("main", "st").metadata.snapshots.size == 2,
      "guarded call must not have committed anything")
    // force overrides; the expiry then proceeds (return value counts
    // DELETED FILES — appended files stay referenced by the head, so 0)
    spark.sql(
      "CALL gproc9.system.expire_snapshots('main.st', 1, force => true)")
      .collect()
    assert(cat.loadTable("main", "st").metadata.snapshots.size == 1,
      "forced expiry must drop history")
    // per-table retention floor: with the property at 0 the guard passes
    // without force (the batch is 'old enough' by the table's own rule)
    cat.loadTable("main", "st").commit(m => m.copy(properties =
      m.properties + (Maintenance.StreamExpireMinAgeProp -> "0")), unitMs = 1)
    w.writeTable("main", "st", Seq(Seq((3L, "c")).toDF("id", "v")),
      Append, WriteConfig(retryUnitMs = 1), "q-batch-2")
    spark.sql(
      "CALL gproc9.system.expire_snapshots('main.st', 1)").collect()
    assert(cat.loadTable("main", "st").metadata.snapshots.size == 1,
      "retention floor 0 must allow un-forced expiry")
  }
}
