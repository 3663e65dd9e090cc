package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.write._
import scala.collection.mutable

/** Model-based testing of the disposition engine: random sequences of
  * keyed writes (upsert, delete-insert, replace, hard delete) replayed
  * against a trivial in-memory pk→row model; after every operation the
  * committed table must equal the model exactly. Every merge flips a
  * coin between copy-on-write and merge-on-read (the model is
  * mode-blind — both must read back identically, including across
  * rollbacks and interleaved maintenance), and applyDeletes joins the
  * content-neutral maintenance pool. Deterministic seeds, so failures
  * replay. This is the class of test that catches silent
  * pruning/rewrite/sequence-fencing bugs that per-scenario specs miss. */
class ModelCheckSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = WriteConfig(primaryKey = Seq("id"), retryUnitMs = 1,
    bloomColumns = Seq("id"))

  private def df(rows: Seq[(Long, String, java.lang.Long)]): DataFrame =
    rows.toDF("id", "v", "_dlt_deleted_at_raw")
      .withColumn("_dlt_deleted_at",
        org.apache.spark.sql.functions
          .timestamp_millis(org.apache.spark.sql.functions.col("_dlt_deleted_at_raw")))
      .drop("_dlt_deleted_at_raw")

  // deep-fuzz knob: CI runs 5 seeds; set GRAFT_MODEL_SEEDS for longer
  // offline sessions (failures replay by seed)
  private val nSeeds = sys.env.get("GRAFT_MODEL_SEEDS").map(_.toInt).getOrElse(5)

  /** Flip the table's SQL row-level mode: delta (merge-on-read +
    * primary key) or group-based copy-on-write (properties unset). */
  private def setSqlDmlMode(sqlCat: String, delta: Boolean): Unit =
    if (delta)
      spark.sql(s"ALTER TABLE $sqlCat.main.t SET TBLPROPERTIES (" +
        "'graft.delete.mode' = 'merge-on-read', 'graft.primary-key' = 'id')")
    else
      spark.sql(s"ALTER TABLE $sqlCat.main.t UNSET TBLPROPERTIES " +
        "('graft.delete.mode', 'graft.primary-key')")

  test("random disposition sequences match the in-memory model") {
    for (seed <- sys.env.get("GRAFT_MODEL_ONLY").map(x => Seq(x.toInt))
        .getOrElse(1 to nSeeds)) {
      val rnd = new scala.util.Random(1000 + seed)
      val wh = Files.createTempDirectory(s"graft-model-$seed-").toString
      val cat = new GraftCatalog(spark, wh)
      // V2 catalog over the same warehouse: SQL DML steps (UPDATE /
      // MERGE INTO, CoW and delta modes) fuzz the row-level write paths
      // against the same model
      val sqlCat = s"gmc$seed"
      spark.conf.set(s"spark.sql.catalog.$sqlCat",
        classOf[GraftSparkCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$sqlCat.warehouse", wh)
      val w = new GraftWriter(cat)
      val model = mutable.LinkedHashMap.empty[Long, String]
      val history = mutable.Buffer.empty[(Long, Map[Long, String])]
      // Iceberg field-ids observed across every export THIS seed makes:
      // ids are forever — a name must never re-export under a new id
      val fieldIdSeen = mutable.Map.empty[String, Int]
      // keys drawn from a range spanning digit-count boundaries and
      // negatives — the r1 stats bug's blind spot
      def key(): Long = rnd.between(-120L, 130L)

      val dbg = sys.env.contains("GRAFT_MODEL_DEBUG")
      (1 to 6).foreach { step =>
        val op = rnd.nextInt(14)
        val batchKeys = Seq.fill(rnd.between(1, 30))(key()).distinct
        val rows = batchKeys.map(k => (k, s"s$step-v$k", null: java.lang.Long))
        if (dbg) println(s"[mc] seed=$seed step=$step op=$op keys=${batchKeys.size}")
        // content-neutral maintenance interleaved at random: compaction
        // and expiry rewrite/drop manifests through the delta commit path
        // and must NEVER change what the table reads as
        if (rnd.nextInt(3) == 0 && cat.tableExists("main", "t")) {
          val t = cat.loadTable("main", "t")
          val mnt = rnd.nextInt(4)
          if (dbg) println(s"[mc]   maintenance branch $mnt")
          mnt match {
            case 0 =>
              try Maintenance.compact(t, smallFileBytes = 1L << 20,
                targetFileBytes = 8L << 20, retryUnitMs = 1)
              catch { case _: ValidationError => () }
            case 1 => Maintenance.expireSnapshots(t, keepLast = 2, retryUnitMs = 1)
            case 2 => Maintenance.applyDeletes(t, retryUnitMs = 1)
            case _ =>
              // flip write-path self-maintenance and/or a declared sort
              // order (both content-neutral): with the file threshold at
              // 1, nearly every subsequent MoR commit triggers an inline
              // apply mid-history, and flipping sort-order mid-history
              // mixes sorted and unsorted file layouts in one snapshot —
              // readers must not care
              val on = rnd.nextBoolean()
              val sortOn = rnd.nextBoolean()
              t.commit(m => m.copy(properties = {
                val p0 =
                  if (on) m.properties +
                    (Maintenance.AutoApplyDeletesProp -> "true") +
                    (Maintenance.MaxDeleteFilesProp -> "1")
                  else m.properties - Maintenance.AutoApplyDeletesProp -
                    Maintenance.MaxDeleteFilesProp
                if (sortOn) p0 + (GraftWriter.SortOrderProperty -> "id")
                else p0 - GraftWriter.SortOrderProperty
              }), unitMs = 1)
          }
        }
        // rollback to a recorded (snapshot, model) pair: time travel must
        // restore EXACTLY the modeled state through the manifest refs
        if (rnd.nextInt(4) == 0 && history.nonEmpty) {
          val (snapId, past) = history(rnd.nextInt(history.size))
          val t = cat.loadTable("main", "t")
          if (t.metadata.snapshots.exists(_.snapshotId == snapId)) {
            if (dbg) println(s"[mc]   rollback to $snapId")
            t.rollbackTo(snapId)
            model.clear(); past.foreach { case (k, v) => model(k) = v }
          }
        }
        // the model is merge-mode-blind: CoW and MoR must be
        // indistinguishable to readers
        val mcfg = cfg.copy(mergeOnRead = rnd.nextBoolean())
        if (dbg) println(s"[mc]   mergeOnRead=${mcfg.mergeOnRead}")
        op match {
          case 0 => // upsert
            w.writeTable("main", "t", Seq(df(rows)), Merge("upsert"), mcfg, s"l$seed-$step")
            rows.foreach { case (k, v, _) => model(k) = v }
          case 1 => // delete-insert
            w.writeTable("main", "t", Seq(df(rows)), Merge("delete-insert"), mcfg, s"l$seed-$step")
            rows.foreach { case (k, v, _) => model(k) = v }
          case 2 => // replace
            w.writeTable("main", "t", Seq(df(rows)), Replace, cfg, s"l$seed-$step")
            model.clear()
            rows.foreach { case (k, v, _) => model(k) = v }
          case 3 => // hard delete of a sample of existing keys (plus misses)
            val victims = (batchKeys.take(5) ++ model.keys.take(5)).distinct
            val marked = victims.map(k => (k, "del", java.lang.Long.valueOf(1700000000000L)))
            w.writeTable("main", "t", Seq(df(marked)), Merge("upsert"), mcfg, s"l$seed-$step")
            victims.foreach(model.remove)
          case 4 => // predicate delete over a random key range (both modes)
            if (!cat.tableExists("main", "t")) {
              w.writeTable("main", "t", Seq(df(rows)), Merge("upsert"), mcfg,
                s"l$seed-$step")
              rows.foreach { case (k, v, _) => model(k) = v }
            }
            val (lo, hi) = {
              val a = key(); val b = key(); (math.min(a, b), math.max(a, b))
            }
            w.deleteWhere("main", "t",
              org.apache.spark.sql.functions.col("id").between(lo, hi), mcfg,
              s"dw$seed-$step")
            model.keys.filter(k => k >= lo && k <= hi).toSeq.foreach(model.remove)
          case 5 => // predicate update over a random key range (both modes)
            if (!cat.tableExists("main", "t")) {
              w.writeTable("main", "t", Seq(df(rows)), Merge("upsert"), mcfg,
                s"l$seed-$step")
              rows.foreach { case (k, v, _) => model(k) = v }
            }
            val (lo, hi) = {
              val a = key(); val b = key(); (math.min(a, b), math.max(a, b))
            }
            import org.apache.spark.sql.functions.{col => c, concat, lit}
            w.updateWhere("main", "t", c("id").between(lo, hi),
              Map("v" -> concat(c("v"), lit(s"+u$step"))), mcfg,
              s"uw$seed-$step")
            model.keys.filter(k => k >= lo && k <= hi).toSeq
              .foreach(k => model(k) = model(k) + s"+u$step")
          case 6 => // SQL UPDATE through the V2 catalog (CoW or delta mode)
            if (!cat.tableExists("main", "t")) {
              w.writeTable("main", "t", Seq(df(rows)), Merge("upsert"), mcfg,
                s"l$seed-$step")
              rows.foreach { case (k, v, _) => model(k) = v }
            }
            setSqlDmlMode(sqlCat, rnd.nextBoolean())
            val (lo, hi) = {
              val a = key(); val b = key(); (math.min(a, b), math.max(a, b))
            }
            spark.sql(s"UPDATE $sqlCat.main.t SET v = concat(v, '+q$step') " +
              s"WHERE id BETWEEN $lo AND $hi")
            model.keys.filter(k => k >= lo && k <= hi).toSeq
              .foreach(k => model(k) = model(k) + s"+q$step")
          case 7 => // SQL MERGE INTO through the V2 catalog (CoW or delta)
            if (!cat.tableExists("main", "t")) {
              w.writeTable("main", "t", Seq(df(rows)), Merge("upsert"), mcfg,
                s"l$seed-$step")
              rows.foreach { case (k, v, _) => model(k) = v }
            }
            val delta7 = rnd.nextBoolean()
            setSqlDmlMode(sqlCat, delta7)
            if (dbg) {
              val m7 = cat.loadTable("main", "t").metadata
              println(s"[mc]   op7 delta=$delta7 preFiles=${m7.currentFiles.map(f => (f.path.split('/').last.take(12), f.rowCount, f.dataSeq))} " +
                s"deletes=${m7.currentSnapshot.map(_.deletes.size)} snapId=${m7.currentSnapshotId}")
            }
            df(rows).createOrReplaceTempView(s"mc_src_$seed")
            spark.sql(
              s"""MERGE INTO $sqlCat.main.t AS t USING mc_src_$seed AS s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET t.v = s.v
                 |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
                 |""".stripMargin)
            if (dbg) {
              val m7 = cat.loadTable("main", "t").metadata
              println(s"[mc]   op7 postFiles=${m7.currentFiles.map(f => (f.path.split('/').last.take(12), f.rowCount, f.dataSeq))} " +
                s"deletes=${m7.currentSnapshot.map(s => s.deletes.map(d => (d.rowCount, d.seq)))} op=${m7.currentSnapshot.map(_.operation)}")
            }
            rows.foreach { case (k, v, _) => model(k) = v }
          case 9 => // SQL MERGE WITH SCHEMA EVOLUTION: the source carries
            // a NEW nullable column; the analyzer routes the add through
            // alterTable's evolution rules (schema version bump) and the
            // merge proceeds under the evolved schema, in either
            // row-level mode
            if (!cat.tableExists("main", "t")) {
              w.writeTable("main", "t", Seq(df(rows)), Merge("upsert"), mcfg,
                s"l$seed-$step")
              rows.foreach { case (k, v, _) => model(k) = v }
            }
            setSqlDmlMode(sqlCat, rnd.nextBoolean())
            // star actions: evolution expands them AFTER the new column
            // lands (explicit `t.mN = s.mN` cannot resolve pre-evolution)
            df(rows).withColumn(s"m$step",
                org.apache.spark.sql.functions.lit(step.toLong))
              .createOrReplaceTempView(s"mc_esrc_$seed")
            spark.sql(
              s"""MERGE WITH SCHEMA EVOLUTION INTO $sqlCat.main.t AS t
                 |USING mc_esrc_$seed AS s ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *
                 |""".stripMargin)
            rows.foreach { case (k, v, _) => model(k) = v }
          case 10 => // SQL CTAS / RTAS through the staged-commit protocol:
            // the SELECT stages invisibly and publishes via one CAS; for
            // the model this is exactly a Replace (with CTAS the
            // bootstrap form). RTAS also wholesale-replaces properties —
            // the mode props are re-set by later SQL DML steps, and the
            // model is mode-blind, so the wipe is semantically inert.
            df(rows).select("id", "v")
              .createOrReplaceTempView(s"mc_rsrc_$seed")
            if (!cat.tableExists("main", "t"))
              spark.sql(s"CREATE TABLE $sqlCat.main.t AS " +
                s"SELECT id, v FROM mc_rsrc_$seed")
            else
              spark.sql(s"REPLACE TABLE $sqlCat.main.t AS " +
                s"SELECT id, v FROM mc_rsrc_$seed")
            model.clear()
            rows.foreach { case (k, v, _) => model(k) = v }
          case 11 => // REPLACE WHERE (filter overwrite): delete-matching
            // + append-batch in one snapshot (Iceberg overwrite-by-filter
            // semantics — NOT an upsert: a batch row outside the
            // predicate would simply append next to its existing key, so
            // the fuzz batch is restricted to the predicate range, the
            // shape real REPLACE WHERE backfills have)
            if (!cat.tableExists("main", "t")) {
              w.writeTable("main", "t", Seq(df(rows)), Merge("upsert"), mcfg,
                s"l$seed-$step")
              rows.foreach { case (k, v, _) => model(k) = v }
            }
            val (lo, hi) = {
              val a = key(); val b = key(); (math.min(a, b), math.max(a, b))
            }
            val inRange = rows.filter { case (k, _, _) => k >= lo && k <= hi }
            w.overwriteWhere("main", "t",
              org.apache.spark.sql.functions.col("id").between(lo, hi),
              df(inRange).select("id", "v"), cfg, s"ow$seed-$step")
            model.keys.filter(k => k >= lo && k <= hi).toSeq.foreach(model.remove)
            inRange.foreach { case (k, v, _) => model(k) = v }
          case 12 => // partition-spec evolution to bucket(4, id):
            // content-neutral for readers; later loads cluster under the
            // new spec, leaving mixed-vintage files for the dynamic-
            // overwrite degradation path to handle
            if (cat.tableExists("main", "t")) {
              val t = cat.loadTable("main", "t")
              if (t.metadata.partitionSpec.isEmpty)
                t.updatePartitionSpec(
                  Seq(graft.partition.PartitionHint.bucket(4, "id")))
            } else {
              w.writeTable("main", "t", Seq(df(rows)), Merge("upsert"), mcfg,
                s"l$seed-$step")
              rows.foreach { case (k, v, _) => model(k) = v }
            }
          case 13 => // dynamic partition overwrite: replaces exactly the
            // BATCH's partitions. Unpartitioned ⇒ Replace semantics;
            // bucket(4, id) spec ⇒ every model key hashing into a batch
            // bucket is replaced (the mirror uses the same murmur3
            // bucket as the engine) — pre-spec-vintage files route
            // through the predicate degradation, same row semantics
            if (!cat.tableExists("main", "t")) {
              w.writeTable("main", "t", Seq(df(rows)), Merge("upsert"), mcfg,
                s"l$seed-$step")
              rows.foreach { case (k, v, _) => model(k) = v }
            } else {
              val spec = cat.loadTable("main", "t").metadata.partitionSpec
              w.overwriteDynamic("main", "t", df(rows).select("id", "v"),
                cfg, s"dy$seed-$step")
              def bucketOf(k: Long): Int =
                (graft.functions.IcebergHash.hashLong(k) & Int.MaxValue) % 4
              if (spec.isEmpty) model.clear()
              else {
                val batchBuckets = batchKeys.map(bucketOf).toSet
                model.keys.filter(k => batchBuckets.contains(bucketOf(k)))
                  .toSeq.foreach(model.remove)
              }
              rows.foreach { case (k, v, _) => model(k) = v }
            }
          case 8 => // evolving upsert: a NEW nullable column appears
            // mid-history — old files must null-fill it, rollback and
            // maintenance must survive the wider schema, and the (id, v)
            // content must stay model-exact throughout
            val wide = df(rows).withColumn(s"x$step",
              org.apache.spark.sql.functions.lit(step.toLong))
            w.writeTable("main", "t", Seq(wide), Merge("upsert"), mcfg,
              s"l$seed-$step")
            rows.foreach { case (k, v, _) => model(k) = v }
        }
        val got = cat.loadTable("main", "t").read()
          .select("id", "v").collect()
          .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
        val want = model.toSeq.sortBy(_._1)
        assert(got == want,
          s"seed=$seed step=$step op=$op: table diverged from model\n" +
            s"extra: ${(got.toSet -- want.toSet).take(5)}\n" +
            s"missing: ${(want.toSet -- got.toSet).take(5)}")
        // read-pushdown probes through the V2 catalog: the same claim /
        // refuse machinery the per-scenario specs pin, but fuzzed against
        // tables that randomly carry MoR deletes, evolution stragglers,
        // mixed sort orders, and spec evolution — each probe's answer is
        // checked against the model, so a claim that fires when it must
        // refuse (or folds the wrong stats) is a caught divergence:
        //  - global COUNT/COUNT(col)/MIN/MAX (metadata-aggregate tier)
        //  - COUNT under a key-range WHERE (range-constancy claiming)
        //  - sort-key TopN (file-prefix cut under the running-extreme gap)
        //  - bare LIMIT (row-count-covering file prefix)
        if (cat.tableExists("main", "t") && model.nonEmpty) {
          val agg = spark.sql(s"SELECT count(*) AS n, count(v) AS nv, " +
            s"min(id) AS mn, max(id) AS mx FROM $sqlCat.main.t").collect()(0)
          assert(agg.getLong(0) == model.size.toLong &&
            agg.getLong(1) == model.size.toLong &&
            agg.getLong(2) == model.keys.min && agg.getLong(3) == model.keys.max,
            s"seed=$seed step=$step op=$op: aggregate probe diverged " +
              s"(got $agg, model n=${model.size} " +
              s"mn=${model.keys.min} mx=${model.keys.max}, " +
              s"directRead n=${got.length})")
          val (plo, phi) = {
            val a = key(); val b = key(); (math.min(a, b), math.max(a, b))
          }
          val nr = spark.sql(s"SELECT count(*) AS n FROM $sqlCat.main.t " +
            s"WHERE id BETWEEN $plo AND $phi").collect()(0).getLong(0)
          assert(nr == model.keys.count(k => k >= plo && k <= phi).toLong,
            s"seed=$seed step=$step op=$op: range-claim probe [$plo,$phi] " +
              s"got $nr")
          val topK = 1 + rnd.nextInt(7)
          val top = spark.sql(s"SELECT id FROM $sqlCat.main.t " +
            s"ORDER BY id LIMIT $topK").collect().map(_.getLong(0)).toSeq
          assert(top == model.keys.toSeq.sorted.take(topK),
            s"seed=$seed step=$step op=$op: TopN probe k=$topK got $top")
          val lim = spark.sql(s"SELECT id FROM $sqlCat.main.t LIMIT $topK")
            .collect().map(_.getLong(0))
          assert(lim.length == math.min(topK, model.size) &&
            lim.forall(model.contains) && lim.distinct.length == lim.length,
            s"seed=$seed step=$step op=$op: LIMIT probe k=$topK " +
              s"got ${lim.toSeq}")
        }
        // Iceberg round-trip probe: export the CURRENT tree exactly as it
        // stands — outstanding MoR backlog, partition-spec evolution
        // (op 12 flips to bucket(4) mid-history, so exports exercise
        // spec-id minting AND the mixed-vintage fallback), rollbacks,
        // evolved schemas, the re-export version chain — and re-read it
        // through the independent import path; it must equal the model.
        if (rnd.nextInt(3) == 0 && cat.tableExists("main", "t") &&
            cat.loadTable("main", "t").metadata.currentSnapshotId.isDefined) {
          val t = cat.loadTable("main", "t")
          graft.iceberg.IcebergInterop.exportTable(t)
          // field-id stability fuzz: every schema in the exported chain
          // (including schemas minted by ops 8/9's evolution and every
          // RE-export this seed already did) must agree on a name's id
          locally {
            import org.json4s._
            val mdDir = t.dir.resolve("iceberg").resolve("metadata")
            val v = Files.readString(
              mdDir.resolve("version-hint.text")).trim
            val md = org.json4s.jackson.JsonMethods.parse(Files.readString(
              mdDir.resolve(s"v$v.metadata.json")))
            (md \ "schemas") match {
              case JArray(ss) => ss.foreach { s0 =>
                (s0 \ "fields") match {
                  case JArray(fs) => fs.foreach { f =>
                    ((f \ "name"), (f \ "id")) match {
                      case (JString(n), JInt(id)) =>
                        fieldIdSeen.get(n) match {
                          case Some(prev) => assert(prev == id.toInt,
                            s"seed=$seed step=$step op=$op: field-id of " +
                              s"'$n' reassigned $prev -> $id")
                          case None => fieldIdSeen(n) = id.toInt
                        }
                      case _ => ()
                    }
                  }
                  case _ => ()
                }
              }
              case _ => ()
            }
          }
          val ice = graft.iceberg.IcebergInterop
            .importTable(spark, t.dir.resolve("iceberg").toString)
            .select("id", "v").collect()
            .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
          val want2 = model.toSeq.sortBy(_._1)
          assert(ice == want2,
            s"seed=$seed step=$step op=$op: Iceberg round-trip diverged\n" +
              s"extra: ${(ice.toSet -- want2.toSet).take(5)}\n" +
              s"missing: ${(want2.toSet -- ice.toSet).take(5)}")
          // EXTERNAL time travel: a recorded historical (snapshot, model)
          // pair must import to exactly the model of that moment — the
          // full-history export's per-snapshot manifest lists under test
          val retained = history.filter { case (sid, _) =>
            t.metadata.snapshots.exists(_.snapshotId == sid) }
          if (retained.nonEmpty) {
            val (sid, past) = retained(rnd.nextInt(retained.size))
            val at = graft.iceberg.IcebergInterop
              .importTable(spark, t.dir.resolve("iceberg").toString,
                asOfSnapshotId = Some(sid))
              .select("id", "v").collect()
              .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
            assert(at == past.toSeq.sortBy(_._1),
              s"seed=$seed step=$step op=$op: Iceberg time travel to $sid " +
                s"diverged\nextra: ${(at.toSet -- past.toSet).take(5)}\n" +
                s"missing: ${(past.toSet -- at.toSet).take(5)}")
          }
        }
        cat.loadTable("main", "t").metadata.currentSnapshotId.foreach { sid =>
          history += sid -> model.toMap
        }
      }
      // end of seed: the MIGRATION shape — export the final table and
      // ATTACH it into a fresh catalog (sequence-ordered replay, delete
      // conversion, partition/property carry); the attached table must
      // read as the model
      if (cat.tableExists("main", "t") &&
          cat.loadTable("main", "t").metadata.currentSnapshotId.isDefined) {
        val t = cat.loadTable("main", "t")
        graft.iceberg.IcebergInterop.exportTable(t)
        val cat2 = new GraftCatalog(spark,
          Files.createTempDirectory(s"graft-model-att-$seed-").toString)
        val att = graft.iceberg.IcebergInterop.importAsTable(cat2, "main",
          "attached", t.dir.resolve("iceberg").toString)
        val got = att.read().select("id", "v").collect()
          .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
        val want = model.toSeq.sortBy(_._1)
        assert(got == want,
          s"seed=$seed: ATTACHED table diverged from model\n" +
            s"extra: ${(got.toSet -- want.toSet).take(5)}\n" +
            s"missing: ${(want.toSet -- got.toSet).take(5)}")
      }
    }
  }
}
