package graft.tools

import org.apache.spark.sql.SparkSession
import graft.catalog.GraftCatalog
import graft.write.{Append, GraftWriter, Maintenance, Merge, WriteConfig}

/** Delete-backlog degradation curve: how much does an accumulated
  * merge-on-read backlog cost the read path, and when does the
  * maintenance signal fire?
  *
  * Builds one bucketed MoR table, then trickle-upserts one key per
  * commit; at checkpoint backlog depths it measures (a) a full-scan
  * aggregate and (b) a point-filtered read, plus the metadata-only
  * [[Maintenance.deleteBacklog]] accounting. The curve backs the
  * BASELINE.md claim that "compaction bounds the working set": the
  * per-read cost grows with outstanding delete files, the signal fires
  * at the configured ratio, and one `applyDeletes` resets the curve to
  * its clean-scan floor.
  *
  * Usage: `runMain graft.tools.DeleteBacklogBench [baseRows] [maxDepth]`
  * (defaults 200000 and 1000). Prints one line per checkpoint.
  */
object DeleteBacklogBench {
  def main(args: Array[String]): Unit = {
    val baseRows = args.headOption.map(_.toInt).getOrElse(200000)
    val maxDepth = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val wh = java.nio.file.Files.createTempDirectory("graft-backlog-").toString
    val cat = new GraftCatalog(spark, wh)
    val w = new GraftWriter(cat)
    val cfg = WriteConfig(retryUnitMs = 1, primaryKey = Seq("id"),
      mergeOnRead = true,
      partitions = Seq(graft.partition.PartitionHint.bucket(8, "id")))
    w.writeTable("main", "t",
      Seq((1 to baseRows).map(i => (i.toLong, i.toLong * 3)).toDF("id", "v")),
      Append, cfg, "l0")

    def measure(tag: String): Unit = {
      val t = cat.loadTable("main", "t")
      val r = Maintenance.deleteBacklog(t)
      // warm once, then time the better of two runs (page cache noise)
      def time(f: => Unit): Double = {
        f
        (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      }
      val scanS = time { t.read().agg(org.apache.spark.sql.functions
        .sum("v")).collect(); () }
      val pointS = time { t.read()
        .filter(org.apache.spark.sql.functions.col("id") === 12345L)
        .collect(); () }
      println(f"BACKLOG $tag%-8s deleteFiles=${r.deleteFileCount}%5d " +
        f"deleteRows=${r.deleteRows}%7d ratio=${r.ratio}%.4f " +
        f"needsMaint=${r.needsMaintenance}%-5s scan=${scanS}%.3fs " +
        f"point=${pointS}%.3fs")
    }

    measure("clean")
    val checkpoints = Set(10, 100, maxDepth)
    var depth = 0
    while (depth < maxDepth) {
      depth += 1
      val key = (depth % baseRows).toLong + 1L
      w.writeTable("main", "t",
        Seq(Seq((key, -depth.toLong)).toDF("id", "v")),
        Merge("upsert"), cfg, s"m$depth")
      if (checkpoints.contains(depth)) measure(s"d=$depth")
    }
    val t0 = System.nanoTime()
    Maintenance.applyDeletes(cat.loadTable("main", "t"), retryUnitMs = 1)
    println(f"BACKLOG apply_deletes ${(System.nanoTime() - t0) / 1e9}%.2fs")
    measure("applied")

    // ---- auto-apply arm: the same trickle with self-maintenance on.
    // The writer now pays the backlog down whenever the file-count
    // threshold trips, so read latency should hold at the bounded floor
    // while commit latency absorbs periodic apply spikes — the trade
    // the property documents.
    cat.loadTable("main", "t").commit(m => m.copy(properties =
      m.properties + (Maintenance.AutoApplyDeletesProp -> "true")), unitMs = 1)
    def applies(): Int = cat.loadTable("main", "t").metadata.snapshots
      .count(_.operation == "apply-deletes")
    val appliesBefore = applies()
    var commitS = List.empty[Double]
    depth = 0
    while (depth < maxDepth) {
      depth += 1
      val key = (depth % baseRows).toLong + 1L
      val c0 = System.nanoTime()
      w.writeTable("main", "t",
        Seq(Seq((key, -depth.toLong)).toDF("id", "v")),
        Merge("upsert"), cfg, s"a$depth")
      commitS ::= (System.nanoTime() - c0) / 1e9
      if (checkpoints.contains(depth)) measure(s"auto=$depth")
    }
    val fired = applies() - appliesBefore
    println(f"BACKLOG auto-apply fired=$fired%d " +
      f"commitAvg=${commitS.sum / commitS.size}%.3fs " +
      f"commitMax=${commitS.max}%.2fs " +
      f"restingDeleteFiles=${Maintenance.deleteBacklog(
        cat.loadTable("main", "t")).deleteFileCount}%d")

    // ---- auto-compact arm: the same trickle also leaves one small DATA
    // file per commit (the apply-deletes rewrites touch only affected
    // files); with graft.write.auto-compact on, the file_health signal
    // bounds the resting file population the same way auto-apply bounds
    // the delete backlog — reads stop paying a per-file open tax that
    // grows with commit count.
    cat.loadTable("main", "t").commit(m => m.copy(properties =
      m.properties + (Maintenance.AutoCompactProp -> "true")
        + (Maintenance.MaxSmallFilesProp -> "64")), unitMs = 1)
    def compacts(): Int = cat.loadTable("main", "t").metadata.snapshots
      .count(_.operation == "compact")
    val compactsBefore = compacts()
    var commitS2 = List.empty[Double]
    depth = 0
    while (depth < maxDepth) {
      depth += 1
      val key = (depth % baseRows).toLong + 1L
      val c0 = System.nanoTime()
      w.writeTable("main", "t",
        Seq(Seq((key, -depth.toLong)).toDF("id", "v")),
        Merge("upsert"), cfg, s"c$depth")
      commitS2 ::= (System.nanoTime() - c0) / 1e9
      if (checkpoints.contains(depth)) measure(s"cmp=$depth")
    }
    val h = Maintenance.fileHealth(cat.loadTable("main", "t"))
    println(f"BACKLOG auto-compact fired=${compacts() - compactsBefore}%d " +
      f"commitAvg=${commitS2.sum / commitS2.size}%.3fs " +
      f"commitMax=${commitS2.max}%.2fs " +
      f"restingDataFiles=${h.fileCount}%d smallFiles=${h.smallFileCount}%d")
    spark.stop()
  }
}
