package graft.write

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._
import graft.catalog.{DataFile, GraftTable}
import scala.jdk.CollectionConverters._

/** Table maintenance: small-file compaction, snapshot expiry, orphan
  * vacuum. The reference inherits these from Iceberg's table services;
  * here they are snapshot rewrites over the same commit protocol, so they
  * compose with concurrent writers (CAS + rebase) and never break time
  * travel for retained snapshots.
  */
object Maintenance {

  /** Bin-pack files smaller than `smallFileBytes` into ~`targetFileBytes`
    * outputs. Only the small files are rewritten; full-size files carry
    * over untouched. Commits one "compact" snapshot (row set unchanged —
    * callers can verify: compaction is content-neutral by construction). */
  def compact(t: GraftTable, smallFileBytes: Long = 32L << 20,
      targetFileBytes: Long = 128L << 20, retryUnitMs: Long = 1000L): Boolean = {
    val m = t.metadata
    val small = m.currentFiles.filter(_.sizeBytes < smallFileBytes)
    if (small.size < 2) return false
    val totalBytes = small.map(_.sizeBytes).sum
    val numOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = t.spark.read.schema(m.schema).parquet(small.map(_.path): _*)
      .coalesce(numOut)
    // rebuild table-property bloom stats: compacted files must keep the
    // membership filters or point lookups degrade to full scans
    val staged = Stager.stage(df, t.dataDir, "compact", m.partitionSpec,
      bloomColumns = GraftWriter.tableBloomColumns(m))
    val smallPaths = small.map(_.path).toSet
    t.commit({ fresh =>
      // rebase-safe only if the small set is still current; if a
      // concurrent writer rewrote any of them, drop this compaction
      val cur = fresh.currentFiles.map(_.path).toSet
      if (!smallPaths.subsetOf(cur))
        throw new graft.catalog.ValidationError("compaction superseded by concurrent commit")
      fresh.withSnapshotDelta("compact", None, staged, smallPaths)
    }, unitMs = retryUnitMs)
    true
  }

  /** Expire snapshots, keeping the most recent `keepLast` (the current
    * snapshot always survives). Data files referenced only by expired
    * snapshots are deleted from disk. Time travel remains valid for every
    * retained snapshot. */
  def expireSnapshots(t: GraftTable, keepLast: Int = 1,
      retryUnitMs: Long = 1000L): Seq[String] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    var removed: Seq[String] = Nil
    var removedManifests: Seq[String] = Nil
    t.commit({ fresh =>
      val keep = fresh.snapshots.sortBy(_.snapshotId).takeRight(keepLast) ++
        fresh.currentSnapshot.toSeq
      val keepIds = keep.map(_.snapshotId).toSet
      val retained = fresh.snapshots.filter(s => keepIds.contains(s.snapshotId))
      val expired = fresh.snapshots.filterNot(s => keepIds.contains(s.snapshotId))
      val liveFiles = retained.flatMap(_.dataFiles.map(_.path)).toSet
      removed = expired.flatMap(_.dataFiles.map(_.path))
        .distinct.filterNot(liveFiles.contains)
      // manifests referenced only by expired snapshots go too
      val liveManifests = retained.flatMap(_.manifestPaths).toSet
      removedManifests = expired.flatMap(_.manifestPaths)
        .distinct.filterNot(liveManifests.contains)
      fresh.copy(snapshots = retained)
    }, unitMs = retryUnitMs)
    removed.foreach(p => Files.deleteIfExists(Paths.get(p)))
    removedManifests.foreach { p =>
      Files.deleteIfExists(Paths.get(p))
      graft.catalog.ManifestIO.invalidate(p)
    }
    removed
  }

  /** Delete data files on disk that no snapshot references — cleans up
    * rebase/abort orphans left by the optimistic-concurrency write path.
    * `minAgeMs` is the standard safety margin against racing an in-flight
    * stage that hasn't committed yet: a concurrent writer creates its
    * manifest and data files BEFORE its CAS commit, and a vacuum racing
    * that window would see them unreferenced and delete them out from
    * under the winning snapshot (Iceberg's remove_orphan_files has the
    * same guard). The default (10 min) must stay >> max commit latency;
    * 0 is only safe when no concurrent writer can be in flight. */
  val DefaultVacuumMinAgeMs: Long = 10L * 60 * 1000

  def vacuumOrphans(t: GraftTable, minAgeMs: Long = DefaultVacuumMinAgeMs): Seq[String] = {
    if (!Files.isDirectory(t.dataDir)) return Nil
    val m = t.metadata
    val referenced = m.snapshots
      .flatMap(_.dataFiles.map(f => Paths.get(f.path).toAbsolutePath.toString)).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    val orphans = Files.walk(t.dataDir).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
      .map(_.toAbsolutePath.toString)
      .filterNot(referenced.contains)
      .toSeq
    orphans.foreach(p => Files.deleteIfExists(Paths.get(p)))
    // manifests left by failed/rebased CAS attempts: delete any manifest
    // file no snapshot references (same age guard)
    val liveManifests = m.snapshots.flatMap(_.manifestPaths)
      .map(p => Paths.get(p).toAbsolutePath.toString).toSet
    if (Files.isDirectory(t.metadataDir))
      Files.list(t.metadataDir).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("manifest-"))
        .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
        .filter(p => !liveManifests.contains(p.toAbsolutePath.toString))
        .foreach { p =>
          Files.deleteIfExists(p)
          graft.catalog.ManifestIO.invalidate(p.toString)
        }
    // remove now-empty staging dirs
    Files.walk(t.dataDir).iterator().asScala.toSeq.reverse
      .filter(p => Files.isDirectory(p) && p != t.dataDir)
      .foreach { d =>
        if (!Files.list(d).iterator().hasNext) Files.deleteIfExists(d)
      }
    orphans
  }
}
