package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Manifest files: one immutable JSON file per committed file group,
  * referenced from snapshots by [[ManifestRef]] — the Iceberg
  * manifest-list idea.
  *
  * Inlining every snapshot's full file list in the table metadata made
  * each commit rewrite O(snapshots × files) JSON; at 10⁵ files and 10⁴
  * loads that is tens of MB per commit and the real scale ceiling of the
  * metadata layer. With manifests, a commit writes only the file groups
  * that CHANGED (an append writes exactly one manifest for the staged
  * files; a merge rewrites only manifests that lost a file) and the
  * metadata JSON stays O(snapshots × manifests-per-snapshot). Reuse is
  * decided from snapshot-stored refs (counts + path bloom), so the commit
  * path performs ZERO body reads for untouched manifests — a cold JVM
  * (every real batch job) no longer pays one JSON read per live manifest
  * per commit.
  *
  * Manifests are immutable once written (unique names, CREATE_NEW), which
  * makes the read cache trivially coherent and the path a sound content
  * identity; failed CAS attempts leave orphan manifests that
  * `Maintenance.vacuumOrphans` collects.
  */
object ManifestIO {
  private case class ManifestDoc(files: Seq[DataFile])
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  /** Bounded LRU: a long-lived multi-table session must not pin every
    * manifest it ever touched (the commit path no longer depends on this
    * cache for its cost bound, so eviction is always safe). */
  private val MaxCachedManifests = 1024
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Seq[DataFile]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[DataFile]]): Boolean =
        size() > MaxCachedManifests
    })

  /** Count of actual manifest body parses (cache misses) — observability
    * hook for the cold-JVM commit-cost invariant (`ManifestScaleSpec`). */
  val bodyReads = new AtomicLong(0L)

  def write(metadataDir: Path, files: Seq[DataFile]): String =
    writeRef(metadataDir, files, _ => None).path

  /** Write one immutable manifest and return its snapshot-side ref
    * (counts + path bloom + typed per-column ranges). `statType`
    * resolves a stat column's comparison type — columns it cannot
    * resolve get no ref-level range (conservatively opened by pruning),
    * never a mis-typed one. */
  def writeRef(metadataDir: Path, files: Seq[DataFile],
      statType: String => Option[org.apache.spark.sql.types.DataType]): ManifestRef = {
    Files.createDirectories(metadataDir)
    val p = metadataDir.resolve(
      s"manifest-${java.util.UUID.randomUUID().toString.take(12)}.json")
    Files.write(p,
      JsonMethods.compact(Extraction.decompose(ManifestDoc(files))).getBytes(UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    val key = p.toAbsolutePath.toString
    cache.put(key, files)
    refOf(key, files, statType)
  }

  private def refOf(path: String, files: Seq[DataFile],
      statType: String => Option[org.apache.spark.sql.types.DataType]): ManifestRef = {
    // aggregate typed ranges for columns EVERY member file has stats for
    // (a file without stats could hold anything — the whole manifest must
    // then stay conservatively open for that column)
    val (mins, maxs) =
      if (files.isEmpty) (Map.empty[String, String], Map.empty[String, String])
      else {
        val shared = files.map(_.stats.collect {
          case (c, ColumnStats(Some(_), Some(_), _, _, _)) => c
        }.toSet).reduce(_ intersect _)
        val typed = shared.flatMap(c => statType(c).map(c -> _)).toMap
        val mins = typed.map { case (c, dt) =>
          c -> files.map(_.stats(c).min.get)
            .min((a: String, b: String) => StatCompare.compare(dt, a, b))
        }
        val maxs = typed.map { case (c, dt) =>
          c -> files.map(_.stats(c).max.get)
            .max((a: String, b: String) => StatCompare.compare(dt, a, b))
        }
        (mins, maxs)
      }
    ManifestRef(path, files.size, files.map(_.rowCount).sum,
      files.map(_.sizeBytes).sum,
      Some(KeyBloom.build(files.map(_.path))),
      if (mins.isEmpty) None else Some(mins),
      if (maxs.isEmpty) None else Some(maxs))
  }

  /** Striped per-key locks: same-key cold readers serialize (so each
    * manifest body parses exactly once and `bodyReads` stays an exact
    * cold-read count — the cold-JVM commit-cost specs assert on it),
    * while cold reads of DIFFERENT manifests run their IO + parse in
    * parallel across stripes for multi-table driver-side planning. */
  private val readStripes = Array.fill(64)(new Object)

  def read(path: String): Seq[DataFile] = {
    val key = Paths.get(path).toAbsolutePath.toString
    val fast = cache.get(key)
    if (fast != null) return fast
    readStripes(math.floorMod(key.hashCode, readStripes.length)).synchronized {
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        bodyReads.incrementAndGet()
        val files = JsonMethods.parse(
          new String(Files.readAllBytes(Paths.get(path)), UTF_8))
          .extract[ManifestDoc].files
        cache.put(key, files)
        files
      }
    }
  }

  /** Build a ref for a legacy bare-path manifest reference (reads the
    * body once; the next snapshot then carries the ref forward). */
  def refFor(path: String,
      statType: String => Option[org.apache.spark.sql.types.DataType]): ManifestRef =
    refOf(Paths.get(path).toAbsolutePath.toString, read(path), statType)

  /** Drop deleted manifests from the cache (expiry/vacuum). */
  def invalidate(path: String): Unit =
    cache.remove(Paths.get(path).toAbsolutePath.toString)

  /** Test hook: simulate a fresh JVM (empty cache, zeroed counters). */
  def clearCacheForTesting(): Unit = { cache.clear(); bodyReads.set(0L) }
}
