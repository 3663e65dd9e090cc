package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Externalized snapshot body: the heavy per-snapshot content — manifest
  * refs (with path blooms and column ranges) and outstanding
  * merge-on-read delete lists — as ONE immutable JSON file per snapshot,
  * referenced from the table metadata by path.
  *
  * Without this, every snapshot inlines its full ref + delete lists in
  * `v<N>.metadata.json`, so a trickle-merge history of N commits rewrites
  * and re-parses O(N²) JSON (each commit re-serializes every prior
  * snapshot's lists) — measured at ~4 MB metadata by commit 100 and
  * multi-second commits by depth 500 in the delete-backlog bench. With
  * bodies, the metadata JSON keeps O(1) per snapshot (identity + summary
  * counts + the body path) and a commit writes exactly one body file
  * sized by its OWN content.
  *
  * Same lifecycle discipline as [[ManifestIO]] manifests: immutable,
  * uniquely named, CREATE_NEW; shared across snapshots by path identity
  * (rollback copies the path); `Maintenance.expireSnapshots` deletes
  * bodies referenced only by expired snapshots and `vacuumOrphans`
  * collects bodies left by failed CAS attempts.
  */
final case class SnapBody(
    manifestRefs: Seq[ManifestRef],
    deleteFiles: Seq[DeleteFile],
    posDeleteFiles: Seq[PosDeleteFile])

/** Aggregate counts kept INLINE in the snapshot when the body is
  * externalized, so `history()` / `describe()` stay metadata-only. */
final case class SnapSummary(rowCount: Long, fileCount: Int, sizeBytes: Long)

object SnapBodyIO {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  private val MaxCachedBodies = 256
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, SnapBody](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, SnapBody]): Boolean =
        size() > MaxCachedBodies
    })

  /** Write one immutable body file and return its path (cache primed, so
    * the committing JVM never re-reads what it just wrote). */
  def write(metadataDir: Path, body: SnapBody): String = {
    Files.createDirectories(metadataDir)
    val p = metadataDir.resolve(
      s"snapbody-${java.util.UUID.randomUUID().toString.take(12)}.json")
    Files.write(p, JsonMethods.compact(Extraction.decompose(body)).getBytes(UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    val abs = p.toAbsolutePath.toString
    cache.put(abs, body)
    abs
  }

  def read(path: String): SnapBody = {
    val abs = Paths.get(path).toAbsolutePath.toString
    val hit = cache.get(abs)
    if (hit != null) return hit
    val body = JsonMethods.parse(
      new String(Files.readAllBytes(Paths.get(abs)), UTF_8)).extract[SnapBody]
    cache.put(abs, body)
    body
  }

  def invalidate(path: String): Unit = {
    cache.remove(Paths.get(path).toAbsolutePath.toString)
    ()
  }
}
