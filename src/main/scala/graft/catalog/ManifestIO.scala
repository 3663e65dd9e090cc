package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Manifest files: one immutable JSON file per committed file group,
  * referenced from snapshots by path — the Iceberg manifest-list idea.
  *
  * Inlining every snapshot's full file list in the table metadata made
  * each commit rewrite O(snapshots × files) JSON; at 10⁵ files and 10⁴
  * loads that is tens of MB per commit and the real scale ceiling of the
  * metadata layer. With manifests, a commit writes only the file groups
  * that CHANGED (an append writes exactly one manifest for the staged
  * files; a merge rewrites only manifests that lost a file) and the
  * metadata JSON stays O(snapshots × manifests-per-snapshot).
  *
  * Manifests are immutable once written (unique names, CREATE_NEW), which
  * makes the read cache trivially coherent; failed CAS attempts leave
  * orphan manifests that `Maintenance.vacuumOrphans` collects.
  */
object ManifestIO {
  private case class ManifestDoc(files: Seq[DataFile])
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFile]]()

  def write(metadataDir: Path, files: Seq[DataFile]): String = {
    Files.createDirectories(metadataDir)
    val p = metadataDir.resolve(
      s"manifest-${java.util.UUID.randomUUID().toString.take(12)}.json")
    Files.write(p,
      JsonMethods.compact(Extraction.decompose(ManifestDoc(files))).getBytes(UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    val key = p.toAbsolutePath.toString
    cache.put(key, files)
    key
  }

  def read(path: String): Seq[DataFile] =
    cache.computeIfAbsent(Paths.get(path).toAbsolutePath.toString, _ =>
      JsonMethods.parse(new String(Files.readAllBytes(Paths.get(path)), UTF_8))
        .extract[ManifestDoc].files)

  /** Drop deleted manifests from the cache (expiry/vacuum). */
  def invalidate(path: String): Unit =
    cache.remove(Paths.get(path).toAbsolutePath.toString)
}
