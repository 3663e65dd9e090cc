package graft.tools

import java.nio.file.Paths
import graft.catalog._

/** Cross-process commit racer: a tiny `main` a second JVM runs to hammer
  * a table's commit CAS from OUTSIDE the test process — the only way to
  * prove the atomic-rename CAS (and the REST/SQL pointer CAS) hold
  * between real processes, not just between threads sharing one JVM's
  * memory model. Spark-free on purpose (metadata-only commits), so the
  * forked JVM needs nothing but the compiled classes + Spark's jars on
  * the classpath.
  *
  * Usage:
  *   CommitRacer file <tableDir> <n> <tag>
  *   CommitRacer rest <uri> <ns.table> <n> <tag>
  *
  * (No sql mode: embedded Derby admits ONE booting JVM per database by
  * design — cross-process SQL-store races require a server-mode DB,
  * which this sandbox cannot run. Its pointer CAS is raced cross-thread
  * in CatalogConfigSpec instead.)
  *
  * Each mode performs `n` empty-append commits tagged `<tag>-<i>`; the
  * spec then asserts NO snapshot was lost on either side. Exit 0 on
  * success, 1 with the error on stderr otherwise. */
object CommitRacer {
  def main(args: Array[String]): Unit = try {
    args(0) match {
      case "file" =>
        val t = new GraftTable(null, Paths.get(args(1)))
        val n = args(2).toInt
        val tag = args(3)
        (1 to n).foreach { i =>
          t.commit(_.withSnapshotDelta("append", Some(s"$tag-$i"), Nil,
            Set.empty), maxRetries = 100, backoffBase = 1.2, unitMs = 2)
        }
      case "rest" =>
        val client = RestCatalogClient.connect(CatalogConfig(uri = args(1)))
        val Array(ns, name) = args(2).split("\\.", 2)
        val n = args(3).toInt
        val tag = args(4)
        (1 to n).foreach { i =>
          Retry.withRetries(maxRetries = 100, backoffBase = 1.2, unitMs = 2) { () =>
            val base = client.loadMetadata(ns, name)
            val next = base.withSnapshotDelta("append", Some(s"$tag-$i"),
              Nil, Set.empty)
            try client.commit(ns, name, base.currentSnapshotId, next)
            catch {
              // 409 surfaces as ValidationError (non-retryable by
              // taxonomy): reclassify as the retryable conflict it is
              case e: ValidationError
                  if e.getMessage.contains("409") ||
                    e.getMessage.toLowerCase.contains("conflict") =>
                throw new CommitConflictError(s"$ns.$name", -1, e)
            }
          }
        }
      case other => sys.error(s"unknown mode $other")
    }
    println("RACER-OK")
  } catch {
    case e: Throwable =>
      System.err.println(s"RACER-FAIL: $e")
      sys.exit(1)
  }
}
