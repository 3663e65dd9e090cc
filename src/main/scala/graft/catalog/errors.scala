package graft.catalog

/** Error taxonomy mirroring the reference's retryable / non-retryable
  * classification (`error_handling.py:44-98`): commit conflicts and
  * transient storage failures retry with exponential backoff; existence /
  * validation errors fail fast.
  */
sealed abstract class GraftError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause) {
  def retryable: Boolean
}

final class NoSuchNamespaceError(ns: String)
    extends GraftError(s"Namespace does not exist: $ns") {
  def retryable = false
}

final class NoSuchTableError(ident: String)
    extends GraftError(s"Table does not exist: $ident") {
  def retryable = false
}

final class TableAlreadyExistsError(ident: String)
    extends GraftError(s"Table already exists: $ident") {
  def retryable = false
}

final class NamespaceNotEmptyError(ns: String)
    extends GraftError(s"Namespace not empty: $ns") {
  def retryable = false
}

final class ValidationError(msg: String) extends GraftError(msg) {
  def retryable = false
}

/** A validly-configured catalog kind this environment cannot reach
  * (REST/SQL need network/driver connectivity). Non-retryable: the
  * config is fine, the capability is absent. */
final class CatalogUnavailableError(kind: CatalogKind, uri: String)
    extends GraftError(
      s"Catalog kind $kind is not reachable from this environment " +
        s"(uri: $uri); only file:// catalogs are supported offline") {
  def retryable = false
}

/** Concurrent commit detected (another writer won the CAS). The caller
  * rereads metadata, rebases its change, and retries — the same recovery
  * the reference applies to CommitFailedException
  * (`error_handling.py:44-70`, `destination.py:428-435`). */
final class CommitConflictError(ident: String, version: Int, cause: Throwable = null)
    extends GraftError(s"Concurrent commit on $ident at version $version", cause) {
  def retryable = true
}

final class CommitFailedError(ident: String, cause: Throwable)
    extends GraftError(s"Commit failed on $ident: ${cause.getMessage}", cause) {
  def retryable = true
}

object Retry {
  /** Exponential-backoff retry loop for retryable errors: attempts =
    * maxRetries, sleep = backoffBase^attempt * unitMs (reference defaults
    * max_retries=5, backoff 2.0^n seconds — `destination_client.py:147-149`;
    * unitMs is configurable so tests don't sleep for real). */
  def withRetries[T](maxRetries: Int = 5, backoffBase: Double = 2.0,
      unitMs: Long = 1000L)(f: () => T): T = {
    var attempt = 0
    while (true) {
      try return f()
      catch {
        case e: GraftError if e.retryable && attempt < maxRetries - 1 =>
          Thread.sleep((math.pow(backoffBase, attempt) * unitMs).toLong)
          attempt += 1
        case e: GraftError => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
