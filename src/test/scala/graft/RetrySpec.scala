package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._

/** Retry taxonomy semantics (`error_handling.py:44-98` port): retryable
  * errors back off and re-attempt up to max_retries; non-retryable fail
  * fast; success stops the loop. */
class RetrySpec extends AnyFunSuite {

  test("retryable error retries up to maxRetries then surfaces") {
    var attempts = 0
    val e = intercept[CommitConflictError] {
      Retry.withRetries(maxRetries = 4, unitMs = 1) { () =>
        attempts += 1
        throw new CommitConflictError("t", attempts)
      }
    }
    assert(attempts == 4)
    assert(e.retryable)
  }

  test("success after transient failures returns the value") {
    var attempts = 0
    val out = Retry.withRetries(maxRetries = 5, unitMs = 1) { () =>
      attempts += 1
      if (attempts < 3) throw new CommitFailedError("t", new RuntimeException("io"))
      "ok"
    }
    assert(out == "ok" && attempts == 3)
  }

  test("non-retryable errors fail fast on the first attempt") {
    var attempts = 0
    intercept[NoSuchTableError] {
      Retry.withRetries(maxRetries = 5, unitMs = 1) { () =>
        attempts += 1
        throw new NoSuchTableError("main.users")
      }
    }
    assert(attempts == 1)
    intercept[ValidationError] {
      Retry.withRetries(maxRetries = 5, unitMs = 1) { () =>
        throw new ValidationError("bad")
      }
    }
  }

  test("taxonomy classification matches the reference split") {
    // retryable: commit conflicts / transient commit failures
    assert(new CommitConflictError("t", 1).retryable)
    assert(new CommitFailedError("t", new RuntimeException).retryable)
    // non-retryable: existence + validation errors
    assert(!new NoSuchTableError("t").retryable)
    assert(!new NoSuchNamespaceError("ns").retryable)
    assert(!new TableAlreadyExistsError("t").retryable)
    assert(!new NamespaceNotEmptyError("ns").retryable)
    assert(!new ValidationError("v").retryable)
  }
}
