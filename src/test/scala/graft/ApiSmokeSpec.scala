package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.write._

/** Port of the reference's API-shape smoke tier (test_smoke.py:16-128):
  * the public surface exists with the documented defaults. */
class ApiSmokeSpec extends AnyFunSuite {

  test("dispositions cover the reference surface") {
    val all: Seq[Disposition] =
      Seq(Append, Replace, Merge("upsert"), Merge("delete-insert"), Merge())
    assert(all.size == 5)
    assert(Merge().strategy == "upsert") // string "merge" defaults to upsert
  }

  test("write config defaults mirror the reference's capabilities") {
    val cfg = WriteConfig()
    assert(cfg.hardDeleteColumn == "_dlt_deleted_at") // destination_client.py:165-167
    assert(cfg.mergeBatchSize == 500000)              // destination_client.py:154-155
    assert(cfg.maxRetries == 5)                       // destination_client.py:148
    assert(cfg.backoffBase == 2.0)                    // destination_client.py:149
    assert(cfg.strictCasting)                         // strict by default
    assert(!cfg.allowColumnDrops)                     // drops opt-in only
    assert(cfg.primaryKey.isEmpty && cfg.mergeKeys.isEmpty)
  }

  test("type capability caps match the declared destination capabilities") {
    import graft.types.TypeLattice
    assert(TypeLattice.MaxDecimalPrecision == 38) // destination_client.py:1579
    assert(TypeLattice.MaxDecimalScale == 9)
    assert(TypeLattice.MaxIdentifierLength == 255) // destination_client.py:1584
  }

  test("driver contract: every query has a name-stable entry; oracles subset") {
    val qs = SparkEntry.queries
    assert(qs.size >= 60)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    // EVERY entry carries an oracle: the six formerly rows-only ANN/
    // dedup entries (custom hashing / sampled centroids / iterative
    // k-means that portable SQL can't express) now stage their
    // Spark-computed candidates/fingerprints/assignments to
    // /tmp/graft-oracle-stage and the oracle verifies the downstream
    // exact computation over the staged sets (self-sealing: staging
    // drift surfaces as a hash mismatch)
    assert((qs.keySet -- SparkEntry.oracleSql.keySet) == Set.empty)
  }
}
