package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact k-smallest aggregate with a BOUNDED buffer — the skew-safe
  * primitive behind per-group quota selection (see
  * [[graft.llmops.TextOps.domainQuota]]).
  *
  * The naive forms both break at scale: a window
  * `row_number() OVER (PARTITION BY group ORDER BY x)` sorts every hot
  * group inside one task, and `slice(array_sort(collect_list(x)), 1, k)`
  * materializes the whole group in the aggregation buffer before
  * cutting. This Aggregator's buffer NEVER exceeds `k` elements:
  * `reduce` drops any value past the current k-th smallest, `merge` is
  * a bounded sorted-merge, so a billion-row group costs the same buffer
  * as a k-row one and partial (map-side) aggregation stays effective —
  * the property that makes per-domain quotas safe on a corpus whose
  * top domain holds 10% of all documents.
  *
  * Returns the ascending k-smallest values (fewer when the group is
  * smaller than k). Runs under ObjectHashAggregate like Spark's own
  * collect/percentile aggregates.
  */
final class MinKAgg(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k >= 1, s"min-k needs k >= 1, got $k")

  override def zero: Array[Long] = Array.empty

  /** Sorted-ascending invariant; O(k) insert only when x improves. */
  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    if (buf.length >= k && x >= buf(buf.length - 1)) buf
    else {
      val at = {
        val i = java.util.Arrays.binarySearch(buf, x)
        if (i >= 0) i else -(i + 1)
      }
      val n = math.min(buf.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, at)
      out(at) = x
      System.arraycopy(buf, at, out, at + 1, n - at - 1)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var (i, j, o) = (0, 0, 0)
      while (o < out.length) {
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          out(o) = a(i); i += 1
        } else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** [[MinKAgg]] over (key, tiebreak) PAIRS with lexicographic order —
  * the total-order variant for quota selection where the key alone is
  * not injective. `domainQuota`'s modular-permutation priority is a
  * bijection only on doc_ids < 2³²; past that, priority collisions at
  * the cutoff would keep MORE than k rows under a key-only cutoff
  * (`priority <= cut` admits every collider). Carrying the tiebreak
  * through the aggregate makes the k-th smallest PAIR the cutoff, so
  * the kept set is exactly k under any collision pattern. Same bounded
  * O(k) buffer and map-side-combine shape as [[MinKAgg]]. */
final class MinK2Agg(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, s"min-k needs k >= 1, got $k")

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Long, Long)] = Array.empty

  /** Sorted-ascending invariant; O(k) insert only when x improves. */
  override def reduce(buf: Array[(Long, Long)],
      x: (Long, Long)): Array[(Long, Long)] = {
    if (buf.length >= k && !lt(x, buf(buf.length - 1))) buf
    else {
      var at = 0
      while (at < buf.length && !lt(x, buf(at))) at += 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[(Long, Long)](n)
      System.arraycopy(buf, 0, out, 0, at)
      out(at) = x
      System.arraycopy(buf, at, out, at + 1, n - at - 1)
      out
    }
  }

  override def merge(a: Array[(Long, Long)],
      b: Array[(Long, Long)]): Array[(Long, Long)] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = new Array[(Long, Long)](math.min(a.length + b.length, k))
      var (i, j, o) = (0, 0, 0)
      while (o < out.length) {
        if (j >= b.length || (i < a.length && !lt(b(j), a(i)))) {
          out(o) = a(i); i += 1
        } else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }
  }

  override def finish(buf: Array[(Long, Long)]): Seq[(Long, Long)] = buf.toSeq

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

object MinK {
  /** `minK(k)(x)` — column form of [[MinKAgg]]. */
  def minK(k: Int): Column => Column = {
    val fn = udaf(new MinKAgg(k))
    (c: Column) => fn(c)
  }

  /** `minK2(k)(key, tiebreak)` — column form of [[MinK2Agg]]; returns
    * the lexicographically ascending k-smallest (key, tiebreak) pairs as
    * an array of structs with fields `_1`/`_2`. */
  def minK2(k: Int): (Column, Column) => Column = {
    val fn = udaf(new MinK2Agg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    (key: Column, tie: Column) => fn(key, tie)
  }
}
