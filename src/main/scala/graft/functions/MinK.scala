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

object MinK {
  /** `minK(k)(x)` — column form of [[MinKAgg]]. */
  def minK(k: Int): Column => Column = {
    val fn = udaf(new MinKAgg(k))
    (c: Column) => fn(c)
  }
}
