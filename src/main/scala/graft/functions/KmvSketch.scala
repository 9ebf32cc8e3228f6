package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * [[Aggregator]] — the Catalyst typed-aggregation tier (Beyer et al.,
  * "On Synopses for Distinct-Value Estimation Under Multiset Operations",
  * SIGMOD 2007).
  *
  * Input: 60-bit non-negative hashes ([[Hashing.md5Long]]). Buffer: the k
  * smallest DISTINCT hashes seen, sorted ascending — mergeable state, so
  * partial aggregation applies map-side like any built-in agg. Estimate:
  * exact |buffer| while fewer than k distinct values exist, else the
  * standard (k−1)·2^60 / kthMin estimator. Every step is integer-exact
  * until one final double expression, so — unlike HLL — the result is
  * deterministic and cross-engine oracle-checkable.
  */
class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k > 0, "KmvDistinct requires k > 0")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    // fast path: ignore hashes beyond the current kth minimum
    if (buf.length == k && h >= buf(k - 1)) buf
    else {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val idx = -(pos + 1) // one search: sign carries the insertion point
        val merged = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, merged, 0, idx)
        merged(idx) = h
        System.arraycopy(buf, idx, merged, idx + 1, buf.length - idx)
        if (merged.length > k) java.util.Arrays.copyOf(merged, k) else merged
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = (a ++ b).distinct
    java.util.Arrays.sort(out)
    if (out.length > k) java.util.Arrays.copyOf(out, k) else out
  }

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * 1152921504606846976.0 / buf(k - 1).toDouble // 2^60

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
