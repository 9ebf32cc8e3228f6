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
private[functions] object Kmv {
  /** Insert one hash into a sorted k-bounded distinct buffer. */
  def insert(buf: Array[Long], h: Long, k: Int): Array[Long] = {
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

  /** Merge two sorted distinct buffers, keeping the k smallest. */
  def mergeBufs(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = (a ++ b).distinct
    java.util.Arrays.sort(out)
    if (out.length > k) java.util.Arrays.copyOf(out, k) else out
  }
}

class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k > 0, "KmvDistinct requires k > 0")

  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    Kmv.insert(buf, h, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    Kmv.mergeBufs(a, b, k)

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * 1152921504606846976.0 / buf(k - 1).toDouble // 2^60

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** The SIGNATURE itself — the k smallest distinct hashes, sorted
  * ascending — instead of the cardinality estimate derived from it. The
  * bottom-k/KMV multiset synopsis (Beyer et al. 2007 §4; Cohen & Kaplan,
  * "Summarizing Data using Bottom-k Sketches", PODC 2007): signatures of
  * two sets COMPOSE — the k smallest of a union are computable from the
  * two k-truncated signatures alone (any union element among the overall
  * k smallest is among its own set's k smallest), so pairwise Jaccard is
  * estimable per source PAIR from per-source state that is O(k) no
  * matter how many shingles a source holds. Deterministic (exact integer
  * hashes, no randomness beyond the hash itself), hence cross-engine
  * oracle-checkable — unlike HLL-family sketches.
  */
class KmvSignature(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, "KmvSignature requires k > 0")

  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    Kmv.insert(buf, h, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    Kmv.mergeBufs(a, b, k)
  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
