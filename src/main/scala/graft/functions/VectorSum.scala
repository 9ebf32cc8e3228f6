package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise exact int64 vector sum as a typed [[Aggregator]] — the
  * mergeable way to build a centroid (sum) vector per group: Spark runs
  * the reduce map-side, so a 100 TB corpus shuffles only #groups × dim
  * longs of partial sums, never the vectors themselves and never a ×dim
  * exploded row set (the alternative explode+groupBy formulation shuffles
  * dim rows per vector — the exact shuffle this class exists to avoid).
  *
  * Cosine against a SUM vector equals cosine against the mean (cosine is
  * scale-invariant), so callers never divide — the state stays
  * integer-exact end to end, the q73/q75 quantization convention.
  *
  * Overflow is LOUD, not wrapping ([[Math.addExact]] — the
  * VectorQuantizer.nearest convention): 2^20-quantized unit-ish
  * components sum past int64 only after ~2^43 member vectors per group,
  * far beyond any cell's population, and a corrupt out-of-contract input
  * must abort rather than silently skew the centroid.
  */
object VectorSum extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def addInto(acc: Array[Long], v: Seq[Long]): Array[Long] =
    if (v == null) acc
    else if (acc.length == 0) v.toArray
    else {
      require(acc.length == v.length,
        s"VectorSum: dimension mismatch ${acc.length} vs ${v.length}")
      var i = 0
      while (i < acc.length) { acc(i) = Math.addExact(acc(i), v(i)); i += 1 }
      acc
    }

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] =
    addInto(buf, v)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (b.length == 0) a else addInto(a, b.toSeq)

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
