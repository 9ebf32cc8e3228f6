package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Hashing, KmvDistinct, KmvSignature}

/** KMV distinct sketch: exact below k, sane estimates above, and
  * partition-order invariance (the mergeability contract).
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exact count below k, duplicates ignored") {
    val a = new KmvDistinct(16)
    val buf = Seq(5L, 3L, 5L, 9L, 3L).foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) == 3.0)
    assert(buf.toSeq == Seq(3L, 5L, 9L))
  }

  test("buffer caps at k smallest, estimator uses the kth minimum") {
    val a = new KmvDistinct(4)
    val buf = (1L to 100L).map(_ * 1000000L).foldLeft(a.zero)(a.reduce)
    assert(buf.toSeq == Seq(1000000L, 2000000L, 3000000L, 4000000L))
    assert(a.finish(buf) == 3.0 * 1152921504606846976.0 / 4000000.0)
  }

  test("merge is order-insensitive (partial aggregation safe)") {
    val a = new KmvDistinct(8)
    val hs = (1 to 50).map(i => (i * 2654435761L) & ((1L << 60) - 1))
    val (l, r) = hs.splitAt(25)
    val b1 = l.foldLeft(a.zero)(a.reduce)
    val b2 = r.foldLeft(a.zero)(a.reduce)
    val whole = hs.foldLeft(a.zero)(a.reduce)
    assert(a.merge(b1, b2).toSeq == whole.toSeq)
    assert(a.merge(b2, b1).toSeq == whole.toSeq)
  }

  test("signature form returns the sorted bottom-k and composes over a union") {
    val a = new KmvSignature(4)
    val buf = Seq(9L, 2L, 7L, 2L, 11L, 5L, 3L).foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf).toSeq == Seq(2L, 3L, 5L, 7L))
    // bottom-k composability: merge(sig(A), sig(B)) == sig(A ∪ B) —
    // the property the q132 pairwise estimator rests on
    val xs = (1 to 40).map(i => (i * 2654435761L) & ((1L << 60) - 1))
    val (l, r) = (xs.take(25), xs.drop(15)) // overlapping halves
    val sl = l.foldLeft(a.zero)(a.reduce)
    val sr = r.foldLeft(a.zero)(a.reduce)
    val whole = xs.foldLeft(a.zero)(a.reduce)
    assert(a.merge(sl, sr).toSeq == whole.toSeq)
  }

  test("estimates track truth on the corpus at k=16") {
    val kmv = udaf(new KmvDistinct(16))
    val rows = graft.util.Tables.documents(spark, TestSpark.sfDir)
      .select(col("source"), Hashing.md5Long(col("text")).as("h"))
      .groupBy("source")
      .agg(kmv(col("h")).as("est"), countDistinct(col("h")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    val relErrs = rows.map { r =>
      math.abs(r.getDouble(1) - r.getLong(2)) / r.getLong(2).toDouble
    }
    // KMV standard error ≈ 1/sqrt(k-2) ≈ 27% at k=16: assert the MEAN is
    // in line with theory and no group is wildly off — individual groups
    // legitimately exceed one sigma
    assert(relErrs.sum / relErrs.length < 0.3, relErrs.mkString(","))
    assert(relErrs.forall(_ < 0.9), relErrs.mkString(","))
  }
}
