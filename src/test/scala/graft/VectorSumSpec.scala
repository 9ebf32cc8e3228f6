package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorSum

/** The mergeable element-wise int64 vector-sum aggregator q90's cell
  * centroids ride: algebraic properties driver-side, then the Spark
  * udaf path against a hand sum.
  */
class VectorSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("reduce/merge are associative-commutative and exact") {
    val a = Seq(1L, -2L, 3L)
    val b = Seq(10L, 20L, -30L)
    val c = Seq(100L, 0L, 7L)
    def sum(vs: Seq[Seq[Long]]): Seq[Long] =
      VectorSum.finish(vs.foldLeft(VectorSum.zero)(VectorSum.reduce))
    val expected = Seq(111L, 18L, -20L)
    assert(sum(Seq(a, b, c)) == expected)
    assert(sum(Seq(c, a, b)) == expected)
    // merge of partials equals the one-pass reduce (buffers are
    // MUTABLE-in-place, the Aggregator contract — build each one fresh)
    def part(vs: Seq[Long]*): Array[Long] =
      vs.foldLeft(VectorSum.zero)(VectorSum.reduce)
    assert(VectorSum.finish(VectorSum.merge(part(a), part(b, c))) == expected)
    // empty partials are identity on either side
    assert(VectorSum.finish(VectorSum.merge(VectorSum.zero, part(a))) == a)
    assert(VectorSum.finish(VectorSum.merge(part(a), VectorSum.zero)) == a)
    // nulls are skipped, not poison
    assert(VectorSum.finish(VectorSum.reduce(part(a), null)) == a)
  }

  test("dimension mismatch and int64 overflow are loud, never silent") {
    val p = VectorSum.reduce(VectorSum.zero, Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      VectorSum.reduce(p, Seq(1L, 2L, 3L))
    }
    intercept[ArithmeticException] {
      VectorSum.reduce(VectorSum.reduce(VectorSum.zero, Seq(Long.MaxValue)), Seq(1L))
    }
  }

  test("udaf path groups and sums like a driver-side recomputation") {
    import spark.implicits._
    val rows = Seq(
      (0, Seq(1L, 2L)), (0, Seq(3L, 4L)), (1, Seq(-5L, 10L)), (1, Seq(5L, -10L)))
    val vsum = udaf(VectorSum)
    val got = rows.toDF("g", "v").groupBy("g").agg(vsum(col("v")).as("sv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(got == Map(0 -> Seq(4L, 6L), 1 -> Seq(0L, 0L)))
  }
}
