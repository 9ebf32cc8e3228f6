package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_hashsum (int128 exact sum of int64s — the mergeable
  * membership-digest kernel) must equal the exact integer sum under
  * nulls, negatives, 60-bit magnitudes and forced partial/merge paths,
  * and must render the same digit string DuckDB's HUGEINT sum renders.
  */
class HashSum128Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches the exact BigInt sum on randomized 60-bit data (merge path forced)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 20000).map { i =>
      val v: java.lang.Long =
        if (i % 89 == 0) null
        else if (i % 7 == 0) -math.abs(rnd.nextLong() >>> 4) // negative tier
        else rnd.nextLong() >>> 4 // 60-bit non-negative, the md5Long domain
      (i % 13).toLong -> v
    }
    val expected = rows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.flatMap(v => Option(v._2)).map(BigInt(_)).sum
    }
    // 16 partitions force map-side partials and the int128 MERGE path
    val got = rows.toDF("k", "v").repartition(16)
      .groupBy("k").agg(call_function("graft_hashsum", $"v").as("s"))
      .collect()
    assert(got.length == 13)
    got.foreach { r =>
      val k = r.getLong(0)
      assert(BigInt(r.getDecimal(1).toBigInteger) == expected(k),
        s"k=$k: got ${r.getDecimal(1)} expected ${expected(k)}")
    }
  }

  test("sums past int64: 40k values near 2^59 exceed Long.MaxValue exactly") {
    import spark.implicits._
    val v = (1L << 59) - 17L
    val n = 40000
    val got = Seq.fill(n)(v).toDF("v").repartition(8)
      .agg(call_function("graft_hashsum", $"v")).collect().head.getDecimal(0)
    assert(BigInt(got.toBigInteger) == BigInt(v) * n)
    assert(BigInt(v) * n > BigInt(Long.MaxValue)) // the test actually crossed
  }

  test("all-null group yields NULL; string rendering carries no scale") {
    import spark.implicits._
    val df = Seq(("a", Some(5L)), ("a", Some(7L)), ("b", None), ("b", None))
      .toDF("k", "v")
    val m = df.groupBy("k")
      .agg(call_function("graft_hashsum", $"v").cast("string").as("s"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(m("a").contains("12")) // plain digits, no ".000000", no sign noise
    assert(m("b").isEmpty)
  }
}
