package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AnalyticsOps

/** The connected-components hybrid: both execution paths (driver
  * union-find below the edge threshold, distributed min-label propagation
  * above it) must produce identical min-id labels.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clusterLabels: driver and distributed paths agree") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3 — exercises multiple propagation rounds),
    // pair {10,11}, triangle {20,21,22}, disjoint singleton edge {30,31}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L)).toDF("ida", "idb")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)

    def run(): Map[Long, Long] =
      AnalyticsOps.clusterLabels(spark, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(run() == expected) // default: driver union-find

    spark.conf.set("spark.graft.cc.maxDriverEdges", "0")
    try assert(run() == expected) // forced distributed propagation
    finally spark.conf.unset("spark.graft.cc.maxDriverEdges")
  }

  test("q101: funnel stages are cumulative — monotone non-increasing per source") {
    val rows = SparkEntry.queries("q101_curation_funnel")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val counts = (1 to 5).map(r.getLong) // n_total..n_clean
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"${r.getString(0)}: $counts")
      assert(counts.head > 0)
    }
    // the stages must actually discriminate somewhere on real data —
    // an all-equal funnel means a predicate degenerated to TRUE
    val tot = rows.map(_.getLong(1)).sum
    val clean = rows.map(_.getLong(5)).sum
    assert(clean < tot)
  }
}
