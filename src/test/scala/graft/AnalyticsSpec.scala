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

  test("q122 prototype prune matches a driver-side centroid recomputation") {
    val d = TestSpark.sfDir
    val vecs = graft.util.Tables.embeddings(spark, d)
      .select("vec_id", "label", "embedding").collect()
      .map { r =>
        val q = r.getSeq[Float](2)
          .map(x => math.floor(x.toDouble * 1048576.0).toLong).toArray
        (r.getLong(0), r.getInt(1), q)
      }
    val expected = vecs.groupBy(_._2).toSeq.flatMap { case (label, cell) =>
      val dim = cell.head._3.length
      val sv = Array.tabulate(dim)(i => cell.map(v => BigInt(v._3(i))).sum)
      val n2c = sv.map(x => x * x).sum.toDouble
      val ranked = cell.map { case (id, _, q) =>
        val dot = (0 until dim).map(i => BigInt(q(i)) * sv(i)).sum.toDouble
        val n2v = q.map(x => BigInt(x) * BigInt(x)).sum.toDouble
        (id, dot / (math.sqrt(n2v) * math.sqrt(n2c)))
      }.sortBy { case (id, c) => (-c, id) }
      ranked.take(cell.length / 10)
        .map { case (id, c) => (id, label, c, cell.length.toLong) }
    }.sortBy(_._1)
    assert(expected.nonEmpty) // at least one cell of ≥ 10 vectors at this SF
    val got = SparkEntry.queries("q122_prototype_prune")(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }
}
