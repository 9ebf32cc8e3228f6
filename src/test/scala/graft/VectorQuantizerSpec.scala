package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorQuantizer

/** The k-means trainer's guarantees: Lloyd's monotone distortion, exact
  * M-step means against hand-computed ground truth, empty-cell carry, and
  * bit-determinism across runs (the property the exact-integer design
  * exists for).
  */
class VectorQuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("distortion is non-increasing across Lloyd iterations (floor-mean slack)") {
    val embs = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val n = embs.count()
    val dim = embs.selectExpr("size(embedding)").head.getInt(0)
    val (_, trace) = VectorQuantizer.fit(embs, 8, 4)
    assert(trace.length == 4)
    // exact Lloyd's is non-increasing; the floor-rounded M-step may cost
    // up to N·dim quantization units² per step (see the step() scaladoc)
    val slack = BigInt(n) * dim
    trace.sliding(2).foreach { case Seq(a, b) => assert(b <= a + slack, trace) }
  }

  test("one iteration on a hand-built frame: exact floor-mean centroids") {
    import spark.implicits._
    // two obvious clusters around (0,0) and (10,10); k=2 init = vec 0, 1.
    // floats quantize exactly (all values integral).
    val df = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 10f)),
      (2L, Array(1f, 0f)), (3L, Array(0f, 2f)),
      (4L, Array(10f, 9f)), (5L, Array(9f, 10f)))
      .toDF("vec_id", "embedding")
    val (cents, trace) = VectorQuantizer.fit(df, 2, 1)
    val q = 1048576L
    // cell 0 = {0,2,3}: mean = (1/3, 2/3) → floor((q+0)/3), floor(2q/3)
    assert(cents(0).toSeq == Seq(q / 3, 2 * q / 3))
    // cell 1 = {1,4,5}: mean = (29/3, 29/3) quantized → floor(29q/3)
    assert(cents(1).toSeq == Seq(29 * q / 3, 29 * q / 3))
    // pre-update distortion: members at L2² q² {0, 1, 4} and {0, 1, 1}
    assert(trace.head == BigInt(q) * q * 7)
  }

  test("an empty cell keeps its previous centroid") {
    import spark.implicits._
    // vec 1 sits right next to vec 0 — after init {0, 1}, everything
    // assigns to cell 0 or 1 by proximity; make cell 1 win nothing by
    // placing all others at 0's side and vec 1's ONLY member is itself.
    // Then delete vec 1's row from the SECOND iteration input? Simpler:
    // k=2 where cell 1 holds exactly vec 1; after the M-step both
    // centroids move; force an empty cell with two coincident inits.
    val df = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)), // identical → ties to cid 0
      (2L, Array(3f, 3f)))
      .toDF("vec_id", "embedding")
    val (cents, _) = VectorQuantizer.fit(df, 2, 1)
    // every vector ties/assigns to cell 0 (lower id on ties) except none
    // to cell 1 → cell 1 must still be its init value (0,0)
    assert(cents(1).toSeq == Seq(0L, 0L))
    // cell 0 moved to the floor-mean of all three members: (1, 1) → q
    assert(cents(0).toSeq == Seq(1048576L, 1048576L))
  }

  test("the fit is bit-deterministic across runs") {
    val embs = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val a = VectorQuantizer.fit(embs, 8, 2)
    val b = VectorQuantizer.fit(embs, 8, 2)
    assert(a._2 == b._2)
    assert(a._1.map(_.toSeq).toSeq == b._1.map(_.toSeq).toSeq)
  }

  test("q75 registry entry: stats consistent with a direct fit") {
    val rows = SparkEntry.queries("q75_kmeans_fit")(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val total = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    // the reported trace endpoints decrease up to the floor-mean slack
    // (columns: cid, n_vec, total_distortion, first_iter_d, last_iter_d)
    val r = rows.head
    val dim = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .selectExpr("size(embedding)").head.getInt(0)
    assert(r.getDouble(4) <= r.getDouble(3) + total.toDouble * dim)
  }
}
