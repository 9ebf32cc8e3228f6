package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-corpus generator's contract — the slope tables in
  * BASELINE.md are only meaningful if the scaled corpus is a
  * structure-preserving scale-up, so the properties the methodology
  * claims are pinned here at a tiny factor:
  *  - replica 0 is the source corpus verbatim;
  *  - replica k's text is the source with every token injectively
  *    suffixed (within-replica similarity structure identical);
  *  - cross-replica token overlap is ZERO (pair volume grows exactly
  *    linearly by construction);
  *  - embeddings rotate per replica (norms preserved) and, in REFIT
  *    mode, land in replica-distinct IVF cells (the production
  *    quantizer-refit semantics the sf10 tier measures);
  *  - factors past one rotation cycle refuse to run without refit.
  */
class ScaleCheckSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.001"

  private def gen(refit: Boolean): String = {
    val out = java.nio.file.Files
      .createTempDirectory(s"graft-scale-$refit").toString
    ScaleCheck.generate(spark, src, out, factor = 3, refitCells = refit)
    out
  }

  test("3x corpus: replica 0 verbatim, injective suffix, zero cross-replica overlap") {
    val out = gen(refit = false)
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() == 3 * srcDocs.count())
    // replica 0 is byte-identical to the source
    val r0 = docs.filter(col("doc_id") < 10000000L)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = srcDocs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r0 == orig)
    // replica 1 = source with every token suffixed "1" (injective map ⇒
    // within-replica shingle/Jaccard structure equals the original's)
    val r1 = docs.filter(col("doc_id") >= 10000000L && col("doc_id") < 20000000L)
      .select((col("doc_id") - 10000000L).as("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, t) <- orig)
      assert(r1(id) == t.trim.split("\\s+").map(_ + "1").mkString(" "))
    // zero cross-replica token overlap — the linear-pair-volume claim
    val toks = (s: Long, e: Long) => docs
      .filter(col("doc_id") >= s && col("doc_id") < e)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    assert((toks(0L, 10000000L) & toks(10000000L, 20000000L)).isEmpty)
    assert((toks(10000000L, 20000000L) & toks(20000000L, 30000000L)).isEmpty)
  }

  test("3x embeddings: rotation preserves norms; refit mode separates cells, legacy keeps them") {
    val srcEmb = spark.read.parquet(s"$src/embeddings.parquet")
    val srcLabels = srcEmb.select("label").distinct()
      .collect().map(_.getInt(0)).toSet
    // sum the SORTED squares: float addition is order-sensitive and a
    // rotation permutes the components — the multiset of components is
    // the invariant (the kernels' quantized-int arithmetic is exactly
    // rotation-invariant; this pins the generator's permutation claim)
    def normExpr = aggregate(
      sort_array(transform(col("embedding"), x => (x * x).cast("double"))),
      lit(0.0d), (a, x) => a + x).as("n2")
    val srcNorms = srcEmb.select(col("vec_id"), normExpr)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    for (refit <- Seq(false, true)) {
      val out = gen(refit)
      val emb = spark.read.parquet(s"$out/embeddings.parquet")
      assert(emb.count() == 3 * srcEmb.count())
      val labelsByReplica = (0 until 3).map { k =>
        emb.filter(col("vec_id") >= k * 10000000L
            && col("vec_id") < (k + 1) * 10000000L)
          .select("label").distinct().collect().map(_.getInt(0)).toSet
      }
      if (refit) {
        // replica-distinct cells: cell-restricted kernels never compare
        // across replicas, so pair volume scales linearly
        assert(labelsByReplica(0) == srcLabels)
        assert((labelsByReplica(1) & labelsByReplica(0)).isEmpty)
        assert((labelsByReplica(2) & labelsByReplica(1)).isEmpty)
      } else
        // the legacy stress tier: same cells, in-cell volume inflates
        labelsByReplica.foreach(l => assert(l == srcLabels))
      // rotation preserves the component multiset, hence the norm
      val norms = emb.select(col("vec_id"), normExpr)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((id, n2) <- srcNorms; k <- 0 until 3)
        assert(norms(id + k * 10000000L) == n2, s"norm changed: vec $id replica $k")
    }
  }

  test("factors past one rotation cycle require refit mode") {
    val out = java.nio.file.Files.createTempDirectory("graft-scale-req").toString
    val e = intercept[IllegalArgumentException] {
      ScaleCheck.generate(spark, src, out, factor = 100, refitCells = false)
    }
    assert(e.getMessage.contains("refitCells"), e.getMessage)
  }
}
