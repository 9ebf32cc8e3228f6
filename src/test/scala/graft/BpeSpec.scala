package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrainingOps

/** Pins the BPE apply semantics behind q81 (whose driver-gate oracle is
  * pinned VALUES — the iterative merge loop has no SQL equivalent, so
  * THIS spec is where the algorithm itself is checked, on inputs with
  * hand-computable answers).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mergePair is left-to-right and non-overlapping") {
    // "a a a": the first pair wins, the middle overlap never forms
    assert(TrainingOps.mergePair(Seq("a", "a", "a"), "a", "a") ==
      Seq("a_a", "a"))
    assert(TrainingOps.mergePair(Seq("a", "a", "a", "a"), "a", "a") ==
      Seq("a_a", "a_a"))
  }

  test("mergePair only touches exact adjacent (w1, w2) occurrences") {
    assert(TrainingOps.mergePair(Seq("x", "a", "b", "y", "a", "b"), "a", "b") ==
      Seq("x", "a_b", "y", "a_b"))
    // w2 alone, w1 alone, reversed order: untouched
    assert(TrainingOps.mergePair(Seq("b", "a", "x", "b"), "a", "b") ==
      Seq("b", "a", "x", "b"))
    assert(TrainingOps.mergePair(Nil, "a", "b") == Nil)
    assert(TrainingOps.mergePair(Seq("a"), "a", "a") == Seq("a"))
  }

  test("merged tokens participate in later rounds (BPE composition)") {
    val once = TrainingOps.mergePair(Seq("a", "a", "a", "a"), "a", "a")
    assert(TrainingOps.mergePair(once, "a_a", "a_a") == Seq("a_a_a_a"))
  }

  test("bpeLearnApply learns the most frequent pair and re-tokenizes, end-to-end") {
    import spark.implicits._
    // "b c" occurs 3 times (one per doc), every other pair at most twice —
    // round 1 must merge (b, c); round 2's winner among the rewritten
    // corpus is "a b_c" (2 occurrences, ties broken by pair string ASC
    // against "b_c d" which also has 2 — "a b_c" < "b_c d")
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq(
      (0L, "a b c d"),
      (1L, "a b c d"),
      (2L, "b c x")
    ).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TrainingOps.bpeLearnApply(spark, dir, 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    assert(out.toList == List(
      (0L, List("a_b_c", "d")),
      (1L, List("a_b_c", "d")),
      (2L, List("b_c", "x"))))
  }
}
