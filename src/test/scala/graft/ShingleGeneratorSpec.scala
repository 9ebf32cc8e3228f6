package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native shingle Generator: SQL surface, distinctness, equivalence
  * with the HOF formulation, degenerate inputs.
  */
class ShingleGeneratorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL surface produces distinct word n-grams in first-seen order") {
    import spark.implicits._
    val out = Seq("a b c b c d", "x y").toDF("text")
      .selectExpr("shingles(text, 3) AS s").as[String].collect().toSeq
    // "a b c b c d" → a b c, b c b, c b c, b c d; "x y" too short → none
    assert(out == Seq("a b c", "b c b", "c b c", "b c d"))
  }

  test("duplicate shingles are emitted once") {
    import spark.implicits._
    val out = Seq("a b a b a b").toDF("text")
      .selectExpr("shingles(text, 2) AS s").as[String].collect().toSeq
    assert(out == Seq("a b", "b a"))
  }

  test("equivalent to the HOF formulation on the corpus") {
    val docs = graft.util.Tables.documents(spark, TestSpark.sfDir).limit(100)
    val viaGen = docs.selectExpr("doc_id", "shingles(text, 3) AS shingle")
    val ws = split(trim(col("text")), "\\s+")
    val viaHof = docs.withColumn("ws", ws).filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("ws")) - 3),
          i => concat_ws(" ", element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2), element_at(col("ws"), i + 3)))))
        .as("shingle"))
    assert(viaGen.exceptAll(viaHof).isEmpty && viaHof.exceptAll(viaGen).isEmpty)
  }

  test("null and short inputs yield no rows, not errors") {
    import spark.implicits._
    val out = Seq(Some("one two"), None, Some("")).toDF("text")
      .selectExpr("shingles(text, 3) AS s").collect()
    assert(out.isEmpty)
  }

  test("SQL trim/split parity: tab-padded text keeps the empty edge tokens") {
    import spark.implicits._
    // SQL trim strips SPACES only and Spark's split keeps empty edge
    // tokens (limit -1): "\ta b" tokenizes ["", "a", "b"] in Text.words
    // and the DuckDB oracle — the generator must agree (Java
    // String.trim/split-default would silently drop both edges)
    val viaGen = Seq("\ta b", "a b\t").toDF("text")
      .selectExpr("shingles(text, 3) AS s").as[String].collect().toSeq
    assert(viaGen == Seq(" a b", "a b "))
    val viaWords = Seq("\ta b", "a b\t").toDF("text")
      .select(concat_ws(" ", graft.functions.Text.words(col("text"))).as("s"))
      .as[String].collect().toSeq
    assert(viaWords == Seq(" a b", "a b "))
  }

  test("ngrams keeps multiplicity and document order (q78's count semantics)") {
    import spark.implicits._
    val out = Seq("a b a b a b").toDF("text")
      .selectExpr("ngrams(text, 2) AS p").as[String].collect().toSeq
    // every adjacent pair, with repeats — unlike shingles' set semantics
    assert(out == Seq("a b", "b a", "a b", "b a", "a b"))
    val degenerate = Seq(Some("solo"), None, Some("")).toDF("text")
      .selectExpr("ngrams(text, 2) AS p").collect()
    assert(degenerate.isEmpty)
  }

  test("termfreqs aggregates per-doc counts map-side, both gram tiers, first-seen order") {
    import spark.implicits._
    val out = Seq("a b a b c").toDF("text")
      .selectExpr("termfreqs(text, 2) AS (g, term, tf)")
      .as[(Int, String, Long)].collect().toSeq
    // g=1 tier: distinct tokens with occurrence counts, first-seen order;
    // g=2 tier: distinct adjacent pairs with multiplicity
    assert(out == Seq((1, "a", 2L), (1, "b", 2L), (1, "c", 1L),
      (2, "a b", 2L), (2, "b a", 1L), (2, "b c", 1L)))
  }

  test("termfreqs equals explode(words) unigram counts and ngrams bigram counts") {
    // the shared-index contract: SUM(tf) per term over the g=1 tier must
    // equal counting the exploded tokenization, and the g=2 tier must
    // equal counting ngrams(text, 2) — the consumers' oracles depend on it
    val docs = graft.util.Tables.documents(spark, TestSpark.sfDir)
      .filter(col("text").isNotNull).limit(200)
    val viaTf = docs.selectExpr("doc_id", "termfreqs(text, 2) AS (g, term, tf)")
    val uniTf = viaTf.filter(col("g") === 1)
      .groupBy("term").agg(sum("tf").as("n"))
    val uniRef = docs
      .select(explode(graft.functions.Text.words(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    assert(uniTf.exceptAll(uniRef).isEmpty && uniRef.exceptAll(uniTf).isEmpty)
    val biTf = viaTf.filter(col("g") === 2)
      .groupBy("term").agg(sum("tf").as("n"))
    val biRef = docs.selectExpr("ngrams(text, 2) AS term")
      .groupBy("term").agg(count(lit(1)).as("n"))
    assert(biTf.exceptAll(biRef).isEmpty && biRef.exceptAll(biTf).isEmpty)
  }

  test("posngrams: every occurrence with its 1-based position, repeats kept") {
    import spark.implicits._
    val out = Seq("a b a b a").toDF("text")
      .selectExpr("posngrams(text, 2) AS (pos, g)")
      .as[(Int, String)].collect().toSeq
    assert(out == Seq((1, "a b"), (2, "b a"), (3, "a b"), (4, "b a")))
    // vs posshingles: first occurrence only
    val first = Seq("a b a b a").toDF("text")
      .selectExpr("posshingles(text, 2) AS (pos, g)")
      .as[(Int, String)].collect().toSeq
    assert(first == Seq((1, "a b"), (2, "b a")))
    // degenerate: too-short and NULL emit nothing
    val none = Seq(Some("a"), None).toDF("text")
      .selectExpr("posngrams(text, 2) AS (pos, g)").collect()
    assert(none.isEmpty)
  }

  test("termfreqs degenerate inputs: null yields nothing, empty text one empty token") {
    import spark.implicits._
    val out = Seq(Some(""), None).toDF("text")
      .selectExpr("termfreqs(text, 2) AS (g, term, tf)")
      .as[(Int, String, Long)].collect().toSeq
    // "" tokenizes to [""] (the SQL split convention q69's oracle shares);
    // too short for a bigram, so only the g=1 row appears. NULL emits none.
    assert(out == Seq((1, "", 1L)))
  }
}
