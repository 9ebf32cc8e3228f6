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
}
