package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen dot-product expression behind every pairwise similarity
  * operator (q32/q33/q48): value parity against a BigInt reference on
  * randomized vectors, interpreted-vs-codegen agreement, null
  * propagation, and the loud length-mismatch contract.
  */
class DotProductLongSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dot(rows: Seq[(Array[Long], Array[Long])],
      codegen: Boolean): Seq[Option[Long]] = {
    import spark.implicits._
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    val saved = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      rows.toDF("a", "b")
        .selectExpr("graft_dot_long(a, b) AS d")
        .collect().toSeq
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", saved)
  }

  test("matches the BigInt reference on randomized magnitudes") {
    val rnd = new scala.util.Random(8)
    val rows = Seq.fill(50) {
      val n = 1 + rnd.nextInt(96)
      (Array.fill(n)(rnd.nextLong() % (1L << 21)),
        Array.fill(n)(rnd.nextLong() % (1L << 21)))
    }
    val expect = rows.map { case (a, b) =>
      Some(a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum.toLong)
    }
    assert(dot(rows, codegen = true) == expect)
    assert(dot(rows, codegen = false) == expect) // interpreted path agrees
  }

  test("null inputs propagate NULL (either side)") {
    import spark.implicits._
    val out = Seq(
      (Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (None: Option[Array[Long]], Some(Array(1L, 2L))),
      (Some(Array(2L, 3L)), Some(Array(4L, 5L))))
      .toDF("a", "b").selectExpr("graft_dot_long(a, b) AS d").collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(out(2) == Row(23L))
  }

  test("a null ELEMENT aborts loudly, never reads as zero") {
    import spark.implicits._
    // DuckDB's SUM would silently NULL the whole dot; the expression
    // treats a null component as corrupt input instead
    val e = intercept[Exception] {
      Seq(1).toDF("x")
        .selectExpr("graft_dot_long(array(1L, CAST(NULL AS BIGINT)), array(5L, 7L))")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null element")), e.toString)
  }

  test("length mismatch aborts loudly, never truncates") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((Array(1L, 2L), Array(1L)))
        .toDF("a", "b").selectExpr("graft_dot_long(a, b)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("length mismatch")), e.toString)
  }

  test("rejects non-array<bigint> arguments at analysis") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(("x", "y")).toDF("a", "b").selectExpr("graft_dot_long(a, b)").collect()
    }
    assert(e.getMessage != null)
  }
}
