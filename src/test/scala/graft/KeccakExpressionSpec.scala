package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native keccak256 Catalyst expression (graft.plans.Keccak256) —
  * registered via GraftExtensions, callable from SQL and the DataFrame
  * API, codegen'd (no ScalaUDF boundary in the plan).
  */
class KeccakExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL surface: keccak256 over literals matches published vectors") {
    val r = spark.sql(
      "SELECT keccak256(encode('', 'UTF-8')) AS empty, " +
        "keccak256(encode('transfer(address,uint256)', 'UTF-8')) AS xfer").collect().head
    assert(r.getString(0) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(r.getString(1).startsWith("a9059cbb"))
  }

  test("null and non-ASCII inputs") {
    import spark.implicits._
    val r = Seq(Some("é"), None).toDF("s")
      .select(call_function("keccak256", encode($"s", "UTF-8")).as("h")).collect()
    assert(r.exists(_.isNullAt(0)))
    assert(r.exists(row => !row.isNullAt(0) &&
      row.getString(0) == graft.functions.Keccak.hash256Hex("é")))
  }

  test("expression is codegen'd: no ScalaUDF in the plan") {
    // parquet-backed input — a local Seq gets constant-folded into a
    // LocalTableScan, hiding the expression from the plan entirely
    val df = graft.util.Tables.documents(spark, TestSpark.sfDir)
      .select(call_function("keccak256", encode(col("text"), "UTF-8")).as("h"))
    val plan = df.queryExecution.explainString(SimpleMode)
    assert(plan.contains("keccak256"), plan)
    assert(!plan.contains("UDF"), plan)
  }

  test("agrees with the pure-Scala implementation across the corpus") {
    val docs = graft.util.Tables.documents(spark, TestSpark.sfDir).limit(50)
    val viaExpr = docs.select(col("doc_id"),
      call_function("keccak256", encode(col("text"), "UTF-8")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaScala = docs.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        graft.functions.Keccak.hash256Hex(r.getAs[String]("text"))).toMap
    assert(viaExpr == viaScala)
  }
}
