package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide guards: every declared operator actually executes on the
  * smallest corpus and produces rows — the local form of the driver's
  * smoke check, run for ALL queries rather than just the flagship.
  */
class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("query names are unique and well-formed") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q\\d{2}_[a-z0-9_]+")))
    // every oracle belongs to a registered query
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  test("every registry query executes at sf0.001 and returns rows") {
    val failures = SparkEntry.registry.flatMap { q =>
      try {
        spark.sqlContext.clearCache()
        val df = q.fn(spark, TestSpark.sfDir)
        assert(df.columns.nonEmpty)
        if (df.limit(1).collect().isEmpty) Some(s"${q.name}: 0 rows") else None
      } catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).limit(1).collect().nonEmpty)
  }
}
