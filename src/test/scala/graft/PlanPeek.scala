package graft
import org.apache.spark.sql.execution.SimpleMode
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (n <- args) {
      println("==== " + n)
      println(SparkEntry.queries(n)(spark, TestSpark.sfDir)
        .queryExecution.explainString(SimpleMode))
    }
    spark.stop()
  }
}
