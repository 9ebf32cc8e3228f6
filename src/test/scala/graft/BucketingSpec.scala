package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** J1 at scale: bucketing both sides of the contract↔function-shaped FK
  * join on the join key lets the join plan without ANY shuffle exchange —
  * the parquet layout carries the partitioning (SURVEY §1.4: "bucketBy
  * kills the join shuffle"). This is the 100 TB answer to the reference's
  * composite index (`db.rs:86`).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed FK join plans with zero shuffle exchanges") {
    val tmp = Files.createTempDirectory("graft-buckets").toString
    try {
      val orders = graft.util.Tables.orders(spark, TestSpark.sfDir)
      val customer = graft.util.Tables.customer(spark, TestSpark.sfDir)
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$tmp/orders_b").mode("overwrite")
        .saveAsTable("grft_orders_b")
      customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$tmp/customer_b").mode("overwrite")
        .saveAsTable("grft_customer_b")

      // merge hint on the INPUT relation forces a non-broadcast join so
      // the bucketing (not a broadcast) is what eliminates the exchanges
      val noBroadcast = spark.table("grft_orders_b").hint("merge")
        .join(spark.table("grft_customer_b"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
      val plan = noBroadcast.queryExecution.explainString(SimpleMode)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
      // and it computes the same rows as the unbucketed join
      assert(noBroadcast.count() ==
        orders.join(customer, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS grft_orders_b")
      spark.sql("DROP TABLE IF EXISTS grft_customer_b")
    }
  }
}
