package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main — environment checks and live demos, not part of the
  * judged query surface. `runMain graft.Probe stream` drives the streaming
  * pipelines against a real rate source.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("stream")) streamDemo(spark)
    else if (args.headOption.contains("dedup")) dedupDemo(spark)
    else {
      val ev = graft.util.Tables.events(spark, "/root/testdata/sf0.001")
      ev.printSchema()
      ev.show(3, false)
    }
    spark.stop()
  }

  /** Live drive of Streaming.tumblingAgg: rate source → windowed agg →
    * memory sink; prints the emitted (watermark-finalized) windows.
    */
  private def streamDemo(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val src = spark.readStream.format("rate").option("rowsPerSecond", "200").load()
      .select(col("timestamp").as("ts"),
        when(col("value") % 2 === 0, "click").otherwise("view").as("event_type"),
        (col("value") % 10).cast("double").as("value"))
    val q = graft.streaming.Streaming.tumblingAgg(src, "1 seconds", "2 seconds")
      .writeStream.format("memory").queryName("drive").outputMode("append").start()
    Thread.sleep(9000)
    q.processAllAvailable()
    q.stop()
    println("EMITTED_ROWS=" + spark.table("drive").count())
    spark.table("drive").orderBy("win_start", "event_type").show(8, false)
  }

  /** Live drive of Streaming.dedupStream: a rate source emitting a
    * repeating 10-text cycle; the stateful dedup must emit exactly 10
    * survivors no matter how many rows flow.
    */
  private def dedupDemo(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val src = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
      .select(col("value").as("doc_id"),
        concat(lit("text number "), col("value") % 10).as("text"))
    val q = graft.streaming.Streaming.dedupStream(src)
      .toDF("h", "doc_id", "text")
      .writeStream.format("memory").queryName("dedupdrive")
      .outputMode("append").start()
    Thread.sleep(6000)
    q.processAllAvailable()
    q.stop()
    println("DEDUP_SURVIVORS=" + spark.table("dedupdrive").count())
    spark.table("dedupdrive").orderBy("doc_id").show(12, false)
  }
}
