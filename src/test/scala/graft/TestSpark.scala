package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (JVM-forked once by sbt). Mirrors
  * the Verify/Bench builder config, including the nanosAsLong conf the
  * events accessor asserts on.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Smallest scale factor — used by specs that read the driver corpus. */
  val sfDir = "/root/testdata/sf0.001"
}
