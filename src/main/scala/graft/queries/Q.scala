package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registry entry: a Spark DataFrame query over the testdata tables in
  * `sfDir`, plus (when SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver hash-compares against. Column names and row order must match the
  * oracle exactly (the driver sorts columns by name, then hashes values).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** included in Bench headline timing */
    bench: Boolean = true)
