package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsOps, AuditOps, ContractQueries, Q, ReferenceOps, TrainingOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * large-scale training-data extensions) to a DataFrame query over the
  * testdata tables; `oracleSql` carries the DuckDB-equivalent SQL the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Every registered query, in registry order. */
  def registry: Seq[Q] =
    ReferenceOps.all ++ TrainingOps.all ++ AnalyticsOps.all ++ AuditOps.all ++
      ContractQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped scan→filter→group-agg on lineitem (SURVEY §7.2 M1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
