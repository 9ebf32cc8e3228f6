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

object Q {
  /** Pinned-constant oracle (the q44 pattern): when the query's input is
    * frozen (the contract fixture tree; a frozen-per-SF corpus at the
    * gate's sf0.01), its expected rows are literals — generated once by
    * `tools/pin_oracle.py` from a verified run and stored as a resource.
    * Any regression then hash-mismatches in the driver gate. Provenance
    * and validity constraints are documented in each resource header.
    */
  def pinned(name: String): String = {
    val in = classOf[Q].getResourceAsStream(s"/graft/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}
