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
    bench: Boolean = true,
    /** Partition-class tag (r13): true = the query's dominant kernel
      * EXPANDS on the reduce side of its widest exchange past the
      * mapper-written bytes (inverted-index/positional self-joins, in-
      * cell pair enumeration) — the class the r12 experiments proved
      * needs DATA-derived shuffle counts (q31 at sf10: 26.5 s at 544
      * partitions vs 59 s spilling at 32). False = narrow composites
      * whose per-exchange payload stays survivor-frame-sized, where the
      * same derived count is pure single-box wave tax (q108: 16.6 s at
      * 32 vs 49 s at 544). Harness mains size
      * `spark.sql.shuffle.partitions` per query from this tag
      * (graft.util.Tuning.queryPartitions); on a cluster the narrow
      * class is AQE-coalescible (pre-expansion byte sizing is CORRECT
      * there) while the tagged class needs the derived count or a
      * divided AQE advisory — see BASELINE.md r12/r13.
      */
    pairExpansion: Boolean = false)

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
