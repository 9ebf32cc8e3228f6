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
    /** Partition-class tag (r13): true = the query accumulates
      * PAIR-VOLUME reduce-side aggregation state (the inverted-index
      * self-join family) — the measured spill class that needs
      * DATA-derived shuffle counts (q31 at sf10: 26.5 s derived vs 59 s
      * spilling at the cores floor). False = everything whose reduce
      * state is bounded by design — narrow composites (q108: 16.6 s at
      * 32 vs 49 s of waves at 544) AND the pair-shaped-but-pruned
      * kernels (the r13 A/B: q85 3.4 s at 32 vs 5.5 at 512 — in-join
      * windows/overlap bounds cap their state before it accumulates).
      * The criterion is reduce-side STATE volume, not enumeration work;
      * the tag list + evidence live in SparkEntry.pairExpansion and
      * BASELINE.md r13. Harness mains size
      * `spark.sql.shuffle.partitions` per query from this tag
      * (graft.util.Tuning.queryPartitions); on a cluster the untagged
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
