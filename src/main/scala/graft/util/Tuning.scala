package graft.util

/** Data-derived shuffle sizing for the bench/ScaleCheck posture.
  *
  * The r11 q31 experiment pinned the hazard this addresses: the pair
  * kernels' plans are sound at 100× data, but a HOST-derived partition
  * count (32 = cores) is not — at sf10 the fixed-32 posture spilled the
  * pair-count aggregation to 59 s where 512 partitions ran at the
  * 26.6 s pair-linear floor. Partition COUNT must scale with the data;
  * cores only set the lower bound.
  *
  * Why a byte formula over the INPUT corpus, not AQE: the heavy family
  * expands compressed corpus bytes by orders of magnitude before the
  * expensive exchanges (text → per-shingle rows → candidate pairs;
  * sf10's ~100 MB of parquet drives multi-GB shuffles), and the
  * expansion happens ON THE REDUCE SIDE of the very exchanges being
  * sized (the pair join's output explodes AFTER the h1 exchange). AQE
  * sizes reduce partitions from the mapper-side shuffle-WRITE bytes, so
  * it coalesces toward its 64 MB advisory target based on the compact
  * pre-expansion rows and re-concentrates the post-join working set —
  * measured at sf10/q31: AQE-on was 48 s vs the 26.6 s floor it was
  * meant to find (see BASELINE.md r12 for the partition-count evidence).
  * Only the planner-exterior knowledge "this corpus's kernels expand
  * ~500× past the exchange" sizes these shuffles right, which is
  * exactly what this helper encodes: ~200 KiB of compressed corpus per
  * reduce partition keeps each partition's expanded working set in the
  * low hundreds of MB — in-memory on a 32-thread/128 GiB host and on a
  * standard 4–8 GiB-per-core executor alike.
  *
  * Only `documents` + `embeddings` bytes count: they are the corpus the
  * pair/shingle/ANN family expands. The relational tables join at
  * near-written volume, where partitions = cores is already right at
  * bench scale (and a cluster run sets AQE's advisory bytes per the
  * note above rather than using this local posture).
  */
object Tuning {

  /** ~200 KiB of compressed corpus per reduce partition (see class doc:
    * calibrated so sf0.1 stays at the cores floor — the bench posture
    * is unchanged — and sf10's ~100 MB lands at its measured
    * 512-partition floor).
    */
  val CorpusBytesPerPartition: Long = 200L * 1024

  private def sizeOf(f: java.io.File): Long =
    if (f.isDirectory) Option(f.listFiles).map(_.map(sizeOf).sum).getOrElse(0L)
    else f.length

  /** Total on-disk bytes of the corpus tables under `dir` (0 if absent,
    * e.g. a relational-only directory — the cores floor then applies).
    */
  def corpusBytes(dir: String): Long =
    Seq("documents.parquet", "embeddings.parquet")
      .map(t => sizeOf(new java.io.File(s"$dir/$t"))).sum

  /** corpusBytes / 200 KiB rounded up to whole scheduling waves
    * (multiples of cores) — but the data term only ENGAGES once it
    * demands more than two full waves. Below that the historical
    * cores posture stands: a marginal excess (sf0.1's ~7 derived
    * partitions on a 4-core bench session) would silently shift every
    * pre-r12 bench comparison for zero spill benefit, and a corpus
    * small enough to fit two waves cannot be the spill case this
    * formula exists for.
    */
  def shufflePartitions(dir: String, cores: Int): Int = {
    val byData =
      (corpusBytes(dir) + CorpusBytesPerPartition - 1) / CorpusBytesPerPartition
    if (byData <= 2L * cores) cores
    else (((byData + cores - 1) / cores) * cores).toInt
  }
}
