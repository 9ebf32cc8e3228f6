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

  /** Total on-disk bytes of the corpus tables under `dir` (0 if absent,
    * e.g. a relational-only directory — the cores floor then applies).
    *
    * Resolved through the Hadoop FileSystem API, not java.io.File: a
    * non-local corpus dir (hdfs://, s3a://) would size to 0 under File
    * and silently degrade the derived count to the cores floor —
    * exactly the large-data case the formula exists for. Callers run
    * both before session build (Bench) and after, so this uses a bare
    * Configuration (picks up any core-site.xml on the classpath; the
    * local file:// scheme — the bench posture — needs none).
    */
  def corpusBytes(dir: String): Long =
    bytesMemo.getOrElseUpdate(dir, {
      val conf = new org.apache.hadoop.conf.Configuration()
      Seq("documents.parquet", "embeddings.parquet").map { t =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$t")
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      }.sum
    })

  // memoized per dir: the r13 per-query class posture resolves the count
  // before EVERY benched query, and a fixed harness corpus doesn't change
  // size mid-run (a freshly generated corpus enters under a new dir)
  private val bytesMemo =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** corpusBytes / 200 KiB rounded up to whole scheduling waves
    * (multiples of cores) — but the data term only ENGAGES once it
    * demands more than two full waves. Below that the historical
    * cores posture stands: a marginal excess (sf0.1's ~7 derived
    * partitions on a 4-core bench session) would silently shift every
    * pre-r12 bench comparison for zero spill benefit, and a corpus
    * small enough to fit two waves cannot be the spill case this
    * formula exists for.
    *
    * Capped at 64× cores: the formula sizes partitions for LOCAL bench
    * tiers (sf0.1→cores, sf10→544 = 17 waves on 32); pointing it at a
    * TB-scale directory would otherwise derive millions of partitions —
    * pure task-launch overhead on one host. A real cluster sizes by
    * AQE advisory bytes instead (class doc), so the cap never binds a
    * posture that matters.
    */
  def shufflePartitions(dir: String, cores: Int): Int = {
    val byData =
      (corpusBytes(dir) + CorpusBytesPerPartition - 1) / CorpusBytesPerPartition
    if (byData <= 2L * cores) cores
    else math.min(
      ((byData + cores - 1) / cores) * cores, 64L * cores).toInt
  }

  /** Per-query shuffle count from the measured two-class posture
    * (BASELINE.md r12/r13): the pair-expansion class gets the
    * data-derived count (its reduce sides multiply past the mapper
    * bytes — fixed-cores spills, q31's 59 s), the narrow-composite
    * class gets the cores floor (its exchanges stay survivor-sized and
    * the derived count is pure single-box wave tax — q108's 49 s vs
    * 16.6). Local-harness semantics only: a cluster keeps AQE on, where
    * narrow stages coalesce correctly by size and expansion stages take
    * the divided advisory (the r12 rule).
    */
  def queryPartitions(pairExpansion: Boolean, dir: String, cores: Int): Int =
    if (pairExpansion) shufflePartitions(dir, cores) else cores
}
