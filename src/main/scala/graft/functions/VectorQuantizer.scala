package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over exact 2^20-quantized int64 embeddings —
  * the codebook trainer behind the q73 assignment step (embedding-space
  * corpus curation: cluster balancing, VQ compression, coreset picking).
  *
  * Everything is exact integer arithmetic, so the fit is bit-deterministic
  * across runs, partitionings and engines:
  *  - init: the k lowest vec_ids (a deterministic seed, like q73's codebook);
  *  - E-step: argmin of squared L2 over int64 components, ties to the
  *    lower centroid id — ONE map stage, the k×dim codebook riding the UDF
  *    closure (never a join);
  *  - M-step: component-wise floor-division mean of exact int64 sums —
  *    dim aggregation COLUMNS over the assigned rows (the q30/q28 wide-agg
  *    trick: no (vector, component) explosion, one shuffle of k groups);
  *  - empty cells keep their previous centroid (the standard convention).
  *
  * Scale: per iteration, one map pass + one k-group partial-agg shuffle +
  * a k×dim driver collect (the codebook IS closure-sized by definition).
  * Component sums use DECIMAL(38,0) so a 10^12-row cell cannot wrap int64.
  */
object VectorQuantizer {

  /** Quantize a float embedding column to exact 2^20-scaled BIGINTs
    * (identical to the TrainingOps/oracle convention).
    */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(1048576.0)).cast("long"))

  /** Squared-L2 argmin of `qv` against `cents`; ties break to the lower
    * centroid id. Returns (bestCid, bestDist).
    *
    * Accumulation is overflow-CHECKED (`multiplyExact`/`addExact` — JIT
    * intrinsics, a predictable never-taken branch in the hot loop): an
    * embedding far outside the unit-norm convention (component deltas
    * ≳2^21 at 2^20 quantization over wide dims) must abort like the
    * DuckDB oracle's BIGINT SUM would, never wrap int64 silently.
    */
  private[graft] def nearest(cents: Array[Array[Long]], qv: Seq[Long]): (Long, Long) = {
    var bc = -1L; var bd = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var dsum = 0L; var i = 0
      while (i < cv.length) {
        val d = qv(i) - cv(i)
        dsum = Math.addExact(dsum, Math.multiplyExact(d, d))
        i += 1
      }
      if (dsum < bd) { bd = dsum; bc = c }
      c += 1
    }
    (bc, bd)
  }

  /** One E+M iteration: assign every vector to `cents`, return the updated
    * centroids plus the PRE-update total distortion and per-cell counts.
    *
    * Monotonicity caveat: exact Lloyd's guarantees a non-increasing
    * distortion; the FLOOR-rounded integer mean shifts each centroid
    * component by δ ∈ [0, 1) quantization units off the true mean, which
    * can raise the next trace entry by at most N·dim units² (N = corpus
    * size) — e.g. a cell of near-duplicate vectors one quantization level
    * apart. The spec asserts the trace within that slack, not strictly.
    */
  private def step(
      qvecs: DataFrame, cents: Array[Array[Long]]):
      (Array[Array[Long]], BigInt, Map[Long, Long]) = {
    val dim = cents(0).length
    val assign = udf((qv: Seq[Long]) => {
      val (bc, bd) = nearest(cents, qv)
      Array(bc, bd)
    })
    val assigned = qvecs
      .select(col("qv"), assign(col("qv")).as("a"))
      .select(col("qv"), col("a").getItem(0).as("cid"), col("a").getItem(1).as("dist"))
    val sumCols =
      (0 until dim).map(i =>
        sum(element_at(col("qv"), i + 1).cast("decimal(38,0)")).as(s"s$i")) ++
        Seq(count(lit(1)).as("n"),
          sum(col("dist").cast("decimal(38,0)")).as("dd"))
    val rows = assigned.groupBy("cid").agg(sumCols.head, sumCols.tail: _*).collect()
    val next = cents.map(_.clone())
    var distortion = BigInt(0)
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    rows.foreach { r =>
      val cid = r.getLong(0)
      val n = r.getLong(dim + 1)
      counts(cid) = n
      distortion += BigInt(r.getDecimal(dim + 2).toBigInteger)
      var i = 0
      while (i < dim) {
        // floor division of exact sums — BigInt handles negative sums'
        // floor semantics via the explicit adjustment below
        val s = BigInt(r.getDecimal(i + 1).toBigInteger)
        val q = s / n
        next(cid.toInt)(i) =
          (if (s.sign < 0 && s % n != 0) q - 1 else q).toLong
        i += 1
      }
    }
    (next, distortion, counts.toMap)
  }

  /** The persisted (vec_id, qv) frame every Lloyd pass re-reads; callers
    * that need a final assignment over the same vectors (q75) reuse this
    * cached frame instead of re-scanning and re-quantizing the corpus.
    */
  def quantized(embeddings: DataFrame): DataFrame =
    graft.util.Caches.transientPersist(
      graft.util.Tables.fanOut(
        embeddings
          .select(col("vec_id"), quantize(col("embedding")).as("qv"))))

  /** Run `iters` fixed Lloyd iterations from the deterministic init over
    * an already-[[quantized]] frame. Returns the final centroids and the
    * per-iteration total distortion trace (each computed against that
    * iteration's INPUT centroids).
    */
  def fitQuantized(qvecs: DataFrame, k: Int, iters: Int):
      (Array[Array[Long]], Seq[BigInt]) = {
    val initRows = qvecs.filter(col("vec_id") < k)
      .collect().sortBy(_.getLong(0))
    // q73's stronger check, mirrored: the ids must be EXACTLY 0..k-1 and
    // distinct — a duplicate id below k would pass a bare count check
    // while leaving the init dependent on collect()/sortBy order over
    // equal keys, breaking the bit-determinism this trainer exists for
    require(initRows.map(_.getLong(0)).toSeq == (0L until k),
      s"deterministic init needs exactly vec_ids 0..${k - 1}, distinct; " +
        s"got [${initRows.map(_.getLong(0)).take(k + 1).mkString(",")}]")
    var cents = initRows.map(_.getSeq[Long](1).toArray)
    val trace = scala.collection.mutable.ArrayBuffer.empty[BigInt]
    val onlyQv = qvecs.select(col("qv"))
    for (_ <- 0 until iters) {
      val (next, d, _) = step(onlyQv, cents)
      trace += d
      cents = next
    }
    (cents, trace.toSeq)
  }

  /** [[fitQuantized]] over [[quantized]] raw float embeddings. */
  def fit(embeddings: DataFrame, k: Int, iters: Int):
      (Array[Array[Long]], Seq[BigInt]) =
    fitQuantized(quantized(embeddings), k, iters)
}
