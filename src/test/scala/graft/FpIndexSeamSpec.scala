package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The standing-corpus fingerprint-index seam (r13): with
  * `spark.graft.fpIndex` naming a persisted X76 index, the LSH-family
  * kernels load its tables instead of rebuilding the session shingle
  * kernel — and the results must be BYTE-IDENTICAL to the session-kernel
  * path, because [[graft.queries.TrainingOps.fingerprintTables]] builds
  * the index with the kernels' exact conventions. This spec pins:
  *  (a) result identity for the seam's consumers (q110, q111, q95, q96,
  *      q109 — the standalone-audit surface the seam exists for);
  *  (b) that the seam path's executed plans really ride the index — no
  *      shingle Generate, no text column — so the identity is not
  *      trivially "both sides rebuilt the kernel";
  *  (c) that the seam is scoped to the session conf (unsetting it
  *      restores the kernel path).
  */
class FpIndexSeamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val seamQueries = Seq(
    "q110_neardup_split_leakage", "q111_contamination_pairs",
    "q95_incremental_dedup", "q96_source_overlap",
    "q109_memorization_ngrams",
    // the release composite rides the seamed pair/contamination kernels
    // (its gate/quality tiers legitimately read text) — identity here
    // pins that the seamed kernels compose into the flagship endpoint
    "q108_corpus_release",
    // pair-intersection consumers (docSizes comes from the bands table
    // under the seam)
    "q31_ngram_jaccard", "q76_containment",
    // contamination-hits publishers/consumers
    "q65_decontaminate", "q101_curation_funnel",
    // the exact tier straight off the index's `exact` table
    "q27_dedup_exact",
    // split leakage's hash source branches on the seam (fused text scan
    // by default, exact table + lean source projection under it)
    "q107_split_leakage",
    // r13b consumers: tier agreement rides the seamed lshPairs (its
    // semantic side is cellPairCos, which the seam never touches);
    // the decision table's lexical drop flag rides the seamed
    // contaminationHits (its mask tier legitimately re-tokenizes —
    // positional triples are not in the index)
    "q116_dedup_tier_agreement", "q117_decontam_decision",
    // r13c: batch novelty is a pure postings consumer — both its
    // standing set and its batch side come off the seamed postings;
    // the triage composite stacks the seamed verdict frame (exact
    // hashes + lshPairs) and the seamed novelty frame (its quality
    // tier legitimately reads text, the q108/q117 posture)
    "q121_batch_novelty", "q123_batch_triage",
    // the index datasheet: every accessor (postings, bands, exact) is
    // seam-aware, so under the seam the whole report is index reads
    "q124_index_stats",
    // r14: the media tier rides the index's persisted fingerprints —
    // under the seam the audits read one compact table (no payload
    // bytes, no fingerprint UDF); q126 additionally rides the seamed
    // lexical pair kernel, q127 is the incremental twin
    "q125_media_neardup", "q126_media_tier_agreement",
    "q127_incremental_media", "q128_media_clusters",
    // r15: the calibration row and the media-index datasheet ride the
    // seamed mediaFps (pure reads of the persisted fingerprints)
    "q129_media_calibration", "q131_media_index_stats",
    // r15: the sketch overlap rides the seamed shinglePostings (its
    // signature aggregate then reads pre-hashed postings); the takedown
    // impact page rides all three seam-aware pair kernels (its
    // deletion-set spine legitimately reads the corpus)
    "q132_source_overlap_sketch", "q133_takedown_report")

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
    df.collect().map(_.toString).toSeq
  }

  test("seam path is value-identical to the session kernel and never touches text") {
    import org.apache.spark.sql.functions.col
    assert(spark.conf.getOption("spark.graft.fpIndex").isEmpty)
    val baseline = seamQueries.map(q => q -> rows(q)).toMap

    val dir = Files.createTempDirectory("graft-fpseam").toString + "/idx"
    graft.sink.Sink.writeFingerprints(
      graft.util.Tables.documents(spark, TestSpark.sfDir)
        .select(col("doc_id"), col("text")), dir)

    spark.conf.set("spark.graft.fpIndex", dir)
    try {
      // (b) the load-instead-of-rebuild claim, pinned on the plan: the
      // pair list's optimized plan must scan the index dir and must NOT
      // contain the shingle generator or a text column. q109 is exempt
      // from the no-Generate check — its n-gram TEXT recovery tier
      // legitimately re-tokenizes the postings-bounded doc set.
      def planOf(df: DataFrame): String =
        df.queryExecution.optimizedPlan.toString
      val pairPlan = planOf(
        SparkEntry.queries("q110_neardup_split_leakage")(spark, TestSpark.sfDir))
      assert(pairPlan.contains(dir), "q110 seam plan must scan the index")
      assert(!pairPlan.toLowerCase.contains("shingles("),
        "q110 seam plan must not re-tokenize")
      assert(!pairPlan.contains("text#"),
        "q110 seam plan must not read document text")
      val q111Plan = planOf(
        SparkEntry.queries("q111_contamination_pairs")(spark, TestSpark.sfDir))
      assert(q111Plan.contains(dir) && !q111Plan.contains("text#"))
      // q95's exact tier rides the index's `exact` table: no text either
      val q95Plan = planOf(
        SparkEntry.queries("q95_incremental_dedup")(spark, TestSpark.sfDir))
      assert(q95Plan.contains(dir) && !q95Plan.contains("text#"),
        "q95 seam plan must read hashes from the index, not text")
      // q121 is postings-only: index scan, no re-tokenize, no text.
      // Pinned on the PHYSICAL plan — unlike q110/q95, whose index reads
      // sit inside cached kernels (whose InMemoryRelation prints its
      // FileScan paths even in the optimized plan), q121's postings scan
      // is uncached and the optimized plan's bare `Relation … parquet`
      // elides the path.
      val q121Plan = SparkEntry.queries("q121_batch_novelty")(
        spark, TestSpark.sfDir).queryExecution.sparkPlan.toString
      assert(q121Plan.contains(dir) && !q121Plan.toLowerCase.contains("shingles(")
        && !q121Plan.contains("text#"),
        "q121 seam plan must ride the index postings only")
      // the datasheet under the seam audits the index WITHOUT the
      // corpus: all three tables scanned from the index dir, no
      // re-tokenize, no text anywhere in the plan
      val q124Plan = SparkEntry.queries("q124_index_stats")(
        spark, TestSpark.sfDir).queryExecution.sparkPlan.toString
      assert(q124Plan.contains(dir) && !q124Plan.toLowerCase.contains("shingles(")
        && !q124Plan.contains("text#"),
        "q124 seam plan must be pure index reads")

      // q125 under the seam reads the media table only: no text column,
      // no fingerprint UDF anywhere in the plan
      val q125Plan = SparkEntry.queries("q125_media_neardup")(
        spark, TestSpark.sfDir).queryExecution.sparkPlan.toString
      assert(q125Plan.contains(dir) && !q125Plan.contains("text#")
        && !q125Plan.toLowerCase.contains("udf"),
        "q125 seam plan must ride the persisted media fingerprints")

      // (a) value identity, every seam consumer
      for (q <- seamQueries) {
        val seam = rows(q)
        assert(seam == baseline(q), s"$q: seam result differs from session kernel")
      }
    } finally spark.conf.unset("spark.graft.fpIndex")

    // (c) conf-scoped: the kernel path is back after unset
    val again = rows("q110_neardup_split_leakage")
    assert(again == baseline("q110_neardup_split_leakage"))
  }

  test("q124 stats tier: identity across appends and compaction (the incremental datasheet)") {
    import org.apache.spark.sql.functions.col
    assert(spark.conf.getOption("spark.graft.fpIndex").isEmpty)
    val session = rows("q124_index_stats")
    val docs = graft.util.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text"))
    // base from one third, two appended batches — per-batch stats deltas
    // (dfc/bkc/xc summed per key on read, dsh additive) must reproduce
    // the from-scratch datasheet exactly; compaction folds the deltas
    // and must change nothing
    val dir = Files.createTempDirectory("graft-fpstats").toString + "/idx"
    graft.sink.Sink.writeFingerprints(docs.filter(col("doc_id") % 3 === 0), dir)
    graft.sink.Sink.appendFingerprints(
      docs.filter(col("doc_id") % 3 === 1), dir, "b1")
    graft.sink.Sink.appendFingerprints(
      docs.filter(col("doc_id") % 3 === 2), dir, "b2")
    spark.conf.set("spark.graft.fpIndex", dir)
    try {
      assert(graft.queries.TrainingOps.fpStatsDir(spark).contains(dir),
        "base stats generation must be detected")
      val statsPlan = SparkEntry.queries("q124_index_stats")(
        spark, TestSpark.sfDir).queryExecution.sparkPlan.toString
      assert(statsPlan.contains("dfc") && !statsPlan.contains("text#"),
        "q124 must read the stats tables, not the corpus")
      assert(rows("q124_index_stats") == session, "appended index")
      graft.sink.Sink.compactFingerprints(spark, dir)
      spark.sqlContext.clearCache()
      assert(rows("q124_index_stats") == session, "compacted index")
    } finally spark.conf.unset("spark.graft.fpIndex")
  }

  test("takedown tombstones (X116): seam audits serve the filtered corpus; the stats fast path stands down until the fold") {
    import org.apache.spark.sql.functions.col
    assert(spark.conf.getOption("spark.graft.fpIndex").isEmpty)
    val docs = graft.util.Tables.documents(spark, TestSpark.sfDir)
    // the post-takedown truth: the session kernels over a corpus the
    // deleted docs never entered
    val fDir = Files.createTempDirectory("graft-fcorpus").toString
    docs.filter(col("doc_id") % 7 =!= 0)
      .write.parquet(s"$fDir/documents.parquet")
    def rowsAt(name: String, dd: String): Seq[String] =
      SparkEntry.queries(name)(spark, dd).collect().map(_.toString).toSeq
    val wantQ29 = rowsAt("q29_lsh_neardup", fDir)
    val wantQ124 = rowsAt("q124_index_stats", fDir)

    val dir = Files.createTempDirectory("graft-fpdel").toString + "/idx"
    graft.sink.Sink.writeFingerprints(
      docs.select(col("doc_id"), col("text")), dir)
    graft.sink.Sink.deleteFingerprints(
      docs.filter(col("doc_id") % 7 === 0).select("doc_id"), dir, "t0")
    spark.conf.set("spark.graft.fpIndex", dir)
    try {
      // the pre-aggregated stats include the deleted docs — the fast
      // path must stand down (q124 then rides the tombstone-filtered
      // raw accessors and still lands on the filtered-corpus truth)
      assert(graft.queries.TrainingOps.fpStatsDir(spark).isEmpty,
        "stats tier must stand down while tombstones exist")
      assert(rowsAt("q29_lsh_neardup", TestSpark.sfDir) == wantQ29,
        "seam pair kernel must serve the post-takedown corpus")
      assert(rowsAt("q124_index_stats", TestSpark.sfDir) == wantQ124,
        "raw-riding datasheet must count only live rows")
      // compaction folds the deletes, re-derives the stats from the
      // filtered rows, and heals the fast path — same answers
      graft.sink.Sink.compactFingerprints(spark, dir)
      spark.sqlContext.clearCache()
      assert(graft.queries.TrainingOps.fpStatsDir(spark).contains(dir),
        "stats tier must heal after the fold")
      assert(rowsAt("q124_index_stats", TestSpark.sfDir) == wantQ124,
        "stats-riding datasheet must reflect the folded deletes")
      assert(rowsAt("q29_lsh_neardup", TestSpark.sfDir) == wantQ29,
        "pair kernel changed across the fold")
    } finally spark.conf.unset("spark.graft.fpIndex")
  }
}
