package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale validation: measures the sf0.1 → sf1 (10×) runtime
  * slope of the heavy dedup/similarity family, whose 100 TB claims are
  * otherwise plan-audit only. A ≈linear slope is evidence the bucketed
  * designs (LSH bands, IVF cells, shared shingle index) hold; a
  * super-linear one names the query that needs a fix.
  *
  * The 10× corpus is GENERATED from the source tables,
  * structure-preservingly, because a naive row duplication would be a
  * pathological input, not a scale-up: 10 exact copies of every document
  * give every doc 9 extra near-dup partners, inflating pair counts ~100×
  * where a real 10× corpus grows them ~10×. Instead each replica k gets
  * an injective token transform (every token suffixed with k), which
  *  - preserves the WITHIN-replica similarity structure exactly (the
  *    token mapping is injective, so shingle sets map 1:1 and every
  *    Jaccard/minhash relation among replica-k documents equals the
  *    original corpus's), and
  *  - zeroes CROSS-replica similarity (no shingle of replica j equals
  *    any of replica k ≠ j — every token differs in its suffix),
  * so pair-structured work scales exactly 10× — the honest slope.
  * Embeddings rotate component positions by k per replica: rotation
  * preserves norms and within-replica cosines exactly, while rotated
  * high-dimensional vectors are near-orthogonal across replicas.
  *
  * Usage: `runMain graft.ScaleCheck [srcDir] [outDir] [factor] [passes]`
  * — generates outDir once (skipped if present), then prints one JSON
  * line with per-query min-of-N seconds at both scales and the slope.
  * Session posture mirrors Bench (AQE off, hash-join preference,
  * shuffle.partitions = cores) so the numbers compose with BENCH_r*.
  */
object ScaleCheck {

  /** The heavy family: every query whose cost is corpus-pair-structured
    * (dedup, LSH, IVF, ANN, clustering) plus the map-side fingerprints
    * that share the corpus pass.
    */
  private val family = Seq(
    "q27_dedup_exact", "q28_minhash_sig", "q29_lsh_neardup", "q30_simhash",
    "q31_ngram_jaccard", "q32_cosine_topk", "q33_ivf_neardup",
    "q34_lsh_embed_sig", "q38_fingerprint", "q48_ann_topk",
    "q50_winnow_fingerprint", "q51_dedup_clusters", "q52_bm25_rank",
    // r7: decontamination is pair-structured (train×eval shingle join —
    // the replica doc_id offset is ≡ 0 mod 50, so each replica keeps its
    // own eval split and the 10× corpus scales the overlap structure,
    // not the cross product); sequence packing pins the distributed
    // prefix sum's slope
    "q65_decontaminate", "q66_sequence_pack",
    // r8: the tokenizer-statistics aggs — corpus pair/unigram volume
    // grows 10× but the partial-agg shape should keep the exchanges at
    // distinct-key volume; these rows pin that claim
    "q78_bpe_merge_pairs", "q79_bigram_lift",
    // r9: substring-run dedup is pair-structured (positional shingle
    // self-join — cross-replica shingles never match, so run volume
    // scales 10×); BPE learn+apply is rounds × (pair kernel + map) and
    // pins the driver-loop pattern's slope
    "q80_substring_runs", "q81_bpe_apply_pack",
    // r9b: the keep-best endpoint stacks the LSH pair kernel, the CC
    // labels and the quality join — its slope pins the composed path;
    // the kNN graph consumes the shared IVF pair index twice plus a
    // per-vector window, pinning the persisted-kernel reuse at scale;
    // the LM score is bigram-volume structured (one tokenize pass into
    // a persisted instance table + three distinct-key exchanges)
    "q82_dedup_keep_best", "q85_knn_graph", "q86_lm_score",
    // r9c: quality buckets stack the LM kernel + a quantization-bounded
    // histogram (the histogram/threshold stages should be scale-FLAT —
    // only the score pass grows); dup coverage is q80's run volume plus
    // doc-partitioned windows, so its slope should track q80's
    "q92_quality_buckets", "q93_dup_coverage",
    // r10: the audit family — source overlap is shingle-volume
    // structured (per-h1 source sets; cross-replica shingles never
    // match, so set volume scales 10× while |sources| stays fixed);
    // DSIR rides the term index (unigram volume 10×, fixed 512-bucket
    // model); MinHash calibration is pairIntersections volume plus two
    // doc-keyed signature joins.
    "q96_source_overlap", "q97_dsir_weights", "q99_minhash_error",
    // r13: the probe panel is now FIXED-SIZE (TrainingOps.ProbePanelSize
    // smallest md5(vec_id) — the production fixed-panel contract), so
    // q98's exact ground-truth tier is panel×corpus = LINEAR and the
    // r10 exclusion is lifted; q106 rides the same panel's cell-
    // restricted mining
    "q98_ann_recall",
    // r10b: the Gopher rules pin the pure map-side family's slope (should
    // be ≈1); the curation funnel stacks the LSH pair kernel, the shingle
    // index and the quality join — the composed-endpoint slope, expected
    // to track q82's
    "q100_gopher_rules", "q101_curation_funnel",
    // r10c: chunk windows pin the generator family's slope (map-side,
    // ~n/stride output rows); hard negatives pin the fixed-panel × cell
    // restriction (r13: the panel no longer grows with the corpus)
    "q105_chunk_windows", "q106_hard_negatives",
    // r11: standing-corpus incremental dedup — exact tier + minhash
    // filter over the shared pair kernel; named in the r10 verdict's
    // 100× tier and previously unpinned at any scale
    "q95_incremental_dedup",
    // r11b: the corpus-release composite stacks gate + keep-best +
    // decontamination + resample + split over every shared kernel — its
    // slope is the whole stack's story (replica structure: langs,
    // eval-split offsets and gate features are all replica-consistent,
    // so the funnel's proportions scale, not its semantics); the
    // memorization screen pins the hash-first report shape (df over the
    // shared index + a text-recovery pass bounded by the broadcast top
    // set)
    "q108_corpus_release", "q109_memorization_ngrams",
    // r11c: near-dup split leakage rides the shared pair list (its
    // marginal slope pins the pair-consumer path); contamination
    // provenance is q65's overlap-bounded join at (train, eval) pair
    // granularity
    "q110_neardup_split_leakage", "q111_contamination_pairs",
    // r12: the remaining audit shapes. q107 is one 16-byte-hash shuffle
    // + a hash-keyed join back — its slope pins the exact-tier audit.
    // q102 reads the NON-corpus tables too, which the scale corpus
    // carries over UNSCALED (see ensureAuxTables): its slope measures
    // the corpus-structured share (the fused documents/embeddings
    // partial-agg scans) with the fixed-size relational FK checks as a
    // constant term — scaling TPC-H tables is a TPC-H benchmark's job,
    // not the corpus tier's. q98_ann_recall stays the one documented
    // exclusion (see the r10 note above).
    "q102_expectations", "q107_split_leakage",
    // r12b: span masking is one map-side all-occurrence generate over
    // train docs + a planner-gated semi-join against the eval 8-gram
    // set; the only exchange carries overlap-bounded hit positions —
    // its slope pins the posngrams generate + broadcast-gate path.
    // Source caps pin the partial-WindowGroupLimit path (the source
    // exchange carries <=K rows per source per map partition)
    "q112_decontaminate_spans", "q113_source_caps",
    // the apply tier shares q112's span kernel; standalone here it pays
    // the kernel itself plus the span-bounded HOF surgery
    "q114_mask_apply",
    // r13b: the semantic-decontamination tier. q115 is a map-side
    // projection over the retained cellPairCos cache (marginal slope
    // pins the pair-consumer path on the embedding side); q116 joins
    // the two overlap-bounded pair lists (full-outer on pair keys —
    // output-sized); q117 composes three contamination-bounded flag
    // frames against the doc spine with planner-gated joins
    "q115_semantic_contamination", "q116_dedup_tier_agreement",
    "q117_decontam_decision",
    // incremental semantic dedup rides the same retained pair cache;
    // its marginal is the cross-set filter + the group-limited window
    "q118_incremental_semantic",
    // r13c: dup-span removal is token-volume structured (positional
    // triples → per-gram owner agg → the one attribution exchange;
    // cross-replica 8-grams never match, so duplicated-gram volume
    // scales 10×, not 100×) — q119 pays the shared kernel, q120's row
    // is the apply's marginal (span-bounded HOF surgery). Batch novelty
    // is one distinct-h1 agg + one membership join at postings volume.
    // Prototype pruning is linear in vectors by construction (the
    // mergeable centroid agg + a |cells|-row attach + cell-bounded
    // windows) — its slope pins the no-pair-enumeration claim
    "q119_dupspan_report", "q120_dupspan_apply",
    "q121_batch_novelty", "q122_prototype_prune",
    // the triage composite stacks the verdict frame (pair kernel),
    // novelty bands and the quality kernel — its slope prices the
    // incremental tier's composed sign-off path (q108's story for the
    // daily batch)
    "q123_batch_triage",
    // the index datasheet is four independent partial-aggregations at
    // postings/bucket volume — its slope pins the percentile-buffer
    // claim (buffers histogram distinct COUNT values, never raw rows)
    "q124_index_stats",
    // r14 (re-banded r15): media near-dup is one fingerprint pass + a
    // parity-banded self-join — cross-replica payloads differ (the
    // replica transform rewrites tokens), so candidate volume follows
    // the random-collision rate C(n,2)·5/2^24. The r14 5×12-bit bands
    // made this ~100×/decade (2.85e8 candidates at sf10 — the r14
    // verdict's one `weak`); the r15 5×24-bit bands drop it 2^12×, so
    // the decades should read ~linear — this row pins that claim
    "q125_media_neardup",
    // the tier agreement stacks the media pair kernel and the lexical
    // LSH pair kernel — in subset position AFTER q125 its marginal is
    // the lexical kernel + an overlap-bounded full-outer join
    "q126_media_tier_agreement",
    // the incremental twin and the CC endpoint are marginal consumers of
    // the same kernel in subset position (window + spine; hybrid-CC)
    "q127_incremental_media", "q128_media_clusters",
    // r15: the calibration row is panel×corpus — LINEAR by the fixed-
    // panel contract (the q98 argument); this row pins that slope for
    // the media tier too
    "q129_media_calibration",
    // r15: the vector-index datasheet — occupancy aggregates are
    // vector-volume linear, the threshold tier rides the shared pair
    // kernel in subset position; its slope pins the datasheet's
    // distinct-key-bounded claim
    "q130_vector_index_stats",
    // r15: the media-index datasheet — one fingerprint pass + a ×5
    // map-side band explode + bucket-bounded aggregates
    "q131_media_index_stats",
    // r15: the sketch overlap's state is |sources|·k longs regardless of
    // corpus size — its slope prices the one postings-volume exchange
    // feeding the signature aggregate (the pair stage is |S|²-bounded)
    "q132_source_overlap_sketch",
    // r15: the takedown impact page rides the three shared pair kernels
    // in subset position — its marginal is three output-sized endpoint
    // explodes + a request-sized join; the slope pins that claim
    "q133_takedown_report",
    // r17: the shard-takedown plan — one corpus map pass into an
    // 8-group O(1)-buffer aggregate (two multiset digests + counts);
    // its slope should track the raw scan like q89's
    "q135_shard_takedown_plan",
    // r18: the manifest-sidecar oracle face — q89's exact plan shape
    // over the kept rows (the filter is map-side), so the slope claim
    // is q135's
    "q136_shard_manifest_post")

  /** @param refitCells when true, each replica's embeddings land in
    *   REPLICA-DISTINCT IVF cells (label + k·10⁶) — the semantics of
    *   re-fitting the coarse quantizer to the larger corpus, which is
    *   what production does at 100 TB: #cells grows with the data so
    *   cell SIZE stays ~constant and pair volume scales linearly.
    *   When false (the legacy sf1 stress tier), labels stay fixed, so a
    *   10× corpus grows in-cell pair volume ~100× — a deliberately
    *   adversarial posture that stops being a meaningful scale-up past
    *   one decade (at 100× it would be 10,000× the pair volume, an
    *   input no fixed quantizer would ever be asked to serve). The two
    *   modes write the same schema; use DISTINCT outDirs — the
    *   _SUCCESS reuse check cannot tell them apart.
    */
  private[graft] def generate(spark: SparkSession, srcDir: String,
      outDir: String, factor: Int, refitCells: Boolean): Unit = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val embs = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val off = 10000000L
    // rotation must stay inside the vector: k ≥ dim rolls over (k mod
    // dim). Past one full cycle replica vectors REPEAT an earlier
    // replica's values — harmless under refitCells (cell-restricted
    // kernels never compare across replicas) and a slice() error
    // otherwise, so factors > dim require refitCells.
    val dim = embs.select(size(col("embedding"))).head.getInt(0)
    require(factor <= dim || refitCells,
      s"factor $factor exceeds embedding dim $dim: rotations repeat — use refitCells")
    val docReps = (0 until factor).map { k =>
      if (k == 0) docs
      else {
        val toks = split(trim(col("text")), "\\s+")
        val newText =
          array_join(transform(toks, w => concat(w, lit(k.toString))), " ")
        docs.select(
          (col("doc_id") + lit(k * off)).as("doc_id"),
          newText.as("text"), col("lang"), col("source"),
          length(newText).cast("long").as("n_chars"))
      }
    }
    val embReps = (0 until factor).map { k =>
      val label =
        if (refitCells && k > 0) (col("label") + lit(k * 1000000)).as("label")
        else col("label")
      val rot = k % dim
      if (k == 0) embs
      else {
        val e = col("embedding")
        val rolled =
          if (rot == 0) e
          else concat(slice(e, lit(rot + 1), size(e) - lit(rot)),
            slice(e, lit(1), lit(rot)))
        embs.select((col("vec_id") + lit(k * off)).as("vec_id"),
          rolled.as("embedding"), label)
      }
    }
    docReps.reduce(_ unionAll _).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embReps.reduce(_ unionAll _).repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  /** The scale corpus scales the CORPUS axis (documents + embeddings);
    * every other source table is carried over unscaled, so any registry
    * query can run against the scale dir. Idempotent (copies only
    * what's missing), and runs even when the corpus itself is reused —
    * pre-r12 scale dirs lacked these tables.
    */
  private def ensureAuxTables(srcDir: String, outDir: String): Unit = {
    def copyTree(src: java.io.File, dst: java.io.File): Unit =
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles).getOrElse(Array.empty[java.io.File])
          .foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
      } else
        java.nio.file.Files.copy(src.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Option(new java.io.File(srcDir).listFiles).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .filterNot(f => f.getName == "documents.parquet"
        || f.getName == "embeddings.parquet")
      .foreach { t =>
        val dst = new java.io.File(outDir, t.getName)
        // copy into a temp sibling, then rename: a copy interrupted
        // mid-table must not leave a directory the `exists` check would
        // mistake for a complete table on the next run
        if (!dst.exists()) {
          val tmp = new java.io.File(outDir, s".${t.getName}.tmp")
          if (tmp.exists()) {
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory)
                Option(f.listFiles).getOrElse(Array.empty[java.io.File]).foreach(rm)
              f.delete()
            }
            rm(tmp)
          }
          copyTree(t, tmp)
          if (!tmp.renameTo(dst))
            sys.error(s"aux table copy failed: $tmp -> $dst")
        }
      }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val passes = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitioning must scale with the DATA, not the host: a
    // 100× corpus through a fixed 32 partitions makes each reduce
    // partition 100× — the r11 q31 sf10 experiment measured 59 s
    // (spilling) vs the 26.6 s pair-linear floor at 512. The default is
    // now DERIVED from the measured corpus's bytes (graft.util.Tuning;
    // both scales get their own derived count via a runtime re-set at
    // the timing boundary below). SPARK_GRAFT_SHUFFLE pins a fixed
    // count for A/B runs; SPARK_GRAFT_AQE=true for the AQE posture.
    val fixedShuffle = sys.env.get("SPARK_GRAFT_SHUFFLE")
    def partitionsFor(dir: String): String =
      fixedShuffle.getOrElse(
        graft.util.Tuning.shufflePartitions(dir, cpus.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", partitionsFor(srcDir))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // a table is a valid corpus only once its parquet commit finished —
    // the _SUCCESS marker; a bare directory left by an interrupted
    // generate would otherwise be reused and produce bogus slopes
    def committed(table: String): Boolean =
      new java.io.File(s"$outDir/$table.parquet/_SUCCESS").exists()
    // SPARK_GRAFT_SCALE_REFIT=true → quantizer-refit corpus semantics
    // (see generate's scaladoc); REQUIRED for factors past one decade
    val refit = sys.env.get("SPARK_GRAFT_SCALE_REFIT").contains("true")
    if (!(committed("documents") && committed("embeddings"))) {
      System.err.println(
        s"[scale] generating ${factor}x corpus at $outDir (refitCells=$refit)")
      generate(spark, srcDir, outDir, factor, refit)
    }
    ensureAuxTables(srcDir, outDir)

    // SPARK_GRAFT_SCALE_ONLY=q31_ngram_jaccard,q51_dedup_clusters re-runs
    // a subset — for re-measuring a load-spiked outlier in a quiet window
    // without repeating the whole family
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val qs = SparkEntry.registry.filter(q => family.contains(q.name)
      && only.forall(_.contains(q.name)))
    // per-QUERY partition class (r13): the pair-expansion class takes
    // the tier's derived count, narrow composites the cores floor — the
    // measured two-class posture (BASELINE.md r12: q31 needs 544 at
    // sf10 or it spills; q108 at 544 pays 3× in waves). A hand-set
    // SPARK_GRAFT_SHUFFLE still pins everything for A/B runs. Note the
    // shared-kernel interplay: a kernel is cached at its BUILDER's
    // count, so subset composition still matters for marginal numbers
    // (the scale_audit.sh discipline).
    def partitionsForQuery(q: graft.queries.Q, dir: String): String =
      fixedShuffle.getOrElse(graft.util.Tuning.queryPartitions(
        q.pairExpansion, dir, cpus.toInt).toString)
    def run(q: graft.queries.Q, dir: String): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", partitionsForQuery(q, dir))
      graft.util.Caches.clearTransient()
      q.fn(spark, dir).write.format("noop").mode("overwrite").save()
    }
    def time(dir: String): Seq[(String, Double)] = {
      System.err.println(s"[scale] $dir: shuffle.partitions per class: " +
        s"pair=${partitionsFor(dir)} narrow=${cpus.toInt}" +
        fixedShuffle.fold("")(f => s" (pinned $f)"))
      spark.sqlContext.clearCache()
      qs.foreach(run(_, dir)) // warmup: JIT, codegen, parquet footers
      val timed = (1 to passes).map { _ =>
        spark.sqlContext.clearCache() // pass boundary, as in Bench
        qs.map { q =>
          val t0 = System.nanoTime()
          run(q, dir)
          q.name -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }
      qs.map(q => q.name -> timed.map(_(q.name)).min)
    }

    val base = time(srcDir)
    val scaled = time(outDir)

    // Distributed connected-components exercise: AnalyticsSpec proves
    // driver≡distributed on toy graphs; this forces the min-label
    // propagation loop (maxDriverEdges=0) on the REAL corpus at both
    // scales — parity against the driver union-find path, plus timing,
    // so the path that survives billions of edges has a measured slope,
    // not just a spec. Output order is plan-root-pinned, so collected
    // rows compare positionally.
    // skipped (not failed) when a SPARK_GRAFT_SCALE_ONLY subset excludes
    // q51 — the exercise is q51's alternate execution regime
    val q51Opt = qs.find(_.name == "q51_dedup_clusters")
    def ccRows(q51: graft.queries.Q, dir: String): Seq[String] = {
      graft.util.Caches.clearTransient()
      q51.fn(spark, dir).collect().map(_.toString).toSeq
    }
    def ccParityAndTime(q51: graft.queries.Q, dir: String): (Boolean, Double) = {
      spark.conf.set("spark.sql.shuffle.partitions",
        partitionsForQuery(q51, dir))
      spark.sqlContext.clearCache()
      val viaDriver = ccRows(q51, dir)
      spark.conf.set("spark.graft.cc.maxDriverEdges", "0")
      try {
        val viaDistributed = ccRows(q51, dir)
        run(q51, dir) // warmup under the distributed regime
        val t = (1 to passes).map { _ =>
          spark.sqlContext.clearCache()
          val t0 = System.nanoTime()
          run(q51, dir)
          (System.nanoTime() - t0) / 1e9
        }.min
        (viaDriver == viaDistributed, t)
      } finally spark.conf.unset("spark.graft.cc.maxDriverEdges")
    }
    val ccPair = q51Opt.map { q51 =>
      (ccParityAndTime(q51, srcDir), ccParityAndTime(q51, outDir))
    }

    val baseMap = base.toMap
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fmt(xs: Seq[(String, Double)]) =
      // Locale.ROOT: comma-decimal default locales would break the JSON
      xs.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
        .mkString("{", ",", "}")
    val slopes = scaled.map { case (k, v) => k -> v / baseMap(k) }
    val distcc = ccPair match {
      case Some(((parityBase, ccBase), (parityScaled, ccScaled))) =>
        s"""{"parity_base":$parityBase,"parity_scaled":$parityScaled,""" +
          s""""base":${fmt3(ccBase)},"scaled":${fmt3(ccScaled)},"slope":${fmt3(ccScaled / ccBase)}}"""
      case None => "null"
    }
    println(s"""{"metric":"scale_slope","factor":$factor,"passes":$passes,""" +
      s""""base":${fmt(base)},"scaled":${fmt(scaled)},""" +
      s""""slope":${fmt(slopes)},"distcc":$distcc,"src":"$srcDir","out":"$outDir"}""")
    spark.stop()
  }
}
