package graft

import org.apache.spark.sql.execution.SimpleMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that make these operators
  * scale (predicate pushdown into the parquet scan, column pruning,
  * broadcast joins for dims, map-side partial aggregation, top-k without a
  * global sort) are pinned here so a refactor that silently loses one
  * fails the suite — the .explain audit, codified.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .queryExecution.explainString(SimpleMode)

  test("q02 point lookup: equality predicate pushed into the parquet scan") {
    val p = plan("q02_point_lookup")
    assert(p.contains("EqualTo(o_orderkey,42)"), p)
    assert(p.contains(
      "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double>"), p)
  }

  test("q03 filter+project: pushdown and column pruning reach the scan") {
    val p = plan("q03_filter_project")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    // only the 4 referenced columns are read, not the full customer schema
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_acctbal:double,c_mktsegment:string>"), p)
  }

  test("q08 FK join: dim side broadcasts — no shuffle of the fact table") {
    val p = plan("q08_fk_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q09 multi-join agg: all three dims broadcast, one hash shuffle") {
    val p = plan("q09_join_agg")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    // map-side combine before the shuffle (sum → graft_decsum int128)
    assert(p.contains("partial_graft_decsum") || p.contains("partial_sum"), p)
  }

  test("q10 flagship agg: partial aggregation before the shuffle") {
    val p = plan("q10_agg_pricing")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q17 top-k: TakeOrderedAndProject, not a global sort") {
    val p = plan("q17_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q27 exact dedup: map-side partial min/count") {
    val p = plan("q27_dedup_exact")
    assert(p.contains("partial_min"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q32 cosine top-k: broadcast query vector, no shuffle join") {
    val p = plan("q32_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q34 hyperplane signatures: one map stage, no join/shuffle before the sort") {
    val p = plan("q34_lsh_embed_sig")
    // the sign matrix ships in the UDF closure: no join of any kind, and
    // the only exchange is the presentation-sort gather of the result
    assert(!p.contains("Join"), p)
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }

  // PresentationSortRule: the root presentation sort becomes a
  // single-partition gather + local sort when the child's output is
  // cardinality-reduced (aggregate/distinct tops, threshold-filtered
  // joins — join-inflated size estimates must NOT decline these, the
  // round-3 q33 regression), but a bare join keeps its full input
  // cardinality and must keep the parallel range sort (the round-4
  // 100 TB gather hazard), as must a large exchange-free pipeline.
  test("presentation sort: threshold-filtered self-join rewrites to a gather past the byte guard") {
    import org.apache.spark.sql.functions.{col, length}
    val conf = spark.conf
    val saved = conf.getOption("spark.graft.presentationSort.maxBytes")
    try {
      conf.set("spark.graft.presentationSort.maxBytes", "1") // force the byte guard to decline
      // the round-3 q33 regression shape: an inner self-join whose
      // condition carries a computed-measure-vs-constant threshold
      // residual (the optimizer merges the post-join filter into the
      // join). Join-inflated size estimates must not decline the gather
      // for this shape. (q33's own kernel moved to a typed fused
      // pre-limit in r11 — an opaque MapPartitions the rule deliberately
      // does NOT see through, so the structural claim is pinned on the
      // join shape directly.)
      val docs = graft.util.Tables.documents(spark, TestSpark.sfDir)
      val p = docs.as("a")
        .join(docs.as("b"),
          col("a.lang") === col("b.lang")
            && col("a.doc_id") < col("b.doc_id")
            && length(col("a.text")) + length(col("b.text")) >= 100)
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
        .orderBy("ida", "idb")
        .queryExecution.explainString(SimpleMode)
      assert(p.contains("SinglePartition"), p)
      assert(!p.contains("rangepartitioning"), p)
    } finally {
      saved.fold(conf.unset("spark.graft.presentationSort.maxBytes"))(
        conf.set("spark.graft.presentationSort.maxBytes", _))
    }
  }

  test("presentation sort: aggregate-topped child rewrites to a gather past the byte guard") {
    val conf = spark.conf
    val saved = conf.getOption("spark.graft.presentationSort.maxBytes")
    try {
      conf.set("spark.graft.presentationSort.maxBytes", "1")
      val p = plan("q09_join_agg") // groupBy agg top: provably reduced
      assert(p.contains("SinglePartition"), p)
      assert(!p.contains("rangepartitioning"), p)
    } finally {
      saved.fold(conf.unset("spark.graft.presentationSort.maxBytes"))(
        conf.set("spark.graft.presentationSort.maxBytes", _))
    }
  }

  test("presentation sort: implicit-cast attr-vs-constant filter is NOT a reducing threshold") {
    import org.apache.spark.sql.functions.col
    val conf = spark.conf
    val saved = conf.getOption("spark.graft.presentationSort.maxBytes")
    val docs = graft.util.Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "n_chars").persist()
    try {
      conf.set("spark.graft.presentationSort.maxBytes", "1") // decline the byte guard
      // `doc_id >= 0.5` analyzes as Cast(doc_id) >= 0.5 — a BARE column
      // in an implicit cast, tautological over the int domain. It must
      // not count as a computed-measure threshold: over a cached view
      // that would bypass the byte guard and gather an arbitrarily
      // large relation onto one partition.
      val p = docs.filter(col("doc_id") >= 0.5).orderBy("doc_id")
        .queryExecution.explainString(SimpleMode)
      assert(p.contains("rangepartitioning"), p)
      assert(!p.contains("SinglePartition"), p)
    } finally {
      docs.unpersist()
      saved.fold(conf.unset("spark.graft.presentationSort.maxBytes"))(
        conf.set("spark.graft.presentationSort.maxBytes", _))
    }
  }

  test("presentation sort: shared cached views gather — builders and threshold consumers") {
    val conf = spark.conf
    val saved = conf.getOption("spark.graft.presentationSort.maxBytes")
    try {
      conf.set("spark.graft.presentationSort.maxBytes", "1") // decline the byte guard
      // q29: root sort DIRECTLY over the persisted verified-pair view —
      // the rule must judge the CACHED plan (const-threshold filter top),
      // because the view's pre-materialization stats are join-inflated
      assert(!plan("q29_lsh_neardup").contains("rangepartitioning"),
        plan("q29_lsh_neardup"))
      // q31: const-threshold filter over the cached pair-intersection
      // view — the filteringJoin selectivity argument, one level up
      assert(!plan("q31_ngram_jaccard").contains("rangepartitioning"),
        plan("q31_ngram_jaccard"))
    } finally {
      graft.util.Caches.clearTransient()
      saved.fold(conf.unset("spark.graft.presentationSort.maxBytes"))(
        conf.set("spark.graft.presentationSort.maxBytes", _))
    }
  }

  test("presentation sort: bare equi-join child has no unconditional gather bypass") {
    // q08's root sort sits over the full FK-join output (every orders
    // row) — not cardinality-reduced, so unlike q33/q09 it rewrites only
    // while the byte guard holds (it does at this tiny SF; at scale the
    // join stats exceed it and the parallel range sort survives).
    val conf = spark.conf
    val saved = conf.getOption("spark.graft.presentationSort.maxBytes")
    try {
      conf.set("spark.graft.presentationSort.maxBytes", "1") // simulate at-scale stats
      val p = plan("q08_fk_join")
      assert(p.contains("rangepartitioning"), p)
      assert(!p.contains("SinglePartition"), p)
    } finally {
      saved.fold(conf.unset("spark.graft.presentationSort.maxBytes"))(
        conf.set("spark.graft.presentationSort.maxBytes", _))
    }
  }

  test("presentation sort: filter over an OUTER join has no unconditional gather bypass") {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit}
    // a residual filter above a left-outer join proves nothing about
    // cardinality (output ~ the preserved side) — like a bare join it
    // must stay behind the byte guard, not ride the filter's bypass
    val conf = spark.conf
    val saved = conf.getOption("spark.graft.presentationSort.maxBytes")
    try {
      conf.set("spark.graft.presentationSort.maxBytes", "1")
      val orders = graft.util.Tables.orders(spark, TestSpark.sfDir)
      val perCust = orders.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val df = graft.util.Tables.customer(spark, TestSpark.sfDir)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .filter(coalesce(col("n"), lit(0L)) >= 0L) // keeps ~every row
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
      val p = df.queryExecution.explainString(SimpleMode)
      assert(p.contains("rangepartitioning"), p)
      assert(!p.contains("SinglePartition"), p)
    } finally {
      saved.fold(conf.unset("spark.graft.presentationSort.maxBytes"))(
        conf.set("spark.graft.presentationSort.maxBytes", _))
    }
  }

  test("presentation sort: large exchange-free child keeps its parallel range sort") {
    import org.apache.spark.sql.functions.col
    val conf = spark.conf
    val saved = conf.getOption("spark.graft.presentationSort.maxBytes")
    try {
      conf.set("spark.graft.presentationSort.maxBytes", "1") // scan stats exceed this
      val df = graft.util.Tables.lineitem(spark, TestSpark.sfDir)
        .select("l_orderkey", "l_quantity").orderBy(col("l_quantity").desc)
      val p = df.queryExecution.explainString(SimpleMode)
      assert(p.contains("rangepartitioning"), p)
      assert(!p.contains("SinglePartition"), p)
    } finally {
      saved.fold(conf.unset("spark.graft.presentationSort.maxBytes"))(
        conf.set("spark.graft.presentationSort.maxBytes", _))
    }
  }

  test("q52 BM25: nothing leaves the document's row before the stats agg") {
    graft.util.Caches.clearTransient() // plan the per-doc build, not a cache hit
    val p = plan("q52_bm25_rank")
    // r5 exploded one row per token (Generate) and re-grouped; r6 swapped
    // that for three interpreted filter() lambdas; r7 is one primitive
    // tf-kernel pass — the plan must show neither regression
    assert(!p.contains("Generate"), p)
    assert(!p.contains("lambdafunction"), p)
  }

  test("map-side per-doc kernels (q62/q63/q64): no exchange before the presentation sort") {
    // the multimodal resize/frame-sample stages and the repetition
    // kernel are single-pass per document — any hashpartitioning
    // exchange means a join/groupBy crept back in
    for (q <- Seq("q62_media_resize", "q63_frame_sample", "q64_repetition")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"), s"$q:\n$p")
      assert(!p.contains("Join"), s"$q:\n$p")
    }
  }

  test("q65 decontamination: eval shingle set broadcasts, equi-join on h1") {
    val p = plan("q65_decontaminate")
    // the eval side collapses to distinct h1 and broadcasts; the train
    // side never shuffles into a pair-forming join wider than the hash
    assert(p.contains("BroadcastHashJoin [h1#"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoop"), p)
  }

  test("q66 sequence packing: the corpus prefix sum is bucket-parallel") {
    graft.util.Caches.clearTransient()
    val p = plan("q66_sequence_pack")
    // the running total over corpus rows is a Window PARTITIONED by the
    // doc_id bucket — a bare Window.orderBy here would plan the whole
    // corpus into one partition
    assert("windowspecdefinition\\(pid#\\d+L, doc_id#\\d+L ASC".r
      .findFirstIn(p).isDefined, p)
    // the only single-partition requirement is the bucket-count-sized
    // offsets table (plus the presentation sort's REPARTITION_BY_NUM)
    assert("Exchange SinglePartition, ENSURE_REQUIREMENTS".r
      .findAllIn(p).size == 1, p)
    // offsets join back broadcast; both branches read the persisted
    // (doc_id, n, pid) frame, not a second corpus scan
    assert(p.contains("BroadcastHashJoin [pid#"), p)
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("q67 domain mix: pure map-side coin, one partial-agg shuffle") {
    val p = plan("q67_domain_mix")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_sum(keep"), p)
    assert(!p.contains("Join"), p)
  }

  test("q69 vocab top-k: a distinct over the term dictionary, TakeOrdered at the top") {
    val p = plan("q69_vocab_topk")
    // the corpus count is the index row's own cf column (attached at
    // build time) — q69 is a distinct projection of the term dictionary,
    // no aggregate of its own; the top-100 is a bounded per-partition
    // head merge, not a global sort
    assert(p.contains("InMemoryTableScan"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q70 normalized dedup: one hash shuffle of 16-byte keys, no join") {
    val p = plan("q70_normalized_dedup")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Join"), p)
  }

  test("q71 per-group sample: partial WindowGroupLimit runs before the shuffle") {
    val p = plan("q71_per_group_sample")
    // only ≤5 rows per (group, partition) cross the wire — the rank
    // filter must push a Partial group-limit below the lang exchange
    assert(p.contains("WindowGroupLimit"), p)
    val partialIdx = p.indexOf("row_number(), 5, Partial")
    val exchIdx = p.indexOf("Exchange hashpartitioning(lang")
    assert(partialIdx >= 0 && exchIdx >= 0 && exchIdx < partialIdx, p)
  }

  test("q72 filter funnel: one pass, four counters, no second scan") {
    val p = plan("q72_filter_funnel")
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_sum"), p)
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q73 VQ assign: driver-collected codebook, one map stage, no join") {
    val p = plan("q73_vq_assign")
    // the 16-centroid codebook rides the UDF closure — a join or a 16×
    // row expansion here means the broadcast-codebook design regressed
    assert(!p.contains("Join"), p)
    assert(!p.contains("Generate"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("q74 length histogram: one map-side-combined pass") {
    val p = plan("q74_length_histogram")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("Join"), p)
  }

  test("q77 PII scrub: pure map-side kernel, no exchange before the presentation sort") {
    val p = plan("q77_pii_scrub")
    // count + redact + hash all live inside the document's row — any
    // hashpartitioning exchange or join means the kernel stopped being
    // a single pass at read bandwidth
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q78 BPE merge pairs: a distinct over the term dictionary, TakeOrdered at the top") {
    val p = plan("q78_bpe_merge_pairs")
    // the pair count is the g=2 row's own cf column (the q69 shape);
    // the top-50 is a bounded per-partition head merge
    assert(p.contains("InMemoryTableScan"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q79 bigram lift: no forced broadcast of the unbounded unigram table") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = SparkEntry.queries("q79_bigram_lift")(spark, TestSpark.sfDir)
    // exactly ONE explicit broadcast hint survives analysis: the 1-row
    // token total. The unigram-table joins must stay planner-gated —
    // the vocabulary is unbounded at corpus scale, and a broadcast()
    // hint is honored regardless of size, so a forced broadcast there
    // is an executor OOM at 100 TB. (At test scale the planner still
    // chooses broadcast from the size estimate — that's fine; the pin
    // is that nothing FORCES it.)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.length == 1, hints.mkString("\n"))
    val p = plan("q79_bigram_lift")
    assert(p.contains("TakeOrderedAndProject"), p)
    // both corpus statistics read the SHARED term-frequency index (r10)
    // and partial-sum its pre-collapsed per-doc counts
    assert(p.contains("InMemoryTableScan"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q80 substring runs: one profile exchange, self-join reuses its partitioning") {
    // AQE makes cached-plan output partitioning non-reusable (consumers
    // re-exchange) — read the plan in the bench posture, where the
    // partitioning-reuse claim is the one that holds
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // build-site plan (the q86-test rationale): the registry plan may be
      // a bare read of the SHARED runs table once any suite has built it
      val p = graft.queries.TrainingOps
        .substringRunsBuild(spark, TestSpark.sfDir)
        .queryExecution.explainString(SimpleMode)
      // the h-partitioned profile is cached and shared by both join sides
      assert(p.contains("InMemoryTableScan"), p)
      // no ENSURE_REQUIREMENTS re-shuffle on h: the df-cap window and the
      // self-join ride the profile's own REPARTITION_BY_COL exchange
      assert(!"Exchange hashpartitioning\\(h#\\d+L, \\d+\\), ENSURE_REQUIREMENTS".r
        .findFirstIn(p).isDefined, p)
      // no all-pairs shape anywhere in the kernel
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
      // the registry form adds the deterministic top-50 as a bounded head
      // merge (this holds whether the plan builds or reads the shared
      // runs table)
      assert(plan("q80_substring_runs").contains("TakeOrderedAndProject"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("q76 containment: reads the shared index, no extra corpus scan") {
    val p = plan("q76_containment")
    // both join sides and the size view come off the cached shingle
    // index — a FileScan of documents here means the sharing regressed
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoop"), p)
  }

  test("q68 cube: Expand sits above the finest agg, one fact-table scan") {
    val p = plan("q68_cube")
    // the naive GROUP BY CUBE expands every lineitem row ×4 before the
    // shuffle; the two-level form expands only the (region, nation) table
    assert("Expand".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_graft_decsum_dec"), p)
    assert("FileScan parquet \\[l_suppkey".r.findAllIn(p).size == 1, p)
    // Expand's input is an aggregate (rev_exact), not the raw scan
    assert(p.contains("Expand [[rev_exact"), p)
  }

  test("q84 grouping sets: Expand sits above the finest agg, one fact-table scan") {
    // the q53/q68 two-level contract, for the general set-list form
    val p = plan("q84_grouping_sets")
    assert("Expand".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_graft_decsum_dec"), p)
    assert("FileScan parquet \\[l_suppkey".r.findAllIn(p).size == 1, p)
    assert(p.contains("Expand [[rev_exact"), p)
  }

  test("q83 pps sample: stratum totals broadcast, keep decision map-side") {
    val p = plan("q83_pps_sample")
    // the totals side is a bounded |strata|-row aggregate — broadcast it;
    // a sort-merge here would shuffle the whole corpus on lang
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the totals aggregate partial-aggregates before its exchange
    assert(p.contains("partial_sum"), p)
    // the corpus side joins without its own exchange: the only
    // hash-partitioning exchange in the plan is the totals aggregate's
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q86 LM score: model instances and both model aggs read the shared term index") {
    // the registry plan may be a bare read of the SHARED score table
    // (whichever suite built it first) — pin the kernel structure at its
    // build site, the same plan whichever query materializes it
    val p = graft.queries.TrainingOps.lmScoresBuild(spark, TestSpark.sfDir)
      .queryExecution.explainString(SimpleMode)
    // the instance table IS the shared term-frequency index's g=2 tier
    // (distinct (doc, pair) rows with multiplicity, collapsed map-side
    // inside the index's generator; c12 rides as the row's own cf
    // column) and the unigram dictionary is a distinct over the same
    // index — two reads of ONE cached corpus pass, no tokenize pass and
    // no model aggregate of q86's own
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    // the per-doc score is a partial-aggregated sum keyed by doc
    assert(p.contains("keys=[doc_id"), p)
    assert(p.contains("partial_sum"), p)
    // no cartesian anywhere — every model join is an equi-join
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q87 shard layout: one shard shuffle; past the byte guard the sort stays range-parallel") {
    val conf = spark.conf
    val saved = conf.getOption("spark.graft.presentationSort.maxBytes")
    try {
      // force the byte guard to decline the gather — the 100 TB regime,
      // where the corpus-sized layout must keep the parallel range sort
      conf.set("spark.graft.presentationSort.maxBytes", "1")
      val p = plan("q87_shard_layout")
      // one hash exchange total: the window's shuffle on shard
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
      assert(p.contains("Window"), p)
      assert(p.contains("rangepartitioning"), p)
      assert(!p.contains("SinglePartition"), p)
    } finally {
      saved match {
        case Some(v) => conf.set("spark.graft.presentationSort.maxBytes", v)
        case None => conf.unset("spark.graft.presentationSort.maxBytes")
      }
    }
  }

  test("q88 TF-IDF: scoring is map-side off the term dictionary — no df join") {
    val p = plan("q88_tfidf_keywords")
    // df is the index row's own column: scoring reads the cached index
    // with NO df aggregate and NO vocabulary join — the only join left
    // is the 1-row doc-count broadcast, and the only exchange the
    // per-doc top-k window's
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the 1-row n_docs
    assert(p.contains("Window"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q89 shard manifest: one map pass, one partial-agg shuffle") {
    val p = plan("q89_shard_manifest")
    // shard key, content md5 and token count are all per-row map work —
    // exactly one aggregation exchange (plus the root sort's)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("cellPairCos kernel: fused pre-limit — one in-partition sort, no window, no extra exchange") {
    // the r10 retention contract (cos >= threshold OR either side's
    // per-(cell, block-pair) top-K), r11-FUSED: one sortWithinPartitions
    // by (group, cos DESC, idb, ida) + a single counting scan replaces
    // the two row_number windows. The pinned scale properties:
    //  - the salted self-join is still the only pair source (no
    //    cartesian), and its two input shuffles are the ONLY exchanges —
    //    the pre-limit sort rides the join's output partitioning;
    //  - the sort is LOCAL (no rangepartitioning — a global sort here
    //    would re-exchange the full pair volume, the exact cost the
    //    fusion exists to avoid);
    //  - no Window operator at all (a refactor back to the twin-window
    //    form re-pays a second full-pair-volume sort+rank pass).
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sqlContext.clearCache() // judge the uncached build shape
      val p = graft.queries.TrainingOps.cellPairCosBuild(spark, TestSpark.sfDir)
        .queryExecution.explainString(SimpleMode)
      assert(p.contains("MapPartitions"), p)
      assert(!p.toLowerCase.contains("window"), p)
      assert(!p.contains("rangepartitioning"), p)
      assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
      assert(!p.contains("CartesianProduct"), p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("q85 knn graph: both union branches read the shared cached pair table") {
    val p = plan("q85_knn_graph")
    // the symmetrize is two projections of the SAME persisted pair set —
    // re-running the salted self-join per branch doubles the heavy stage
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Union"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  /** Shingle-generator sites in the CONSUMER plan — cached relations
    * count zero (their embedded build plan legitimately tokenizes; the
    * explain string prints it under InMemoryTableScan, so a raw text
    * count would see it).
    */
  private def consumerGenSites(name: String): Int = {
    def cnt(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      p match {
        case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => 0
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          (if (g.generator.isInstanceOf[graft.plans.ShingleGenerator]) 1 else 0) +
            g.children.map(cnt).sum
        case other => other.children.map(cnt).sum
      }
    cnt(SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .queryExecution.optimizedPlan)
  }

  test("q82/q108 ride the shared keep-best rank table; q108 never re-tokenizes for n_tok") {
    // the dedup DECISION kernels (labels, keep-best ranks, contamination
    // hits) are session-shared indexes (r11): the first consumer builds,
    // the rest must plan a cache read — a refactor back to per-consumer
    // builds re-pays the corpus-wide quality pass per query
    SparkEntry.queries("q82_dedup_keep_best")(spark, TestSpark.sfDir).count()
    val p82 = plan("q82_dedup_keep_best")
    assert(p82.contains("InMemoryTableScan"), p82)
    val p108 = plan("q108_corpus_release")
    // q108's consumer plan: cache reads for ranks + hits, and ZERO
    // tokenize-generator sites outside cached builds — the gate's
    // n_words doubles as n_tok, so a second corpus tokenize pass (the
    // pre-r11 shape) is a regression this pins out
    assert(p108.contains("InMemoryTableScan"), p108)
    assert(consumerGenSites("q108_corpus_release") == 0, p108)
    // the only non-equi join allowed is the 1-row min-mass broadcast
    // attach (the q104 pattern); an unbroadcast cartesian is a blowup
    assert(!p108.contains("CartesianProduct"), p108)
    assert(!p108.replace("BroadcastNestedLoopJoin", "")
      .contains("NestedLoop"), p108)
  }

  test("q109 memorization screen: df rides the shared index; text recovery is top-set-bounded") {
    SparkEntry.queries("q28_minhash_sig")(spark, TestSpark.sfDir).count() // build index
    val p = plan("q109_memorization_ngrams")
    // frequency tier: a cache read of the shingle index, not a fresh
    // tokenize; selection: TakeOrdered (no global sort of the df table)
    assert(p.contains("InMemoryTableScan"), p)
    assert(p.contains("TakeOrdered"), p)
    // text tier: exactly one generator pass outside cached builds,
    // joined to the broadcast top set (strings never shuffle corpus-wide)
    assert(consumerGenSites("q109_memorization_ngrams") == 1, p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q110/q111 ride shared kernels: cache reads, overlap-bounded joins, no blowup") {
    // build the shared pair list + shingle index first (any family
    // consumer does); the audits must then plan CACHE reads
    SparkEntry.queries("q29_lsh_neardup")(spark, TestSpark.sfDir).count()
    val p110 = plan("q110_neardup_split_leakage")
    assert(p110.contains("InMemoryTableScan"), p110)
    assert(!p110.contains("CartesianProduct") && !p110.contains("NestedLoop"), p110)
    val p111 = plan("q111_contamination_pairs")
    assert(p111.contains("InMemoryTableScan"), p111)
    assert(consumerGenSites("q111_contamination_pairs") == 0, p111)
    assert(!p111.contains("CartesianProduct") && !p111.contains("NestedLoop"), p111)
  }

  test("q91 source datasheet: one tokenize pass, partial aggregation, no blowup") {
    val p = plan("q91_source_datasheet")
    // qualityFeatures supplies BOTH n_tokens and score — exactly one
    // regexp split site in the whole plan, not a second tokenize
    assert("split".r.findAllIn(p.toLowerCase).size >= 1, p)
    assert(p.contains("partial_count") || p.contains("partial percentile"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q90 semantic dedup: edges ride the shared pair cache; no blowup joins") {
    // the labels path consumes the edge list EAGERLY (driver union-find at
    // this scale), so the cache read cannot appear in the assembled plan —
    // pin the property at its site: q90's edge source is the SAME persisted
    // cellPairCos table q33/q85 read (the threshold filter must not re-run
    // the salted self-join)
    import org.apache.spark.sql.functions.col
    val edges = graft.queries.TrainingOps.cellPairCos(spark, TestSpark.sfDir)
      .filter(col("cos") >= 0.35).select("ida", "idb")
    val ep = edges.queryExecution.explainString(SimpleMode)
    assert(ep.contains("InMemoryTableScan") || ep.contains("InMemoryRelation"), ep)
    val p = plan("q90_semantic_dedup")
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q92 quality buckets: shared score table, 1-row broadcast thresholds only") {
    val p = plan("q92_quality_buckets")
    // the per-doc score table feeds BOTH the histogram and the bucket
    // assignment off one persisted copy — without it the whole q86 LM
    // kernel (corpus tokenize + model joins) runs twice
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    // the thresholds reach the assignment as a 1-row broadcast — the only
    // non-equi join in the plan is that bounded nested-loop; a
    // CartesianProduct (both sides unbounded) must never appear
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // histogram + final bucket agg both partial-aggregate map-side
    assert(p.contains("partial_count"), p)
  }

  test("q94 epoch plan: one corpus shuffle; water-fill rides bounded broadcasts") {
    val p = plan("q94_epoch_plan")
    // the ONLY corpus-sized data movement is the per-source token agg —
    // every later stage (prefix sums, saturation, λ) works the
    // |sources|-row table. The persisted plan table is scanned by several
    // consumers and each InMemoryTableScan REPRINTS the cached lineage,
    // so count DISTINCT exchange ids, not text occurrences: one physical
    // corpus shuffle.
    val exIds = raw"Exchange hashpartitioning[^\n]*\[plan_id=(\d+)\]".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    // guard the regex against explain-format drift (plan_id suffixes vary
    // across Spark versions/modes): an empty match set means the PATTERN
    // broke, not that the one-shuffle property regressed
    assert(exIds.nonEmpty,
      s"explain-format drift: no 'Exchange hashpartitioning…[plan_id=N]' matched\n$p")
    assert(exIds.size == 1, p)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3, p)
    assert(p.contains("partial_sum"), p)
    // budget/m and (k, P_k) reach the plan as 1-row broadcasts — the
    // nested-loop joins are those bounded singletons, never a
    // CartesianProduct of unbounded sides
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q95 incremental dedup: near tier rides the shared pair kernel; hash-keyed exact tier") {
    val p = plan("q95_incremental_dedup")
    // the near tier must be a FILTER over the persisted lshPairs table —
    // re-running the LSH pipeline for the batch view would double the
    // family's heavy stage
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"), p)
    // exact tier: map-side partial min under the hash-equality join
    assert(p.contains("partial_min"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q101 curation funnel: stage predicates ride the shared pair/shingle kernels") {
    // warm the kernels the way a session running the dedup family does —
    // the funnel must then read the persisted pair list and shingle
    // index, not re-run the LSH chain
    SparkEntry.queries("q29_lsh_neardup")(spark, TestSpark.sfDir).count()
    val p = plan("q101_curation_funnel")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q102 expectations: one fused scan per table, stack unpivot") {
    val p = plan("q102_expectations")
    // all three documents checks (and both events checks) must share ONE
    // scan — separate agg subtrees per check would re-read the table
    assert("documents\\.parquet".r.findAllIn(p).size == 1, p)
    assert("events\\.parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("stack"), p)
  }

  test("q93 dup coverage: both interval branches read the shared runs table; windows keyed by doc") {
    val p = plan("q93_dup_coverage")
    // the runs kernel (shingle self-join + diagonal windows) is the heavy
    // stage — both union branches must read its persisted output, not
    // re-run it per interval direction
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Union"), p)
    // the island windows partition by doc_id — bounded by per-doc run
    // count, never a corpus-global sort. WindowExec prints
    // `Window [funcs], [partition cols], [order]` — match doc_id in the
    // PARTITION list specifically (a bare "[doc_id" would match any
    // attribute list and can never fail)
    assert(raw"Window \[[^\]]*\], \[doc_id#\d+L\]".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("manifest sidecar read-back: column pruning reaches the artifact scan (the X119 claim)") {
    import org.apache.spark.sql.functions._
    // writeShards computes the sidecar from a read-back of the artifact
    // it just wrote — the claim in its doc is that the extra pass reads
    // only the manifest inputs, never the payload columns. Pin it: the
    // shardManifest plan over a q87-style artifact (which also carries a
    // fat `text` column here) must scan ONLY doc_id + n_chars (+ the
    // shard partition column), with text and pos pruned away.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-planman").toString + "/s"
    graft.util.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("shard", (col("doc_id") % 4).cast("long"))
      .withColumn("pos", col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    val p = graft.sink.Sink.shardManifest(spark.read.parquet(dir))
      .queryExecution.explainString(SimpleMode)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p)
    assert(!p.contains("text"), p)
    // and the aggregation is the q89 shape: partial (map-side) then
    // final — never a collect-style global gather
    assert(p.contains("partial_"), p)
  }
}
