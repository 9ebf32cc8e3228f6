package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale behaviors that only show up in layout + runtime planning:
  * partition pruning against a partitioned parquet layout, and AQE
  * splitting a skewed join partition at execution time. Together with
  * BucketingSpec these pin the three layout levers the 100 TB design
  * leans on (partition pruning, bucketing, adaptive skew handling).
  */
class ScaleBehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitionBy layout: filters prune partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    graft.util.Tables.events(spark, TestSpark.sfDir)
      .write.partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("event_type") === "click")
      .select("event_id", "value")
    val plan = df.queryExecution.explainString(SimpleMode)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(plan.contains("(event_type") && plan.contains("= click"), plan)
    // the data filter did NOT degrade to a post-scan filter
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type"), plan)
  }

  test("q33 IVF self-join is block-salted: the shuffle key carries the block columns") {
    val df = SparkEntry.queries("q33_ivf_neardup")(spark, TestSpark.sfDir)
    // the pair kernel is a shared+persisted index (r9): the salted join
    // lives in the InMemoryRelation's BUILD plan, not the consumer plan
    val cached = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cachedPlan.toString
    }
    val p = if (cached.nonEmpty) cached.mkString("\n")
            else df.queryExecution.optimizedPlan.toString
    // the equi-join key must be (label, blk, pb)↔(label, pa, blk), not bare
    // label — a refactor back to the un-salted cell join (one reducer per
    // hot cell at scale) fails here
    assert(p.contains("pb") && p.contains("pa"), p)
    val joined = "(?s)Join.*label.*(blk|pa).*".r
    assert(joined.findFirstIn(p).isDefined, p)
  }

  test("pre-partitioned shared index: per-doc aggregation plans with NO exchange") {
    // the shingle index persists hash-partitioned on doc_id; the cached
    // InMemoryTableScan keeps that partitioning, so a groupBy(doc_id)
    // over it (wide signatures, sizes) must not add its own shuffle —
    // the build-time exchange is the only one the family ever pays
    val q28 = SparkEntry.queries("q28_minhash_sig")(spark, TestSpark.sfDir)
    q28.count() // force the shared index to build + cache
    val plan = q28.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan)
    // judge only the CONSUMER plan — everything above the cached
    // relation (whose embedded build plan legitimately contains the one
    // build-time doc_id exchange): the only allowed consumer exchange is
    // the presentation-sort gather of the final (tall) rows, never a
    // hashpartitioning for the doc_id aggregation
    val consumer = plan.substring(0, plan.indexOf("InMemoryRelation"))
    assert(!consumer.contains("Exchange hashpartitioning"), plan)
  }

  test("shared term-frequency index: ONE tokenize pass for the whole statistics family") {
    // the r10 contract behind q69/q78/q79/q86/q88: the corpus tokenize
    // pass lives in the shared index's build; every family consumer
    // reads the cached copy. Bench posture (AQE off — under AQE the
    // cached partitioning is not reusable and consumers re-exchange,
    // the documented q80 caveat), index rebuilt under it.
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sqlContext.clearCache() // rebuild the shared index under this posture
      val q69 = SparkEntry.queries("q69_vocab_topk")(spark, TestSpark.sfDir)
      q69.count() // the ONE tokenize pass: builds + caches the index
      def generates(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case g: org.apache.spark.sql.execution.GenerateExec => g
        }.size
      // zero Generate nodes in any family consumer plan — a tokenize
      // pass of a query's own (the r9 shape) regresses this to >0
      assert(generates(q69) == 0)
      for (q <- Seq("q78_bpe_merge_pairs", "q79_bigram_lift", "q88_tfidf_keywords"))
        assert(generates(SparkEntry.queries(q)(spark, TestSpark.sfDir)) == 0, q)
      assert(generates(
        graft.queries.TrainingOps.lmScoresBuild(spark, TestSpark.sfDir)) == 0)
      // and the corpus term aggregation rides the index's persisted term
      // partitioning: no hashpartitioning exchange in q69's consumer plan
      // (the build-time exchange inside the InMemoryRelation is the only
      // term-keyed data movement the family ever pays)
      val plan = q69.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan)
      val consumer = plan.substring(0, plan.indexOf("InMemoryRelation"))
      assert(!consumer.contains("Exchange hashpartitioning"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("manifest digests are mergeable: no collect_list buffer in any manifest plan") {
    // the r11 verdict's scale-killer: an A2 sorted-list hash at manifest
    // tier buffers a corpus-sized group's every element in one reduce
    // task. q108 (per-(split,lang) release id sets) and q89 (per-shard
    // content checksums) must aggregate through the O(1)-buffer
    // graft_hashsum digest — assert the buffer shape in the PLAN, cached
    // kernels included, so a refactor back to collect_list fails here.
    for (q <- Seq("q108_corpus_release", "q89_shard_manifest")) {
      val df = SparkEntry.queries(q)(spark, TestSpark.sfDir)
      val cached = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          r.cachedPlan.toString
      }
      val p = df.queryExecution.optimizedPlan.toString + cached.mkString("\n")
      assert(!p.contains("collect_list"), s"$q plan buffers a full group: $p")
      assert(p.contains("graft_hashsum"), s"$q lost the mergeable digest: $p")
    }
    // the A2 form SURVIVES where the reference uses it — q12's groups are
    // per-contract file sets, bounded by construction
    val q12 = SparkEntry.queries("q12_multiset_hash")(spark, TestSpark.sfDir)
    assert(q12.queryExecution.optimizedPlan.toString.contains("collect_list"))
  }

  test("q92 histogram is quantization-bounded: bins live in [0, 2^20] at any corpus size") {
    // the cumulate window's single partition is bounded BY DESIGN —
    // lm_score is a mean of probabilities in [0, 1], so
    // floor(score · 2^20) has at most 2^20+1 distinct values REGARDLESS
    // of corpus size. Pin the invariant that carries the bound (the
    // range), not just the row count at test scale.
    val bins = SparkEntry.queries("q86_lm_score")(spark, TestSpark.sfDir)
      .select(floor(col("lm_score") * lit(1048576.0)).as("bin"))
    val mm = bins.agg(min("bin"), max("bin"), countDistinct("bin")).head
    assert(mm.getLong(0) >= 0L && mm.getLong(1) <= 1048576L, mm)
    assert(mm.getLong(2) <= 1048577L, mm)
  }

  test("q66 prefix sum reuses the pid build partitioning: one consumer exchange") {
    // the (doc_id, n, pid) frame persists hash-partitioned on pid; at
    // execution the in-bucket window and the offsets groupBy both run
    // straight off the cached scan, so the consumer side pays exactly
    // one hashpartitioning exchange — the final seq_id aggregation
    graft.util.Caches.clearTransient()
    val df = SparkEntry.queries("q66_sequence_pack")(spark, TestSpark.sfDir)
    df.count() // force build + cache so the executed plan is adaptive-final
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan)
    val consumer = plan.substring(0, plan.indexOf("InMemoryRelation"))
    assert("Exchange hashpartitioning".r.findAllIn(consumer).size == 1, plan)
    assert(consumer.contains("hashpartitioning(seq_id"), plan)
  }

  test("AQE splits a skewed join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // thresholds low enough that the synthetic hot key (90% of rows on
      // one join key) registers as skew at sf0.001 volumes
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join

      // sf0.01 so the hot partition (~54k rows on one key) is decisively
      // above the skew threshold. Two structural requirements discovered
      // the hard way, both real at cluster scale:
      //  - the dim side must be a BARE shuffle below its Sort — with an
      //    aggregate in between, OptimizeSkewedJoin cannot duplicate the
      //    matching right partitions and silently declines;
      //  - skew splitting works at MAP-output granularity: a single-mapper
      //    shuffle (one parquet split) yields one indivisible block, so
      //    the input needs multiple map tasks (repartition(16) here;
      //    ~hundreds of scan tasks in production).
      val li = graft.util.Tables.lineitem(spark, "/root/testdata/sf0.01")
        .withColumn("k", when(col("l_orderkey") % 10 =!= 0, lit(0L))
          .otherwise(col("l_orderkey")))
        .repartition(16)
      val dim = spark.range(0, 7000)
        .select((col("id") * 10).as("k"), lit("x").as("payload"))
      val joined = li.join(dim, Seq("k"))
        .select(col("k"), col("l_quantity"), col("payload"))
      // collect(), not count(): count() builds its OWN QueryExecution, so
      // joined.queryExecution would stay un-executed (isFinalPlan=false)
      assert(joined.collect().length == 60000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
