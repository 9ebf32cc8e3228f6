package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf experiments (not part of the driver contract): times the
  * hot registry queries under different engine postures so optimization
  * targets facts, not guesses. Run: `runMain graft.Profile <sfDir>`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // mirror Bench's AQE posture (overridable like Bench): under AQE a
      // cached relation's output partitioning is not reusable by
      // consumers (coalescing may change it), which inserts exchanges
      // Bench never pays — plans read here must be the benched plans
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      // the AQE-anomaly experiment's knobs (see BASELINE.md r12): the
      // coalescing size target, and size-first coalescing as in Bench
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64MB"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // generic conf passthrough for A/B experiments:
    // SPARK_GRAFT_CONF="key=value;key2=value2" (runtime-settable SQLConfs)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
    })

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // two-class partition posture (r13, the ScaleCheck/Bench rule): when
    // SPARK_GRAFT_SHUFFLE is not pinned, `time`/`family` size the
    // shuffle per query from its registry class tag — so a standalone
    // Profile number composes with the battery's, zero hand-set env
    def classShuffle(name: String): Unit =
      if (sys.env.get("SPARK_GRAFT_SHUFFLE").isEmpty)
        SparkEntry.registry.find(_.name == name).foreach { q =>
          spark.conf.set("spark.sql.shuffle.partitions",
            graft.util.Tuning.queryPartitions(q.pairExpansion, sfDir, 32))
        }

    // `runMain graft.Profile <sfDir> explain <query>`: dump the plan
    if (args.length >= 3 && args(1) == "explain") {
      SparkEntry.queries(args(2))(spark, sfDir).explain("formatted")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> objaggab [passes]`: interleaved
    // in-JVM A/B of the ObjectHashAggregate sort-fallback threshold on
    // the two group-heavy object-buffer aggregations (r18): the KMV
    // signature stage at fine grain (|S|=140 groups — q134's sig build)
    // and q96's per-h1 collect_set profile (~corpus-distinct-shingle
    // groups). Spark's default threshold is 128 DISTINCT KEYS per task
    // hash map; past it the partial agg abandons hashing and SORTS its
    // whole input. Both stages read the warm shared postings kernel so
    // the A/B isolates the aggregation itself.
    if (args.length >= 2 && args(1) == "objaggab") {
      import graft.queries.{AuditOps, TrainingOps}
      val passes = args.lift(2).map(_.toInt).getOrElse(3)
      val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
      // warm the postings kernel once (shared index: survives clears of
      // nothing — no clearCache in this verb)
      TrainingOps.shinglePostings(spark, sfDir).count()
      def sig() = noop(AuditOps.kmvSigs(spark, sfDir, grain = Some(7)))
      def prof() = {
        import org.apache.spark.sql.functions._
        val src = graft.util.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("source"))
        noop(TrainingOps.shinglePostings(spark, sfDir)
          .join(src.hint("shuffle_hash"), "doc_id")
          .groupBy("h1")
          .agg(array_sort(collect_set(col("source"))).as("srcs"))
          .groupBy("srcs").agg(count(lit(1)).as("w")))
      }
      for ((label, fn) <- Seq("kmvSigs(grain=7)" -> (() => sig()),
          "q96 bySet profile" -> (() => prof()))) {
        fn() // JIT warm
        val res = Seq("128", "4194304").map { thr =>
          spark.conf.set(key, thr)
          val ts = (1 to passes).map { _ =>
            val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
          }
          thr -> ts.min
        }
        spark.conf.unset(key)
        println(f"[objaggab] $label%-22s " + res.map { case (t, v) =>
          f"thr=$t $v%.3f s" }.mkString("  "))
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> kmvpersistab [passes]`: interleaved
    // A/B (r18) — the q132/q134 registry faces consume kmvSigs RAW,
    // so the banded stage's four references to the sig frame re-run the
    // final ObjectHashAggregate merge 3x and sort-merge-join full agg
    // subtrees; the kmvPairs front door transient-persists the sigs
    // first. Same rows either way (AuditSpec estimate-identity). Warm
    // postings kernel; arms differ only in the persist.
    if (args.length >= 2 && args(1) == "kmvpersistab") {
      import graft.queries.AuditOps
      val passes = args.lift(2).map(_.toInt).getOrElse(4)
      graft.queries.TrainingOps.shinglePostings(spark, sfDir).count()
      def raw134() = noop(AuditOps.kmvPairsBanded(
        AuditOps.kmvSigs(spark, sfDir, grain = Some(7))))
      def per134() = {
        val t = graft.util.Caches.transientPersist(
          AuditOps.kmvSigs(spark, sfDir, grain = Some(7)))
        noop(AuditOps.kmvPairsBanded(t))
        graft.util.Caches.clearTransient()
      }
      def raw132() = noop(AuditOps.kmvPairsNL(
        AuditOps.kmvSigs(spark, sfDir)))
      def per132() = {
        val t = graft.util.Caches.transientPersist(
          AuditOps.kmvSigs(spark, sfDir))
        noop(AuditOps.kmvPairsNL(t))
        graft.util.Caches.clearTransient()
      }
      // decomposition arms: sig build alone (fresh agg over warm
      // postings), banded over a PRE-materialized sig frame (stage
      // isolation — kmvscale's number), estimator-free banded candidates
      val sigsMat = AuditOps.kmvSigs(spark, sfDir, grain = Some(7)).persist()
      sigsMat.count()
      def sigOnly() = noop(AuditOps.kmvSigs(spark, sfDir, grain = Some(7)))
      def bandedOnly() = noop(AuditOps.kmvPairsBanded(sigsMat))
      def mat134() = {
        val t = graft.util.Caches.transientPersist(
          AuditOps.kmvSigs(spark, sfDir, grain = Some(7)))
        t.count() // materialize BEFORE the 4-reference consumer plan
        noop(AuditOps.kmvPairsBanded(t))
        graft.util.Caches.clearTransient()
      }
      val arms = Seq("q134 raw" -> (() => raw134()),
        "q134 persist" -> (() => per134()),
        "q134 mat+banded" -> (() => mat134()),
        "q134 sigOnly" -> (() => sigOnly()),
        "q134 bandedOnly" -> (() => bandedOnly()),
        "q132 raw" -> (() => raw132()),
        "q132 persist" -> (() => per132()))
      arms.foreach(_._2()) // warm
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      for (_ <- 1 to passes; (name, arm) <- arms) {
        val t0 = System.nanoTime(); arm()
        times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
      }
      for ((name, _) <- arms)
        println(f"[kmvpersistab] $name%-16s min=${times(name).min}%7.3f runs " +
          times(name).reverse.map(v => f"$v%.3f").mkString(" "))
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> explainall <outDir> [q...]`: write
    // explain("formatted") of each named query (default: every benched
    // query) to <outDir>/<query>.txt in ONE JVM — the plans/rN evidence
    // dump. Plans are read in the bench posture (classShuffle per
    // query), so Exchange counts match what Bench times.
    if (args.length >= 3 && args(1) == "explainall") {
      val outDir = new java.io.File(args(2))
      outDir.mkdirs()
      val names = if (args.length > 3) args.drop(3).toSeq
        else SparkEntry.registry.filter(_.bench).map(_.name)
      for (name <- names) {
        classShuffle(name)
        val df = SparkEntry.queries(name)(spark, sfDir)
        // same rendering as explain("formatted") without the console tap
        val txt = org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted") match { case m =>
            df.queryExecution.explainString(m)
          }
        val w = new java.io.PrintWriter(
          new java.io.File(outDir, s"$name.txt"), "UTF-8")
        try w.println(txt) finally w.close()
        graft.util.Caches.clearTransient()
      }
      println(s"[explainall] wrote ${names.size} plans to ${outDir}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> floor`: how much of a small query's
    // bench time is plan CONSTRUCTION (DataFrame build + analysis +
    // optimization + physical planning) vs EXECUTION? Decides whether the
    // per-query floor work should target Catalyst latency or the runtime.
    if (args.length >= 2 && args(1) == "floor") {
      val floorQs = if (args.length > 2) args.drop(2).toSeq
        else Seq("q10_agg_pricing", "q40_session_window", "q09_join_agg",
          "q53_rollup", "q56_stats_corr", "q18_window_rank", "q01_count_scan",
          "q30_simhash", "q52_bm25_rank")
      for (name <- floorQs) {
        val fn = SparkEntry.queries(name)
        // warm everything once
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val tFull = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        val tPlan = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.executedPlan // build+analyze+optimize+plan
          (System.nanoTime() - t0) / 1e9
        }.min
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val tExec = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[floor] $name%-22s full ${tFull}%6.3f  plan ${tPlan}%6.3f  exec-prebuilt ${tExec}%6.3f")
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> time <query> [passes]`: warmed
    // min-of-N for one query, bench posture, clear caches per pass
    // `runMain graft.Profile <sfDir> fpindex <outDir>`: persist the X76
    // fingerprint index of <sfDir>'s documents table — the standing-
    // corpus index the SPARK_GRAFT_FP_INDEX seam then lets standalone
    // audits (q110/q111/q95 and the contamination kernels) ride instead
    // of rebuilding the session shingle kernel. Pair with `time`:
    //   Profile /tmp/graft-sf10r fpindex /tmp/fp10 &&
    //   SPARK_GRAFT_FP_INDEX=/tmp/fp10 Profile /tmp/graft-sf10r time q110...
    if (args.length >= 3 && args(1) == "fpindex") {
      import org.apache.spark.sql.functions.col
      val t0 = System.nanoTime()
      graft.sink.Sink.writeFingerprints(
        graft.util.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text")), args(2))
      println(f"[fpindex] wrote ${args(2)} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> vecindex <outDir>`: persist the
    // X103 vector index (vectors + retained pairs) of <sfDir>'s
    // embeddings — the semantic tier's standing artifact the
    // SPARK_GRAFT_VEC_INDEX seam lets standalone audits
    // (q115/q116/q118 and every cellPairCos consumer) ride instead of
    // re-quantizing and re-enumerating the corpus. The fpindex pattern:
    //   Profile /tmp/graft-sf10r vecindex /tmp/vec10 &&
    //   SPARK_GRAFT_VEC_INDEX=/tmp/vec10 Profile /tmp/graft-sf10r time q116...
    if (args.length >= 3 && args(1) == "vecindex") {
      val t0 = System.nanoTime()
      graft.sink.Sink.writeVectorIndex(
        graft.util.Tables.embeddings(spark, sfDir), args(2))
      println(f"[vecindex] wrote ${args(2)} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> shufab <query> <partsA> <partsB>
    // [passes]`: INTERLEAVED shuffle-partition A/B in ONE JVM — the
    // instrument for the two-class tag decisions. Single-box sf10
    // timings swing 2–6× with window state (page-cache/writeback
    // residue from a previous 64g JVM — the r13c q119 lesson, where
    // back-to-back ScaleCheck runs read 57 s and 4.3 s for the SAME
    // posture); alternating the postures pass-by-pass inside one
    // process subjects both to identical window drift, so the min-per-
    // posture comparison isolates the partition count itself.
    if (args.length >= 5 && args(1) == "shufab") {
      val fn = SparkEntry.queries(args(2))
      val pa = args(3)
      val pb = args(4)
      val passes = args.lift(5).map(_.toInt).getOrElse(3)
      def once(p: String): Double = {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      once(pa); once(pb) // warm both postures (JIT, codegen, footers)
      val timed = (1 to passes).map(_ => (once(pa), once(pb)))
      val (as, bs) = timed.unzip
      println(f"[shufab] ${args(2)} parts=$pa%-5s min ${as.min}%.3f  " +
        s"runs ${as.map(v => f"$v%.3f").mkString(" ")}")
      println(f"[shufab] ${args(2)} parts=$pb%-5s min ${bs.min}%.3f  " +
        s"runs ${bs.map(v => f"$v%.3f").mkString(" ")}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> dupspanab [passes]`: X104's
    // persist-vs-recompute A/B, interleaved in one JVM (the shufab
    // discipline). Arm P transient-persists the positional triples —
    // ONE posngrams generate feeding both the owner aggregation and the
    // attribution join through a token-volume MEMORY_AND_DISK persist.
    // Arm R recomputes — TWO generates (each consumer tokenizes), zero
    // persist footprint. At 100 TB the question is whether a ~1.5×-
    // corpus-sized persisted intermediate beats a second embarrassingly-
    // parallel map pass; the local decade measurements calibrate it.
    if (args.length >= 2 && args(1) == "dupspanab") {
      val passes = args.lift(2).map(_.toInt).getOrElse(3)
      import org.apache.spark.sql.functions.{count, lit}
      def once(persist: Boolean): Double = {
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        val t0 = System.nanoTime()
        noop(graft.queries.AuditOps.dupSpansBuild(spark, sfDir, persist)
          .groupBy("doc_id").agg(count(lit(1)).as("n")))
        (System.nanoTime() - t0) / 1e9
      }
      once(true); once(false) // warm both shapes
      val timed = (1 to passes).map(_ => (once(true), once(false)))
      val (ps, rs) = timed.unzip
      println(f"[dupspanab] persist   min ${ps.min}%.3f  " +
        s"runs ${ps.map(v => f"$v%.3f").mkString(" ")}")
      println(f"[dupspanab] recompute min ${rs.min}%.3f  " +
        s"runs ${rs.map(v => f"$v%.3f").mkString(" ")}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> q119parts [passes]`: stage
    // decomposition of the dupSpans kernel (q119/q120's dominant cost,
    // the r19 verdict's ask #5) — generate+persist the positional
    // triples, owners aggregation alone, the full kernel over warm
    // triples, and the report aggregation over a warm kernel.
    if (args.length >= 2 && args(1) == "q119parts") {
      import org.apache.spark.sql.functions._
      val passes = args.lift(2).map(_.toInt).getOrElse(3)
      import graft.queries.AuditOps
      def med(f: () => Unit): Double = {
        val ts = (1 to passes).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }
        ts.min
      }
      val docs = graft.util.Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull)
      def triBase = docs.selectExpr("doc_id", "posngrams(text, 8) AS (pos, g)")
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          graft.functions.Hashing.md5Long(col("g")).as("h1"))
      // warm JIT
      noop(triBase)
      println(f"[q119parts] triples noop (no persist)     ${med(() => noop(triBase))}%.3f s")
      val tri = triBase.persist(); tri.count()
      println(f"[q119parts] owners agg r18 (distinct+agg) ${med(() => noop(
        tri.select("doc_id", "h1").distinct().groupBy("h1")
          .agg(min("doc_id").as("owner"), count(lit(1)).as("df"))
          .filter(col("df") >= 2).select("h1", "owner")))}%.3f s")
      println(f"[q119parts] owners agg r19 (min/max)      ${med(() => noop(
        tri.groupBy("h1")
          .agg(min("doc_id").as("owner"), max("doc_id").as("mx"))
          .filter(col("owner") =!= col("mx")).select("h1", "owner")))}%.3f s")
      println(f"[q119parts] full kernel over warm triples ${med(() => noop(
        AuditOps.dupSpansOver(spark, tri)))}%.3f s")
      val spans = AuditOps.dupSpansOver(spark, tri).persist(); spans.count()
      println(f"[q119parts] report agg over warm kernel   ${med(() => noop(
        spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"),
          sum(col("e") - col("s") + lit(1L)).as("masked_tokens"))))}%.3f s")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> q96gc [passes]`: the r18 q96
    // session-inflation study (r19 verdict ask #3). q96's bench row ran
    // ~0.4-0.6 s slower in the full suite than in a 4-query subset at
    // identical posture; hypothesis: GC/cache-residency interplay with
    // the ~60 cached session frames. This instrument reproduces the
    // contrast IN ONE JVM: time q96 in a LEAN session (only its own
    // kernels cached), then LOAD the session with the kernel-building
    // consumer block (the frames a full pass leaves resident) and time
    // it again — reading GC-MXBean time/collection deltas around the
    // timed runs. A/B GC postures via SPARK_GRAFT_JAVA_OPTS around this
    // verb (e.g. "-XX:+UseParallelGC"); the lean/loaded contrast inside
    // one JVM is window-robust where full-suite pairs are not.
    if (args.length >= 2 && args(1) == "q96gc") {
      import java.lang.management.ManagementFactory
      import scala.jdk.CollectionConverters._
      val passes = args.lift(2).map(_.toInt).getOrElse(5)
      val q96 = SparkEntry.queries("q96_source_overlap")
      def gcNow(): (Long, Long) = {
        val bs = ManagementFactory.getGarbageCollectorMXBeans.asScala
        (bs.map(_.getCollectionTime).sum, bs.map(_.getCollectionCount).sum)
      }
      def heapUsed(): Long =
        ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed
      def timedRuns(label: String): Unit = {
        classShuffle("q96_source_overlap")
        val (gt0, gc0) = gcNow()
        val ts = (1 to passes).map { _ =>
          graft.util.Caches.clearTransient()
          val t0 = System.nanoTime(); noop(q96(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        val (gt1, gc1) = gcNow()
        println(f"[q96gc] $label%-6s min=${ts.min}%.3f runs " +
          ts.map(v => f"$v%.3f").mkString(" ") +
          f"  gc=${gt1 - gt0} ms/${gc1 - gc0} colls" +
          f"  heap=${heapUsed() / (1 << 20)} MB")
      }
      val gcName = ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getName).mkString("+")
      println(s"[q96gc] collector: $gcName  heapMax=" +
        s"${Runtime.getRuntime.maxMemory / (1 << 20)} MB")
      // LEAN: only q96's own inputs cached (first run builds them)
      noop(q96(spark, sfDir)) // JIT + kernel warm
      timedRuns("lean")
      // LOADED: materialize the session frames a full bench pass leaves
      // resident (the kernel-building consumer block + big-cache rows)
      val loaders = Seq("q27_dedup_exact", "q28_minhash_sig",
        "q29_lsh_neardup", "q31_ngram_jaccard", "q36_quality_score",
        "q51_dedup_clusters", "q52_bm25_rank", "q65_decontaminate",
        "q69_vocab_topk", "q80_substring_runs", "q85_knn_graph",
        "q86_lm_score", "q90_semantic_dedup", "q95_incremental_dedup",
        "q100_gopher_rules", "q109_memorization_ngrams",
        "q112_decontaminate_spans", "q118_incremental_semantic",
        "q119_dupspan_report", "q121_batch_novelty", "q123_batch_triage",
        "q124_index_stats", "q125_media_neardup", "q127_incremental_media")
      loaders.foreach { n =>
        graft.util.Caches.clearTransient()
        classShuffle(n)
        noop(SparkEntry.queries(n)(spark, sfDir))
      }
      graft.util.Caches.clearTransient()
      timedRuns("loaded")
      // and once more after dropping everything back to lean (rebuild):
      // distinguishes "resident caches" from "JVM aged by the block"
      spark.sqlContext.clearCache()
      noop(q96(spark, sfDir))
      timedRuns("relean")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> saltab [passes]`: the r14 hot-gram
    // mitigation's marginal-cost A/B on a HEALTHY corpus, interleaved in
    // one JVM (the shufab discipline) — salted (shipped) vs unsalted
    // attribution join. The salt's cost is an owners ×8 explode + a
    // (h1, salt) key; the question is whether the un-skewed common case
    // pays anything measurable for the deterministic skew bound.
    if (args.length >= 2 && args(1) == "saltab") {
      val passes = args.lift(2).map(_.toInt).getOrElse(3)
      import org.apache.spark.sql.functions.{count, lit}
      def once(salted: Boolean): Double = {
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        val t0 = System.nanoTime()
        noop(graft.queries.AuditOps.dupSpansBuild(spark, sfDir,
          persistTriples = true, salted = salted)
          .groupBy("doc_id").agg(count(lit(1)).as("n")))
        (System.nanoTime() - t0) / 1e9
      }
      once(true); once(false)
      val timed = (1 to passes).map(_ => (once(true), once(false)))
      val (ss, us) = timed.unzip
      println(f"[saltab] salted   min ${ss.min}%.3f  " +
        s"runs ${ss.map(v => f"$v%.3f").mkString(" ")}")
      println(f"[saltab] unsalted min ${us.min}%.3f  " +
        s"runs ${us.map(v => f"$v%.3f").mkString(" ")}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> postriab <triDir> [passes]`: price
    // a PERSISTED POSITIONAL TIER for the fingerprint index (r14 ask
    // #3) — the (doc_id, pos, h1) 8-gram triples that q112/q114/q119/
    // q120 currently re-derive by tokenizing the corpus each session.
    // One-time build cost + on-disk bytes printed, then the dupspanab
    // methodology: the dup-span kernel interleaved in one JVM, session
    // tokenize+persist arm vs parquet-read arm.
    if (args.length >= 3 && args(1) == "postriab") {
      import org.apache.spark.sql.functions.{col, count, lit}
      val triDir = args(2)
      val passes = args.lift(3).map(_.toInt).getOrElse(3)
      val fs = new org.apache.hadoop.fs.Path(triDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(new org.apache.hadoop.fs.Path(triDir))) {
        val t0 = System.nanoTime()
        graft.util.Tables.documents(spark, sfDir)
          .filter(col("text").isNotNull)
          .selectExpr("doc_id", "posngrams(text, 8) AS (pos, g)")
          .select(col("doc_id"), col("pos").cast("long").as("pos"),
            graft.functions.Hashing.md5Long(col("g")).as("h1"))
          .repartition(col("doc_id")).sortWithinPartitions("doc_id", "pos")
          .write.parquet(triDir)
        println(f"[postriab] build ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val bytes = fs.getContentSummary(
        new org.apache.hadoop.fs.Path(triDir)).getLength
      println(s"[postriab] bytes $bytes")
      def once(idx: Boolean): Double = {
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        val t0 = System.nanoTime()
        val spans =
          if (idx) graft.queries.AuditOps.dupSpansOver(spark,
            spark.read.parquet(triDir))
          else graft.queries.AuditOps.dupSpansBuild(spark, sfDir,
            persistTriples = true)
        noop(spans.groupBy("doc_id").agg(count(lit(1)).as("n")))
        (System.nanoTime() - t0) / 1e9
      }
      once(false); once(true)
      val timed = (1 to passes).map(_ => (once(false), once(true)))
      val (ks, is) = timed.unzip
      println(f"[postriab] session  min ${ks.min}%.3f  " +
        s"runs ${ks.map(v => f"$v%.3f").mkString(" ")}")
      println(f"[postriab] indexed  min ${is.min}%.3f  " +
        s"runs ${is.map(v => f"$v%.3f").mkString(" ")}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> rows <query>`: materialize and
    // count one query's result — the cheap sanity check that a scale
    // measurement timed real work (a plan that silently emptied would
    // otherwise bench "fast")
    // `runMain graft.Profile <sfDir> eagerab <query> [passes]`: does
    // eagerly materializing the query's transient-persisted frames
    // (spark.graft.eagerTransient — one count() at persist time, the
    // q132/q134 mechanism) beat the shipping lazy persist? Interleaved
    // arms in BOTH postures: cold (clearCache per rep — kernel rebuild
    // included, the `time` posture) and warm (shared kernels survive,
    // only transients cleared — the bench steady-state posture for
    // non-first family consumers). Same rows either way by
    // construction (count() only materializes).
    if (args.length >= 3 && args(1) == "eagerab") {
      val fn = SparkEntry.queries(args(2))
      val passes = args.lift(3).map(_.toInt).getOrElse(4)
      classShuffle(args(2))
      def runArm(eager: Boolean, cold: Boolean): Double = {
        if (cold) spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        spark.conf.set("spark.graft.eagerTransient", eager.toString)
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        spark.conf.set("spark.graft.eagerTransient", "false")
        dt
      }
      noop(fn(spark, sfDir)) // JIT/codegen warm
      for (cold <- Seq(false, true)) {
        runArm(eager = false, cold) // posture warm
        val lazyT = collection.mutable.Buffer[Double]()
        val eagerT = collection.mutable.Buffer[Double]()
        (1 to passes).foreach { _ =>
          lazyT += runArm(eager = false, cold)
          eagerT += runArm(eager = true, cold)
        }
        val p = if (cold) "cold" else "warm"
        println(f"[eagerab] ${args(2)} $p%-4s lazy  min=${lazyT.min}%6.3f runs " +
          lazyT.map(v => f"$v%.3f").mkString(" "))
        println(f"[eagerab] ${args(2)} $p%-4s eager min=${eagerT.min}%6.3f runs " +
          eagerT.map(v => f"$v%.3f").mkString(" "))
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> kcacheab [passes]`: prices the r18
    // verdict/feature kernel promotion (qualityFeatures, gopherFeatures,
    // incrementalVerdicts, noveltyFrame, mediaVerdicts → sharedIndexIf).
    // Each rep runs the full CONSUMER BLOCK in bench pass posture
    // (clearCache at block start, clearTransient per query — exactly
    // runOnce's discipline), arms interleaved so load drift hits both:
    // off = every consumer re-runs the builds (pre-r18), on = first
    // consumer materializes, the rest ride the cache.
    if (args.length >= 2 && args(1) == "kcacheab") {
      val passes = args.lift(2).map(_.toInt).getOrElse(4)
      val block = Seq("q36_quality_score", "q82_dedup_keep_best",
        "q91_source_datasheet", "q95_incremental_dedup", "q100_gopher_rules",
        "q101_curation_funnel", "q108_corpus_release", "q113_source_caps",
        "q121_batch_novelty", "q123_batch_triage", "q127_incremental_media")
      def runBlock(on: Boolean): Seq[(String, Double)] = {
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        spark.conf.set("spark.graft.kernelCache", on.toString)
        val r = block.map { name =>
          graft.util.Caches.clearTransient()
          classShuffle(name)
          val t0 = System.nanoTime()
          noop(SparkEntry.queries(name)(spark, sfDir))
          name -> (System.nanoTime() - t0) / 1e9
        }
        spark.conf.set("spark.graft.kernelCache", "true")
        r
      }
      runBlock(on = false); runBlock(on = true) // JIT warm both arms
      val tot = collection.mutable.Map[Boolean, List[Double]]()
        .withDefaultValue(Nil)
      val per = collection.mutable.Map[(Boolean, String), List[Double]]()
        .withDefaultValue(Nil)
      for (_ <- 1 to passes; on <- Seq(false, true)) {
        val r = runBlock(on)
        tot(on) = r.map(_._2).sum :: tot(on)
        r.foreach { case (n, t) => per((on, n)) = t :: per((on, n)) }
      }
      for (on <- Seq(false, true))
        println(f"[kcacheab] block ${if (on) "on " else "off"} " +
          f"min=${tot(on).min}%7.3f runs " +
          tot(on).reverse.map(v => f"$v%.3f").mkString(" "))
      for (name <- block)
        println(f"[kcacheab] $name%-26s off=${per((false, name)).min}%6.3f " +
          f"on=${per((true, name)).min}%6.3f")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> kexactab [passes]`: prices the r19
    // exactHashes kernel promotion (q27 + q124's session a4 + the
    // incrementalVerdicts build shared one regex-strip+md5 corpus pass
    // per session instead of three). Arms toggle ONLY
    // spark.graft.exactKernel (the r18 kernels stay on in both), block
    // in bench pass posture — kcacheab's discipline.
    if (args.length >= 2 && args(1) == "kexactab") {
      val passes = args.lift(2).map(_.toInt).getOrElse(4)
      val block = Seq("q27_dedup_exact", "q95_incremental_dedup",
        "q123_batch_triage", "q124_index_stats")
      def runBlock(on: Boolean): Seq[(String, Double)] = {
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        spark.conf.set("spark.graft.exactKernel", on.toString)
        val r = block.map { name =>
          graft.util.Caches.clearTransient()
          classShuffle(name)
          val t0 = System.nanoTime()
          noop(SparkEntry.queries(name)(spark, sfDir))
          name -> (System.nanoTime() - t0) / 1e9
        }
        spark.conf.set("spark.graft.exactKernel", "true")
        r
      }
      runBlock(on = false); runBlock(on = true) // JIT warm both arms
      val tot = collection.mutable.Map[Boolean, List[Double]]()
        .withDefaultValue(Nil)
      val per = collection.mutable.Map[(Boolean, String), List[Double]]()
        .withDefaultValue(Nil)
      for (_ <- 1 to passes; on <- Seq(false, true)) {
        val r = runBlock(on)
        tot(on) = r.map(_._2).sum :: tot(on)
        r.foreach { case (n, t) => per((on, n)) = t :: per((on, n)) }
      }
      for (on <- Seq(false, true))
        println(f"[kexactab] block ${if (on) "on " else "off"} " +
          f"min=${tot(on).min}%7.3f runs " +
          tot(on).reverse.map(v => f"$v%.3f").mkString(" "))
      for (name <- block)
        println(f"[kexactab] $name%-26s off=${per((false, name)).min}%6.3f " +
          f"on=${per((true, name)).min}%6.3f")
      spark.stop()
      return
    }

    if (args.length >= 3 && args(1) == "rows") {
      classShuffle(args(2))
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(args(2))(spark, sfDir).count()
      println(f"[rows] ${args(2)} n=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()
      return
    }

    if (args.length >= 3 && args(1) == "time") {
      val fn = SparkEntry.queries(args(2))
      val passes = args.lift(3).map(_.toInt).getOrElse(5)
      classShuffle(args(2))
      noop(fn(spark, sfDir))
      val ts = (1 to passes).map { _ =>
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] ${args(2)} min ${ts.min}%.3f  runs ${ts.map(v => f"$v%.3f").mkString(" ")}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> fpappend <idxDir> <mod> <tag>`:
    // time ONE appendFingerprints of the doc_id % <mod> == 1 slice
    // under batch=<tag> — the O(delta) instrument for the stats tier
    // (append two batch sizes against the same standing index; cost
    // must follow the batch, not the index). Run against a THROWAWAY
    // index copy: the appended slice duplicates standing doc_ids, which
    // violates the healthy-index probe contract (timing only).
    if (args.length >= 5 && args(1) == "fpappend") {
      import org.apache.spark.sql.functions.col
      val batch = graft.util.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % args(3).toLong === 1)
      val t0 = System.nanoTime()
      graft.sink.Sink.appendFingerprints(batch, args(2), args(4))
      println(f"[fpappend] mod=${args(3)} tag=${args(4)} " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> mediacand`: the media band-join's
    // candidate volume — Σ c·(c−1)/2 over the (bk, bkey) bucket
    // occupancies (the exact pre-distinct collision count of the q125
    // self-join, the q124 candidate_pairs idea applied to the media
    // tier), plus the max bucket and the verified-pair count. The r15
    // re-band's acceptance instrument: 5×12-bit bands read 2.85e8 at
    // sf10; 5×24 should read ~10⁵.
    if (args.length >= 2 && args(1) == "mediacand") {
      import org.apache.spark.sql.functions._
      val fps = graft.queries.TrainingOps.mediaFps(spark, sfDir)
      val bands = fps.select(col("doc_id"), col("fp0"), col("fp1"),
          explode(sequence(lit(0), lit(graft.multimodal.Multimodal.MediaBands - 1))).as("bk"))
        .withColumn("bkey",
          expr(graft.multimodal.Multimodal.bandKeySql("fp0", "fp1")))
      val occ = bands.groupBy("bk", "bkey").agg(count(lit(1)).as("c"))
      val row = occ.agg(
        sum(col("c") * (col("c") - 1) / 2).cast("long").as("cand"),
        max("c").as("bucket_max"), count(lit(1)).as("buckets")).head
      val verified = SparkEntry.queries("q125_media_neardup")(spark, sfDir)
        .count()
      println(s"[mediacand] docs=${fps.count()} candidates=${row.getLong(0)} " +
        s"bucket_max=${row.getLong(1)} occupied_buckets=${row.getLong(2)} " +
        s"verified_pairs=$verified")
      // r16 SIZE-CLASS knob A/B (Multimodal.sizeClassesOf): the same
      // bands additionally keyed by the exploded size class — candidate
      // volume divides by the corpus's size spread; the verified pair
      // count must MATCH the plain banding (near-dups at hamming ≤ 4
      // have single-digit |Δn|, covered by the ±slack two-class
      // emission). Session-path fingerprints with an inline n — the
      // standing A/B instrument behind the production knob (r17:
      // Multimodal.SizeClassFlag; the persisted media table now carries
      // n_bytes and q131 reports candidate_pairs both ways).
      val minB = graft.multimodal.Multimodal.FingerprintMinBytes
      val fpn = graft.util.Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull && length(col("text")) >= minB)
        .select(col("doc_id"), length(col("text")).as("n"),
          graft.multimodal.Multimodal
            .fingerprint(col("text").cast("binary")).as("f"))
        .select(col("doc_id"), col("n"), col("f").getField("_1").as("fp0"),
          col("f").getField("_2").as("fp1"))
      val bandsSc = fpn.select(col("doc_id"), col("fp0"), col("fp1"),
          explode(graft.multimodal.Multimodal.sizeClassesOf(col("n")))
            .as("scls"))
        .select(col("doc_id"), col("fp0"), col("fp1"), col("scls"),
          explode(sequence(lit(0),
            lit(graft.multimodal.Multimodal.MediaBands - 1))).as("bk"))
        .withColumn("bkey",
          expr(graft.multimodal.Multimodal.bandKeySql("fp0", "fp1")))
      val occSc = bandsSc.groupBy("scls", "bk", "bkey")
        .agg(count(lit(1)).as("c"))
      val rowSc = occSc.agg(
        sum(col("c") * (col("c") - 1) / 2).cast("long").as("cand"),
        max("c").as("bucket_max"), count(lit(1)).as("buckets")).head
      val verifiedSc = bandsSc.as("a")
        .join(bandsSc.hint("shuffle_hash").as("b"),
          col("a.scls") === col("b.scls") && col("a.bk") === col("b.bk")
            && col("a.bkey") === col("b.bkey")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
          col("a.fp0").as("fpa0"), col("a.fp1").as("fpa1"),
          col("b.fp0").as("fpb0"), col("b.fp1").as("fpb1"))
        .distinct()
        .select(expr(graft.multimodal.Multimodal
          .hammingSql("fpa0", "fpa1", "fpb0", "fpb1")).cast("int")
          .as("hamming"))
        .filter(col("hamming") <= graft.multimodal.Multimodal.MediaBands - 1)
        .count()
      println(s"[mediacand] sizeclass candidates=${rowSc.getLong(0)} " +
        s"bucket_max=${rowSc.getLong(1)} occupied_buckets=${rowSc.getLong(2)} " +
        s"verified_pairs=$verifiedSc (recall ${
          if (verifiedSc == verified) "IDENTICAL" else s"DIVERGED vs $verified"})")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> kmvab [passes]`: stage isolation for
    // the q132 signature pipeline — times, over the SAME postings⋈source
    // input: (join) the join alone under a count, (native) a
    // native count aggregate per source, (kmv) the KmvSignature udaf per
    // source, (full) the whole q132. The deltas attribute cost to the
    // join, the aggregate machinery, and the pair stage respectively —
    // the instrument that settles where a q132 scale-tier number goes.
    if (args.length >= 2 && args(1) == "kmvab") {
      import org.apache.spark.sql.functions._
      val passes = args.lift(2).map(_.toInt).getOrElse(2)
      val src = graft.util.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"))
      def joined = graft.queries.TrainingOps.shinglePostings(spark, sfDir)
        .join(src.hint("shuffle_hash"), "doc_id")
      val kmvAgg = udaf(new graft.functions.KmvSignature(256))
      val arms: Seq[(String, () => Unit)] = Seq(
        "join" -> (() => noop(joined.groupBy("doc_id").agg(count(lit(1))))),
        "native" -> (() => noop(joined.groupBy("source")
          .agg(count(lit(1)).as("n")))),
        "kmv" -> (() => noop(joined.groupBy("source")
          .agg(kmvAgg(col("h1")).as("sig")))),
        "full" -> (() => noop(
          SparkEntry.queries("q132_source_overlap_sketch")(spark, sfDir))))
      // interleaved (the seamab discipline): every arm sees the same
      // window drift; min-of-passes per arm
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      for (_ <- 1 to passes; (name, arm) <- arms) {
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        val t0 = System.nanoTime()
        arm()
        times(name) = ((System.nanoTime() - t0) / 1e9) :: times(name)
      }
      for ((name, _) <- arms)
        println(f"[kmvab] $name%-6s min=${times(name).min}%7.3f runs " +
          times(name).reverse.map(v => f"$v%.3f").mkString(" "))
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> kmvscale [grains...]`: the q132
    // fine-grained-provenance question (r16, the r15 watch item) — at
    // |S| sources, is the |S|²/2 broadcast-NL pair stage still the
    // right shape, and where does the banded stage (q134's
    // kmvPairsBanded — candidates from joining exploded signatures on
    // the element) cross over? Synthesizes |S| by refining source to
    // source#(doc_id % grain), prints actual |S|, output pairs, and
    // warmed min-of-2 for both stages off the SAME persisted signature
    // frame (pair-stage isolation — the signature build is priced by
    // kmvab). Numbers go to BASELINE.md r16.
    if (args.length >= 2 && args(1) == "kmvscale") {
      // a grain suffixed `:b` measures the banded stage only — the NL
      // stage at |S| ≥ ~5·10³ is 10⁷+ pair evaluations (the measured
      // per-pair estimator cost × |S|²/2), i.e. the REJECTION the tier
      // table documents, not a number worth hours of wall-clock
      val grains: Seq[(Int, Boolean)] =
        (if (args.length > 2) args.drop(2).toSeq else Seq("5", "50", "500"))
          .map { a =>
            if (a.endsWith(":b")) (a.dropRight(2).toInt, false)
            else (a.toInt, true)
          }
      for ((g, withNl) <- grains) {
        val sigs = graft.queries.AuditOps
          .kmvSigs(spark, sfDir, Some(g)).persist()
        val nS = sigs.count()
        def t(f: => Unit): Double = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
        if (withNl) noop(graft.queries.AuditOps.kmvPairsNL(sigs)) // warm
        noop(graft.queries.AuditOps.kmvPairsBanded(sigs))
        val tNl =
          if (withNl) t(noop(graft.queries.AuditOps.kmvPairsNL(sigs)))
          else -1.0
        val tBd = t(noop(graft.queries.AuditOps.kmvPairsBanded(sigs)))
        val nPairs = graft.queries.AuditOps.kmvPairsBanded(sigs).count()
        // what the r17 front door would pick here (it logs its own
        // statistics line) — the dispatch's observed choice beside the
        // measured stage times it is supposed to reproduce
        noop(graft.queries.AuditOps.kmvPairs(sigs))
        println(f"[kmvscale] grain=$g%-5d |S|=$nS%-6d out_pairs=$nPairs%-9d " +
          f"nl_s=$tNl%7.3f banded_s=$tBd%7.3f")
        sigs.unpersist()
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> seamab <query> <vecIdx|-> <fpIdx|->
    // [passes]`: INTERLEAVED session-kernel vs index-riding A/B in ONE
    // JVM — the shufab discipline applied to the seam question.
    // Back-to-back 64g JVM timings swing 3–6× with writeback/page-cache
    // residue (the r13c lesson), so separate-process seam comparisons
    // measure the window, not the seam; alternating the postures
    // pass-by-pass subjects both to identical drift. `-` skips an index
    // (arm B sets only the given seams). Index dirs are passed as args
    // and applied via session conf — the env-var fallback would leak
    // the seam into the kernel arm.
    if (args.length >= 5 && args(1) == "seamab") {
      // the kernel arm only UNSETS the session confs, but fpIndexDir /
      // vecIndexDir fall back to these env vars — launched with either
      // set, the "kernel" arm would silently ride the seam and the A/B
      // would compare seam vs seam. Fail fast instead (r15 ADVICE).
      for (v <- Seq("SPARK_GRAFT_FP_INDEX", "SPARK_GRAFT_VEC_INDEX"))
        require(!sys.env.get(v).exists(_.nonEmpty),
          s"seamab: unset $v — the env fallback would leak the seam " +
            "into the kernel arm")
      val fn = SparkEntry.queries(args(2))
      val vecIdx = Option(args(3)).filter(_ != "-")
      val fpIdx = Option(args(4)).filter(_ != "-")
      val passes = args.lift(5).map(_.toInt).getOrElse(3)
      classShuffle(args(2))
      def once(seam: Boolean): Double = {
        if (seam) {
          vecIdx.foreach(spark.conf.set("spark.graft.vecIndex", _))
          fpIdx.foreach(spark.conf.set("spark.graft.fpIndex", _))
        } else {
          spark.conf.unset("spark.graft.vecIndex")
          spark.conf.unset("spark.graft.fpIndex")
        }
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      once(false); once(true) // warm both arms (JIT, codegen, footers)
      val timed = (1 to passes).map(_ => (once(false), once(true)))
      val (ks, is) = timed.unzip
      println(f"[seamab] ${args(2)} kernel min ${ks.min}%.3f  " +
        s"runs ${ks.map(v => f"$v%.3f").mkString(" ")}")
      println(f"[seamab] ${args(2)} seam   min ${is.min}%.3f  " +
        s"runs ${is.map(v => f"$v%.3f").mkString(" ")}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> aqe <query> [passes]`: the AQE
    // diagnosis harness — warmed min-of-N timing like `time`, then the
    // POST-EXECUTION adaptive plan's shuffle-read lines (AQEShuffleRead
    // prints the runtime-coalesced partition count), so a coalescing
    // decision can be SEEN, not inferred from timing. Combine with
    // SPARK_GRAFT_AQE=true, SPARK_GRAFT_SHUFFLE, SPARK_GRAFT_AQE_ADVISORY.
    if (args.length >= 3 && args(1) == "aqe") {
      val fn = SparkEntry.queries(args(2))
      val passes = args.lift(3).map(_.toInt).getOrElse(2)
      // skew-join knobs (r14 — the q119 hot-gram demonstration): the
      // default 256 MB skewedPartitionThresholdInBytes is cluster-sized;
      // demonstrating the split on a local fixture needs it lowered to
      // the fixture's hot-partition scale. Runtime-settable confs, so
      // env knobs here rather than builder flags.
      sys.env.get("SPARK_GRAFT_SKEW_ENABLED").foreach(v =>
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", v))
      sys.env.get("SPARK_GRAFT_SKEW_THRESHOLD").foreach(v =>
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", v))
      sys.env.get("SPARK_GRAFT_SKEW_FACTOR").foreach(v =>
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", v))
      // the builder pins preferSortMergeJoin=false (bench posture); the
      // skew question is usually asked about the cluster posture where
      // SMJ is the default — runtime-settable, so an env knob
      sys.env.get("SPARK_GRAFT_PREFER_SMJ").foreach(v =>
        spark.conf.set("spark.sql.join.preferSortMergeJoin", v))
      // THE gate for skew-split inside the shared kernels (r14 finding):
      // the dedup kernels are sharedIndex-CACHED, and by default Spark
      // disables AQE's partitioning-changing rules (coalescing AND
      // skew-join splitting) while materializing a cached plan, so a
      // skewed exchange inside a cached kernel is NEVER split unless
      // this conf is on. See the BASELINE.md r14 skew paragraph.
      sys.env.get("SPARK_GRAFT_CACHED_REPARTITION").foreach(v =>
        spark.conf.set(
          "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", v))
      noop(fn(spark, sfDir))
      val ts = (1 to passes).map { _ =>
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val df = fn(spark, sfDir)
      noop(df)
      val executed = df.queryExecution.executedPlan
      executed.toString.linesIterator
        .map(_.trim)
        .filter(l => l.contains("AQEShuffleRead") || l.contains("Exchange")
          || l.contains("ShuffleQueryStage") || l.contains("Join"))
        .foreach(l => println(s"[aqe-plan] $l"))
      // the coalesced partition COUNTS (toString omits them): every
      // AQEShuffleRead in the final adaptive tree, its output partition
      // count vs the exchange it reads
      def reads(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p.foreach {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            if (a.executedPlan ne p) reads(a.executedPlan)
          case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
            // skew-splits are PartialReducerPartitionSpec entries: one
            // reducer's data split across several tasks — the direct
            // evidence the skew handler ENGAGED on this exchange
            val skewSplits = r.partitionSpecs.count(
              _.isInstanceOf[org.apache.spark.sql.execution.PartialReducerPartitionSpec])
            println(s"[aqe-read] ${r.partitionSpecs.size} partitions " +
              s"(skew-split specs $skewSplits) <- " +
              r.child.toString.linesIterator.next().trim)
          case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
            // what the skew detector sees: per-reduce-partition bytes
            // of this exchange (max vs median decides the split)
            q.mapStats.foreach { st =>
              val sz = st.bytesByPartitionId.sorted
              if (sz.nonEmpty)
                println(s"[aqe-stage] ${q.id} max=${sz.last} " +
                  s"p50=${sz(sz.length / 2)} parts=${sz.length} <- " +
                  q.plan.toString.linesIterator.next().trim)
            }
            reads(q.plan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            reads(q.plan)
          case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            reads(i.relation.cachedPlan)
          case _ =>
        }
      }
      reads(executed)
      println(f"[aqe] ${args(2)} shuffle=${spark.conf.get("spark.sql.shuffle.partitions")} " +
        f"aqe=${spark.conf.get("spark.sql.adaptive.enabled")} " +
        f"advisory=${spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")} " +
        f"min ${ts.min}%.3f  runs ${ts.map(v => f"$v%.3f").mkString(" ")}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> compaction [nBatches] [compactEvery]`:
    // the X91 end-to-end cadence measurement — a standing index serves
    // probes while micro-batches accumulate under batch=<tag>
    // partitions; without compaction every probe pays the
    // ever-growing file count (the small-files failure), with
    // compaction every `compactEvery` batches the probe latency should
    // stay ~flat. Two arms over identical batches; per-checkpoint probe
    // latency (min-of-2) + on-disk file counts printed per arm, one
    // summary line at the end for BASELINE.md.
    if (args.length >= 2 && args(1) == "compaction") {
      import org.apache.spark.sql.functions.{col, expr}
      val nBatches = args.lift(2).map(_.toInt).getOrElse(40)
      val every = args.lift(3).map(_.toInt).getOrElse(10)
      val docs = graft.util.Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull).select("doc_id", "text")
      val standing = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 5 === 0)
      // a FIXED probe batch: constant probe-side work, so the latency
      // curve isolates the index-side file count
      val probe = incoming.filter(col("doc_id") % 7 === 0)
      def files(dir: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory)
            Option(f.listFiles).map(_.map(walk).sum).getOrElse(0)
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(dir))
      }
      def probeSec(dir: String): Double = (1 to 2).map { _ =>
        spark.sqlContext.clearCache()
        val t0 = System.nanoTime()
        noop(graft.sink.Sink.probeFingerprints(probe, dir))
        (System.nanoTime() - t0) / 1e9
      }.min
      def arm(compact: Boolean): Seq[(Int, Int, Double)] = {
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-compact-$compact").toString + "/idx"
        graft.sink.Sink.writeFingerprints(standing, dir)
        val out = scala.collection.mutable.ArrayBuffer(
          (0, files(dir), probeSec(dir)))
        for (i <- 1 to nBatches) {
          // slice on doc_id div 5 (INTEGER division — `/` is double
          // division in Spark and loses exactness past ~2^53·5, silently
          // mis-slicing huge ids): `incoming` is already doc_id % 5 === 0,
          // so slicing by doc_id % nBatches would leave every batch
          // whose residue isn't a multiple of 5 EMPTY (32 of 40 at the
          // default) and understate the small-files growth ~5x
          graft.sink.Sink.appendFingerprints(
            incoming.filter(expr("doc_id div 5") % nBatches === (i - 1)),
            dir, s"b$i")
          if (compact && i % every == 0)
            graft.sink.Sink.compactFingerprints(spark, dir)
          if (i % every == 0) {
            val row = (i, files(dir), probeSec(dir))
            out += row
            println(s"[compaction] compact=$compact batches=${row._1} " +
              f"files=${row._2} probe_s=${row._3}%.3f")
          }
        }
        out.toSeq
      }
      val un = arm(compact = false)
      val co = arm(compact = true)
      def fmt(xs: Seq[(Int, Int, Double)]) = xs.map { case (b, f, s) =>
        f"""{"batches":$b,"files":$f,"probe_s":$s%.3f}"""
      }.mkString("[", ",", "]")
      println(s"""{"metric":"compaction_cadence","n_batches":$nBatches,""" +
        s""""compact_every":$every,"uncompacted":${fmt(un)},""" +
        s""""compacted":${fmt(co)}}""")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> takedowncost [ns...]`: the X91
    // treatment for the takedown tier (r16) — the three asserted-but-
    // unmeasured numbers, measured:
    //  (a) q124's stats STAND-DOWN penalty while tombstones exist (the
    //      fpStatsDir gate: stats fast path → tombstone-filtered raw
    //      accessors → healed after the fold);
    //  (b) probe latency under N accumulated tombstone batches — each
    //      probe pays a deleted/ read + anti-join per batch count
    //      (flat-vs-degrading is the production cadence question: N
    //      grows until a fold);
    //  (c) the fold's marginal cost over a plain compaction of an
    //      identical index (single-shot by nature — a fold clears its
    //      own input; the comparator index is built identically).
    // Numbers go to the BASELINE.md r16 cadence table.
    if (args.length >= 2 && args(1) == "takedowncost") {
      import org.apache.spark.sql.functions.col
      val ns = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(1, 4, 16, 64)
      val docs = graft.util.Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull).select("doc_id", "text")
      val emb = graft.util.Tables.embeddings(spark, sfDir)
      val probe = docs.filter(col("doc_id") % 35 === 0)
      val probeEmb = emb.filter(col("vec_id") % 35 === 0)
      val tmp = java.nio.file.Files.createTempDirectory("graft-tdcost").toString
      val fpDir = s"$tmp/fp"; val fpDir2 = s"$tmp/fp2"
      val vecDir = s"$tmp/vec"; val vecDir2 = s"$tmp/vec2"
      graft.sink.Sink.writeFingerprints(docs, fpDir)
      graft.sink.Sink.writeFingerprints(docs, fpDir2)
      graft.sink.Sink.writeVectorIndex(emb, vecDir)
      graft.sink.Sink.writeVectorIndex(emb, vecDir2)
      def timed(f: => Unit): Double = (1 to 3).map { _ =>
        spark.sqlContext.clearCache(); graft.util.Caches.clearTransient()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      // (a) stats path / stand-down / healed
      spark.conf.set("spark.graft.fpIndex", fpDir)
      val q124 = SparkEntry.queries("q124_index_stats")
      noop(q124(spark, sfDir)) // warm
      val statsS = timed(noop(q124(spark, sfDir)))
      graft.sink.Sink.deleteFingerprints(
        docs.filter(col("doc_id") % 997 === 0).select("doc_id"), fpDir, "sd")
      val downS = timed(noop(q124(spark, sfDir)))
      graft.sink.Sink.compactFingerprints(spark, fpDir)
      val healS = timed(noop(q124(spark, sfDir)))
      spark.conf.unset("spark.graft.fpIndex")
      println(f"[takedowncost] q124 stats=$statsS%.3f standdown=$downS%.3f " +
        f"healed=$healS%.3f")
      // (b) probe latency vs accumulated batches (request-sized slices)
      def probeRow(n: Int): Unit = {
        val fpS = timed(noop(graft.sink.Sink.probeFingerprints(probe, fpDir)))
        val mdS = timed(noop(graft.sink.Sink.probeMediaNearDup(probe, fpDir)))
        val nvS = timed(noop(graft.sink.Sink.probeNovelty(probe, fpDir)))
        val vcS = timed(noop(
          graft.sink.Sink.probeVectorIndex(probeEmb, vecDir)))
        println(f"[takedowncost] n_batches=$n%-3d probe_fp=$fpS%.3f " +
          f"probe_media=$mdS%.3f probe_novelty=$nvS%.3f probe_vec=$vcS%.3f")
      }
      probeRow(0)
      var landed = 0
      for (n <- ns) {
        while (landed < n) {
          graft.sink.Sink.deleteFingerprints(
            docs.filter(col("doc_id") % 4099 === landed).select("doc_id")
              .limit(64), fpDir, s"n$landed")
          graft.sink.Sink.deleteVectors(
            emb.filter(col("vec_id") % 4099 === landed)
              .select(col("vec_id")).limit(64), vecDir, s"n$landed")
          landed += 1
        }
        probeRow(n)
      }
      // (c) fold-with-tombstones vs plain compaction, both indexes
      def once(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val foldFp = once(graft.sink.Sink.compactFingerprints(spark, fpDir))
      val plainFp = once(graft.sink.Sink.compactFingerprints(spark, fpDir2))
      val foldVec = once(graft.sink.Sink.compactVectorIndex(spark, vecDir))
      val plainVec = once(graft.sink.Sink.compactVectorIndex(spark, vecDir2))
      println(f"[takedowncost] fold_fp=$foldFp%.3f plain_fp=$plainFp%.3f " +
        f"fold_vec=$foldVec%.3f plain_vec=$plainVec%.3f (n_batches=$landed)")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> pairanti`: A/B the pair-region
    // tombstone anti-join SHAPE (r17 ask #3 — the vector fold's +8.9 s
    // marginal at sf10 anti-joins BOTH endpoint columns). Three
    // postures over one freshly built index + one request-sized
    // tombstone batch, interleaved (the seamab window discipline),
    // read-path only (pairs → anti → noop; the fold adds the same
    // filtered volume to a write):
    //  (a) chained  — two left_anti joins, the tombstone frame built
    //      per join (the shipping r16 form);
    //  (b) chained1 — the same two hash probes but ONE tombstone
    //      materialization (persist + explicit broadcast);
    //  (c) orbnlj   — single left_anti on (ida=t OR idb=t): one join
    //      but OR-equi disables hash probing → BroadcastNestedLoop,
    //      O(|t|) comparisons per pair row — the shape the ask names,
    //      measured before it is believed.
    if (args.length >= 2 && args(1) == "pairanti") {
      import org.apache.spark.sql.functions.{broadcast, col}
      val tombMod = if (args.length > 2) args(2).toLong else 997L
      val emb = graft.util.Tables.embeddings(spark, sfDir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-pa").toString
      val vecDir = s"$tmp/vec"
      graft.sink.Sink.writeVectorIndex(emb, vecDir)
      graft.sink.Sink.deleteVectors(
        emb.filter(col("vec_id") % tombMod === 0).select("vec_id"), vecDir,
        "ab")
      def pairs() = spark.read.parquet(s"$vecDir/pairs").drop("batch")
      def tomb() = spark.read.parquet(s"$vecDir/deleted")
        .select(col("vec_id")).distinct()
      def chained(): Unit = noop(
        Seq("ida", "idb").foldLeft(pairs())((acc, c) =>
          acc.join(tomb().select(col("vec_id").as(c)), Seq(c), "left_anti")))
      def chained1(): Unit = {
        val t = tomb().persist()
        try {
          t.count()
          noop(Seq("ida", "idb").foldLeft(pairs())((acc, c) =>
            acc.join(broadcast(t.select(col("vec_id").as(c))), Seq(c),
              "left_anti")))
        } finally { t.unpersist(); () }
      }
      def orbnlj(): Unit = {
        val p = pairs()
        val t = broadcast(tomb().select(col("vec_id").as("__ts")))
        noop(p.join(t,
          p("ida") === t("__ts") || p("idb") === t("__ts"), "left_anti"))
      }
      val arms = Seq("chained" -> (() => chained()),
        "chained1" -> (() => chained1()), "orbnlj" -> (() => orbnlj()))
      arms.foreach(_._2()) // warm
      val times = (1 to 3).map { _ =>
        arms.map { case (n, f) =>
          spark.sqlContext.clearCache(); graft.util.Caches.clearTransient()
          val t0 = System.nanoTime(); f(); n -> (System.nanoTime() - t0) / 1e9
        }.toMap
      }
      val nPairs = pairs().count(); val nTomb = tomb().count()
      arms.foreach { case (n, _) =>
        println(f"[pairanti] $n%-8s min=${times.map(_(n)).min}%.3f " +
          f"(pairs=$nPairs tomb=$nTomb)")
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> sharddown [ms...]`: price
    // [[graft.sink.Sink.takedownShards]] against the affected-shard
    // count (r17 ask #1 — the BASELINE row). A 64-shard text-carrying
    // release artifact is built FRESH per arm (takedowns mutate it);
    // each arm lands a request-sized takedown touching exactly m shards
    // (8 docs per affected shard) and reports the rewrite seconds plus
    // the report's own row counts — the claim under test is that cost
    // scales with the shards a request LANDS IN, not the release size.
    // A replay row prices the idempotent no-op floor (semi-join + the
    // affected-shard scan, no writes).
    if (args.length >= 2 && args(1) == "sharddown") {
      import org.apache.spark.sql.functions.{col, concat, lit, row_number}
      val ms = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
        else Seq(1, 4, 16, 64)
      val nShards = 64
      val docs = graft.util.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("n_chars"))
      val keyed = docs.withColumn("k", graft.functions.Hashing.md5Long(
          concat(lit("shard:"), col("doc_id").cast("string"))))
        .withColumn("shard", (col("k") % nShards.toLong).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy(col("k").asc, col("doc_id").asc)
      val layout = keyed
        .select(col("doc_id"), col("text"), col("n_chars"), col("shard"),
          (row_number().over(w) - 1).cast("long").as("pos"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sd").toString
      def once(f: => Unit): Double = {
        spark.sqlContext.clearCache(); graft.util.Caches.clearTransient()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      for (m <- ms) {
        val dir = s"$tmp/shards$m"
        graft.sink.Sink.writeShards(layout, dir, nShards)
        val ids = layout
          .filter(col("shard") < m && col("pos") < 8).select("doc_id")
        var rep: Map[String, Long] = Map.empty
        val tdS = once {
          rep = graft.sink.Sink.takedownShards(ids, dir)
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        }
        val replayS = once {
          graft.sink.Sink.takedownShards(ids, dir).collect(): Unit
        }
        println(f"[sharddown] m=$m%-3d takedown=$tdS%.3f replay=$replayS%.3f " +
          f"rows_removed=${rep("rows_removed")}%-6d " +
          f"rows_rewritten=${rep("rows_rewritten")}%-8d " +
          f"shards_rewritten=${rep("shards_rewritten")}")
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> triageab [nBatches]`: the streaming
    // TRIAGE tier's marginal cost (r14 ask #7) — the X107 claim is that
    // with `triagePath` set each micro-batch lands its q123 sign-off
    // page off the SAME persisted verdict frame (the probe is never
    // paid twice), so the marginal cost is probeNovelty + the quality
    // kernel + one batch-sized aggregation + one small parquet write.
    // Drives the REAL incrementalDedup flow twice in one JVM (fresh
    // index/checkpoint dirs per arm, identical batch slices), reports
    // per-micro-batch seconds. MemoryStream feeds driver-local slices —
    // the instrument, not the engine; batch volumes are the sfDir's
    // incoming slices.
    if (args.length >= 2 && args(1) == "triageab") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val nBatches = args.lift(2).map(_.toInt).getOrElse(8)
      val docs = graft.util.Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull).select("doc_id", "text")
      val standing = docs.filter(col("doc_id") % 5 =!= 0)
      val slices: Seq[Seq[(Long, String)]] = (0 until nBatches).map(i =>
        docs.filter(col("doc_id") % 5 === 0)
          .filter(expr("doc_id div 5") % nBatches === i)
          .as[(Long, String)].collect().toSeq)
      def arm(triage: Boolean): Seq[Double] = {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"graft-triageab-$triage").toString
        graft.sink.Sink.writeFingerprints(standing, s"$tmp/idx")
        val in = MemoryStream[(Long, String)]
        val q = graft.streaming.Streaming.incrementalDedup(
          in.toDF().toDF("doc_id", "text"), s"$tmp/idx", s"$tmp/out",
          s"$tmp/ck",
          triagePath = if (triage) Some(s"$tmp/triage") else None)
        try slices.map { s0 =>
          in.addData(s0)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        } finally q.stop()
      }
      val off = arm(triage = false)
      val on = arm(triage = true)
      def fmt(xs: Seq[Double]) = xs.map(v => f"$v%.3f").mkString(" ")
      val medOff = off.sorted.apply(off.size / 2)
      val medOn = on.sorted.apply(on.size / 2)
      println(f"[triageab] triage=off median $medOff%.3f  runs ${fmt(off)}")
      println(f"[triageab] triage=on  median $medOn%.3f  runs ${fmt(on)}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> family <q1> <q2> ...`: one BENCH
    // pass over a query family — caches cleared ONCE at the pass
    // boundary, then the queries run in order, so a shared index
    // (Caches.sharedIndex) is built by the first consumer and ridden by
    // the rest, exactly Bench's per-pass accounting. Reports per-query
    // and family-total seconds, min over 3 passes (each pass re-pays the
    // build — the honest floor).
    if (args.length >= 3 && args(1) == "family") {
      val names = args.drop(2).toSeq
      names.foreach { n => // warm
        classShuffle(n); noop(SparkEntry.queries(n)(spark, sfDir))
      }
      val passes = (1 to 3).map { _ =>
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        names.map { n =>
          classShuffle(n)
          val t0 = System.nanoTime()
          noop(SparkEntry.queries(n)(spark, sfDir))
          n -> (System.nanoTime() - t0) / 1e9
        }
      }
      val best = names.map(n => n -> passes.map(_.toMap.apply(n)).min)
      println(f"[family] total=${best.map(_._2).sum}%6.3f  " +
        best.map { case (q, t) => f"${q.takeWhile(_ != '_')}=$t%5.3f" }.mkString(" "))
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> q40ab`: the built-in session_window
    // aggregation vs the gaps-and-islands window form (one user_id
    // exchange; lag + running-sum ride ONE in-partition sort; the
    // (user_id, sid) aggregate rides the same user_id partitioning) —
    // same result set, pinned by sorted-collect equality here.
    if (args.length >= 2 && args(1) == "q40ab") {
      import org.apache.spark.sql.functions._
      // the BUILT-IN session_window baseline is constructed inline:
      // registry q40 IS the islands form since r11, so reading it here
      // would compare the rewrite against itself
      def builtin = graft.util.Tables.events(spark, sfDir)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          graft.functions.Hashing.decSum(col("value")).as("sum_value"))
        .select(col("user_id"), col("sw.start").as("sess_start"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "sess_start")
      def islands = SparkEntry.queries("q40_session_window")(spark, sfDir)
      val a = builtin.collect().map(_.toString).toSeq
      val b = islands.collect().map(_.toString).toSeq
      println(s"[q40ab] results equal: ${a == b} (${a.size} rows)")
      noop(builtin); noop(islands) // warm
      def best(mk: => org.apache.spark.sql.DataFrame): Double =
        (1 to 5).map { _ =>
          spark.sqlContext.clearCache()
          val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
        }.min
      println(f"[q40ab] session_window ${best(builtin)}%.3f  " +
        f"islands ${best(islands)}%.3f")
      islands.explain("formatted")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> q96parts`: where does q96's ~2 s go?
    // Times each prefix of the pipeline (index warm) so the expensive
    // stage names itself.
    if (args.length >= 2 && args(1) == "q96parts") {
      import org.apache.spark.sql.functions._
      val d = sfDir
      // warm the shared index like a bench pass would
      noop(SparkEntry.queries("q29_lsh_neardup")(spark, d))
      def t(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        val ts = (1 to 3).map { _ =>
          graft.util.Caches.clearTransient()
          val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
        }
        println(f"[q96parts] $label%-12s min=${ts.min}%5.3f  runs " +
          ts.map(v => f"$v%.3f").mkString(" "))
      }
      val src = graft.util.Tables.documents(spark, d)
        .select(col("doc_id"), col("source"))
      def idx = graft.queries.TrainingOps.shingleIndex(spark, d)
        .select(col("doc_id"), col("h1"))
      t("index")(idx)
      t("join")(idx.join(src.hint("shuffle_hash"), "doc_id"))
      t("collect_set")(idx.join(src.hint("shuffle_hash"), "doc_id")
        .groupBy("h1").agg(array_sort(collect_set(col("source"))).as("srcs")))
      t("rollup")(idx.join(src.hint("shuffle_hash"), "doc_id")
        .groupBy("h1").agg(array_sort(collect_set(col("source"))).as("srcs"))
        .groupBy("srcs").agg(count(lit(1)).as("w")))
      t("full")(SparkEntry.queries("q96_source_overlap")(spark, d))
      // the family/bench posture: cache cleared per pass, shingle index
      // rebuilt (untimed, as q29 pays it in a bench pass), THEN q96
      def tp(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        val ts = (1 to 3).map { _ =>
          spark.sqlContext.clearCache()
          graft.util.Caches.clearTransient()
          noop(SparkEntry.queries("q29_lsh_neardup")(spark, d)) // untimed warm
          val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
        }
        println(f"[q96parts] $label%-12s min=${ts.min}%5.3f  runs " +
          ts.map(v => f"$v%.3f").mkString(" "))
      }
      tp("full-pass")(SparkEntry.queries("q96_source_overlap")(spark, d))
      tp("cs-pass")(idx.join(src.hint("shuffle_hash"), "doc_id")
        .groupBy("h1").agg(array_sort(collect_set(col("source"))).as("srcs")))
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> q96ab`: bitmap vs collect_set form,
    // interleaved reps in pass posture (index rebuilt untimed each rep) —
    // the q53ab discipline, so a load drift hits both arms.
    if (args.length >= 2 && args(1) == "q96ab") {
      import org.apache.spark.sql.functions._
      val d = sfDir
      val src = graft.util.Tables.documents(spark, d)
        .select(col("doc_id"), col("source"))
      def idx = graft.queries.TrainingOps.shingleIndex(spark, d)
        .select(col("doc_id"), col("h1"))
      // the full shipping query (collect_set form)
      def a() = SparkEntry.queries("q96_source_overlap")(spark, d)
      // the REJECTED bitmap variant (dictionary-encoded bit_or masks),
      // full to the same output — measured a dead heat with the shipping
      // form (1.69 vs 1.64 s min at sf0.1), so the simpler form ships
      def b() = {
        val dict = src.select("source").distinct()
          .collect().map(_.getString(0)).sorted
        val nw = (dict.length + 63) / 64
        val idxOf = dict.zipWithIndex.toMap
        val masks = (0 until nw).map(c =>
          expr(s"bit_or(CASE WHEN si DIV 64 = $c " +
            s"THEN shiftleft(1L, CAST(si % 64 AS INT)) ELSE 0L END)")
            .as(s"mk$c"))
        val decode = udf((ms: Seq[Long]) =>
          dict.indices.filter(i => ((ms(i / 64) >> (i % 64)) & 1L) == 1L)
            .map(dict))
        val bySet = graft.util.Caches.transientPersist(
          idx.join(src.hint("shuffle_hash"), "doc_id")
            .select(col("h1"),
              element_at(typedLit(idxOf), col("source")).as("si"))
            .groupBy("h1").agg(masks.head, masks.tail: _*)
            .groupBy((0 until nw).map(c => col(s"mk$c")): _*)
            .agg(count(lit(1)).as("w"))
            .select(decode(array((0 until nw).map(c => col(s"mk$c")): _*))
              .as("srcs"), col("w")))
        val sz = bySet.select(explode(col("srcs")).as("source"), col("w"))
          .groupBy("source").agg(sum("w").as("n"))
        val pairs = bySet
          .select(explode(col("srcs")).as("sa"), col("srcs"), col("w"))
          .select(col("sa"), explode(col("srcs")).as("sb"), col("w"))
          .filter(col("sa") < col("sb"))
          .groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
          .agg(sum("w").as("shared"))
        pairs
          .join(broadcast(sz.select(col("source").as("source_a"), col("n").as("na"))), "source_a")
          .join(broadcast(sz.select(col("source").as("source_b"), col("n").as("nb"))), "source_b")
          .select(col("source_a"), col("source_b"), col("shared"),
            (col("shared").cast("double") /
              (col("na") + col("nb") - col("shared")).cast("double")).as("jacc"))
          .orderBy("source_a", "source_b")
      }
      def rep(mk: () => org.apache.spark.sql.DataFrame): Double = {
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        noop(SparkEntry.queries("q29_lsh_neardup")(spark, d)) // untimed warm
        val t0 = System.nanoTime(); noop(mk()); (System.nanoTime() - t0) / 1e9
      }
      rep(a); rep(() => b()) // warm both
      val as = collection.mutable.Buffer[Double]()
      val bs = collection.mutable.Buffer[Double]()
      (1 to 5).foreach { _ => as += rep(a); bs += rep(() => b()) }
      println(f"[q96ab] bitmap  min=${as.min}%5.3f runs " + as.map(v => f"$v%.3f").mkString(" "))
      println(f"[q96ab] colset  min=${bs.min}%5.3f runs " + bs.map(v => f"$v%.3f").mkString(" "))
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> q53ab`: is q53's r7→r8 bench drift
    // (0.53 → 0.68 s) a table-cache interaction or co-tenant noise?
    // Clean A/B: 5 warmed passes per posture, postures interleaved in
    // two segments each so a load drift during the run hits both arms.
    if (args.length >= 2 && args(1) == "q53ab") {
      val fn = SparkEntry.queries("q53_rollup")
      def seg(cache: Boolean): Seq[Double] = {
        spark.sqlContext.clearCache()
        graft.util.Caches.clearTransient()
        if (cache) spark.conf.set("spark.graft.cacheTables", "true")
        else spark.conf.set("spark.graft.cacheTables", "false")
        noop(fn(spark, sfDir)) // warm: storage, codegen, (maybe) cache build
        (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          noop(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
      }
      val a1 = seg(cache = false); val b1 = seg(cache = true)
      val a2 = seg(cache = false); val b2 = seg(cache = true)
      def s(x: Seq[Double]) = x.map(v => f"$v%.3f").mkString(" ")
      println(f"[q53ab] uncached  min ${(a1 ++ a2).min}%.3f  runs: ${s(a1)} | ${s(a2)}")
      println(f"[q53ab] cached    min ${(b1 ++ b2).min}%.3f  runs: ${s(b1)} | ${s(b2)}")
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> lightfan`: is the fanOut exchange a
    // net win for LIGHT per-row kernels (one md5 / a couple of regexes
    // per row), or only for the heavy shingle/JSON pipelines it was
    // measured on?
    if (args.length >= 2 && args(1) == "lightfan") {
      import org.apache.spark.sql.functions._
      val docs = graft.util.Tables.documents(spark, sfDir)
      def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save()
        val times = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[lightfan] $label%-40s ${times.min}%6.3f s")
      }
      def q70body(base: org.apache.spark.sql.DataFrame) = {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 \\t\\n\\x0B\\f\\r]", ""),
          "[ \\t\\n\\x0B\\f\\r]+", " "))
        base.filter(col("text").isNotNull)
          .select(col("doc_id"), md5(norm).as("norm_hash"))
          .groupBy("norm_hash")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_doc"))
          .orderBy("norm_hash")
      }
      t("q70-shape, fanOut")(q70body(
        graft.util.Tables.fanOut(docs.select(col("doc_id"), col("text")))))
      t("q70-shape, scan as-is")(q70body(docs.select(col("doc_id"), col("text"))))
      def q77body(base: org.apache.spark.sql.DataFrame) = {
        val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
        base.select(col("doc_id"), regexp_count(col("text"), lit(email)).as("n"))
          .orderBy("doc_id")
      }
      t("q77-lite, fanOut")(q77body(
        graft.util.Tables.fanOut(docs.select(col("doc_id"), col("text")))))
      t("q77-lite, scan as-is")(q77body(docs.select(col("doc_id"), col("text"))))
      def q77full(base: org.apache.spark.sql.DataFrame) =
        SparkEntry.queries("q77_pii_scrub")(spark, sfDir) // fanned form
      t("q77-full, fanOut (current)")(q77full(null))
      def q74body(base: org.apache.spark.sql.DataFrame) = base
        .filter(col("text").isNotNull)
        .select(size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
          .cast("bigint").as("n_tok"))
        .selectExpr("least(n_tok DIV 10, 10) AS bucket", "n_tok")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .orderBy("bucket")
      t("q74-shape, fanOut")(q74body(
        graft.util.Tables.fanOut(docs.select(col("doc_id"), col("text")))))
      t("q74-shape, scan as-is")(q74body(docs.select(col("doc_id"), col("text"))))
      def q78body(base: org.apache.spark.sql.DataFrame) = base
        .selectExpr("ngrams(text, 2) AS pair")
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc).limit(50)
      t("q78-shape, fanOut")(q78body(
        graft.util.Tables.fanOut(docs.select(col("doc_id"), col("text")))))
      t("q78-shape, scan as-is")(q78body(docs.select(col("doc_id"), col("text"))))
      def q69body(base: org.apache.spark.sql.DataFrame) = base
        .filter(col("text").isNotNull)
        .select(explode(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc).limit(100)
      t("q69-shape, fanOut")(q69body(
        graft.util.Tables.fanOut(docs.select(col("doc_id"), col("text")))))
      t("q69-shape, scan as-is")(q69body(docs.select(col("doc_id"), col("text"))))
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> exchanges`: per-query exchange
    // census — queries whose stage count exceeds their semantic minimum
    // are paying avoidable job floor at bench scale.
    if (args.length >= 2 && args(1) == "exchanges") {
      for (q <- SparkEntry.registry.filter(_.bench)) {
        val p = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        val ex = "Exchange ".r.findAllIn(p).size
        val kinds = Seq("rangepartitioning", "hashpartitioning",
          "SinglePartition", "RoundRobinPartitioning")
          .map(k => s"$k=${s"Exchange $k".r.findAllIn(p).size}")
          .filterNot(_.endsWith("=0")).mkString(" ")
        if (ex >= 3) println(s"[exchanges] ${q.name}: $ex ($kinds)")
        graft.util.Caches.clearTransient()
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> rangesorts`: which benched queries
    // still plan a range-partitioned sort (sampling job + shuffle) at
    // this SF — i.e. where the presentation-sort gather did NOT engage?
    if (args.length >= 2 && args(1) == "rangesorts") {
      for (q <- SparkEntry.registry.filter(_.bench)) {
        val p = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        val n = "Exchange rangepartitioning".r.findAllIn(p).size
        if (n > 0) println(s"[rangesorts] ${q.name}: $n")
        graft.util.Caches.clearTransient()
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> fanfacts`: the single-row-group
    // corpus plans every scan as ONE task — is fanning the LINEITEM scan
    // out (round-robin exchange of the projected columns) before the
    // partial agg a net win for the TPC-H-shaped family, the way it
    // measured for the shingle/JSON kernels?
    if (args.length >= 2 && args(1) == "fanfacts") {
      import org.apache.spark.sql.functions._
      val li = graft.util.Tables.lineitem(spark, sfDir)
      def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save()
        val times = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[fanfacts] $label%-40s ${times.min}%6.3f s")
      }
      def q10body(base: org.apache.spark.sql.DataFrame) = base
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(graft.functions.Hashing.decSum(col("l_extendedprice")).as("sum_price"),
          sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
      t("q10-shape, scan as-is")(q10body(li))
      t("q10-shape, fanOut projected") {
        q10body(graft.util.Tables.fanOut(li.select(
          col("l_shipdate"), col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice"), col("l_quantity"))))
      }
      val ord = graft.util.Tables.orders(spark, sfDir)
      def q09body(o: org.apache.spark.sql.DataFrame) = o
        .join(broadcast(graft.util.Tables.customer(spark, sfDir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), graft.functions.Hashing.decSum(col("o_totalprice")).as("rev"))
        .orderBy("c_nationkey")
      t("q09-shape, scan as-is")(q09body(ord))
      t("q09-shape, fanOut projected") {
        q09body(graft.util.Tables.fanOut(ord.select(
          col("o_custkey"), col("o_totalprice"))))
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> fanout`: does the 1-task documents
    // scan serialize the shingle md5 work?
    if (args.length >= 2 && args(1) == "fanout") {
      import org.apache.spark.sql.functions._
      val docs = graft.util.Tables.documents(spark, sfDir)
      println(s"[fanout] scan partitions = ${docs.rdd.getNumPartitions}")
      def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save()
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[fanout] $label%-36s ${times.min}%6.3f s")
      }
      t("shingle+md5, scan as-is") {
        docs.selectExpr("doc_id", "shingles(text, 3) AS shingle")
          .select(col("doc_id"),
            graft.functions.Hashing.md5Long(col("shingle")).as("h1"),
            graft.functions.Hashing.md5Long2(col("shingle")).as("h2"))
      }
      t("shingle+md5, repartition(32) first") {
        docs.repartition(32)
          .selectExpr("doc_id", "shingles(text, 3) AS shingle")
          .select(col("doc_id"),
            graft.functions.Hashing.md5Long(col("shingle")).as("h1"),
            graft.functions.Hashing.md5Long2(col("shingle")).as("h2"))
      }
      def shh = graft.util.Tables.fanOut(docs.select(col("doc_id"), col("text")))
        .selectExpr("doc_id", "shingles(text, 3) AS shingle")
        .select(col("doc_id"), graft.functions.Hashing.md5Long(col("shingle")).as("h1"))
      def q31body(sh: org.apache.spark.sql.DataFrame) = {
        val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        sh.as("a")
          .join(sh.as("b"), col("a.h1") === col("b.h1") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
          .agg(count(lit(1)).as("inter"))
          .join(sz.as("za"), col("ida") === col("za.doc_id"))
          .join(sz.as("zb"), col("idb") === col("zb.doc_id"))
          .select(col("ida"), col("idb"), (col("inter").cast("double") /
            (col("za.n") + col("zb.n") - col("inter"))).as("jacc"))
          .filter(col("jacc") >= 0.5).orderBy("ida", "idb")
      }
      t("q31 with persist") { val s0 = shh.persist(); val r = q31body(s0); r }
      spark.sqlContext.clearCache()
      t("q31 without persist")(q31body(shh))
      spark.sqlContext.clearCache()
      val li = graft.util.Tables.lineitem(spark, sfDir)
      def q26shape(src: org.apache.spark.sql.DataFrame) = src
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.functions.Hashing.rowIdTrusted(col("l_orderkey"), lit("|"),
            col("l_linenumber")).as("id"))
        .orderBy("l_orderkey", "l_linenumber")
      t("q26 shape, as-is")(q26shape(li))
      t("q26 shape, fanned")(q26shape(li.repartition(32)))
      t("q26 shape, md5 AFTER sort") {
        li.select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber")
          .select(col("l_orderkey"), col("l_linenumber"),
            graft.functions.Hashing.rowIdTrusted(col("l_orderkey"), lit("|"),
              col("l_linenumber")).as("id"))
      }
      t("q26 shape, fanned + md5 AFTER sort") {
        graft.util.Tables.fanOut(li.select("l_orderkey", "l_linenumber"))
          .orderBy("l_orderkey", "l_linenumber")
          .select(col("l_orderkey"), col("l_linenumber"),
            graft.functions.Hashing.rowIdTrusted(col("l_orderkey"), lit("|"),
              col("l_linenumber")).as("id"))
      }
      def q56shape(src: org.apache.spark.sql.DataFrame) = {
        val x = col("l_quantity"); val y = col("l_discount")
        src.groupBy("l_returnflag")
          .agg(graft.functions.Hashing.decSum(x).as("sx"),
            graft.functions.Hashing.decSum(y).as("sy"),
            graft.functions.Hashing.decSum(x * y).as("sxy"),
            graft.functions.Hashing.decSum(x * x).as("sxx"),
            graft.functions.Hashing.decSum(y * y).as("syy"))
      }
      t("q56 shape, as-is")(q56shape(li))
      t("q56 shape, fanned")(q56shape(li.repartition(32)))
      t("q56 shape, select-then-fanned")(
        q56shape(li.select("l_returnflag", "l_quantity", "l_discount").repartition(32)))
      def q10shape(src: org.apache.spark.sql.DataFrame) = src
        .groupBy("l_returnflag", "l_linestatus")
        .agg(graft.functions.Hashing.decSum(col("l_quantity")).as("sum_qty"),
          graft.functions.Hashing.decSum(col("l_extendedprice")).as("sum_base"),
          graft.functions.Hashing.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
          count(lit(1)).as("n"))
      t("q10 shape, as-is")(q10shape(li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))))
      t("q10 shape, select-then-fanned")(
        q10shape(li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
          .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")
          .repartition(32)))
      val ev40 = graft.util.Tables.events(spark, sfDir)
      def q40shape(src: org.apache.spark.sql.DataFrame) = src
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      t("q40 shape, as-is")(q40shape(ev40))
      t("q40 shape, select-then-fanned")(
        q40shape(ev40.select("user_id", "ts", "value").repartition(32)))
      val ev = graft.util.Tables.events(spark, sfDir)
      t("q47 from_json, as-is") {
        ev.select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType)))).as("p"))
      }
      t("q47 from_json, fanned") {
        ev.repartition(32).select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType)))).as("p"))
      }
      spark.stop()
      return
    }

    // `runMain graft.Profile <sfDir> decsum`: isolate the exact-decimal
    // aggregation cost against cheaper sum strategies
    if (args.length >= 2 && args(1) == "decsum") {
      import org.apache.spark.sql.functions._
      val li = graft.util.Tables.lineitem(spark, sfDir)
      def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        df.write.format("noop").mode("overwrite").save() // warm
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[decsum] $label%-28s ${times.min}%6.3f s")
      }
      t("baseline count only") {
        li.groupBy("l_returnflag").agg(count(lit(1)))
      }
      t("1x sum(double)") {
        li.groupBy("l_returnflag").agg(sum(col("l_extendedprice")))
      }
      t("1x decSum") {
        li.groupBy("l_returnflag").agg(graft.functions.Hashing.decSum(col("l_extendedprice")))
      }
      t("4x decSum (q10 shape)") {
        li.groupBy("l_returnflag").agg(
          graft.functions.Hashing.decSum(col("l_extendedprice")),
          graft.functions.Hashing.decSum(col("l_quantity")),
          graft.functions.Hashing.decSum(col("l_discount")),
          graft.functions.Hashing.decSum(col("l_tax")))
      }
      t("4x sum(double)") {
        li.groupBy("l_returnflag").agg(
          sum(col("l_extendedprice")), sum(col("l_quantity")),
          sum(col("l_discount")), sum(col("l_tax")))
      }
      t("4x sum(long micros)") {
        li.groupBy("l_returnflag").agg(
          sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(20, 6))
            .multiply(lit(1000000)).cast("long")),
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(20, 6))
            .multiply(lit(1000000)).cast("long")),
          sum(col("l_discount").cast(org.apache.spark.sql.types.DecimalType(20, 6))
            .multiply(lit(1000000)).cast("long")),
          sum(col("l_tax").cast(org.apache.spark.sql.types.DecimalType(20, 6))
            .multiply(lit(1000000)).cast("long")))
      }
      spark.stop()
      return
    }

    def run(name: String): Double = {
      spark.sqlContext.clearCache()
      val t0 = System.nanoTime()
      noop(SparkEntry.queries(name)(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }

    val hot = Seq("q31_ngram_jaccard", "q29_lsh_neardup", "q51_dedup_clusters",
      "q28_minhash_sig", "q38_fingerprint", "q26_row_id", "q30_simhash",
      "q56_stats_corr", "q53_rollup", "q10_agg_pricing", "q33_ivf_neardup")

    // warmup every hot query once (codegen cache, parquet footers)
    hot.foreach(run)

    def sweep(label: String): Unit = {
      val times = hot.map(q => q -> (1 to 2).map(_ => run(q)).min)
      println(f"[sweep] $label%-28s total=${times.map(_._2).sum}%6.2f  " +
        times.map { case (q, t) => f"${q.take(3)}=$t%5.2f" }.mkString(" "))
    }

    sweep("baseline AQE=on p=32")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sweep("AQE=off p=32")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    sweep("AQE=on p=8")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sweep("AQE=off p=8")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    spark.conf.set("spark.graft.presentationSort.maxBytes", "1")
    sweep("range-sort q26 (maxBytes=1)")
    spark.conf.unset("spark.graft.presentationSort.maxBytes")

    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    sweep("AQE=on p=32 parFirst=false")

    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
    sweep("  + advisory 16MB")

    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4MB")
    sweep("  + minPartitionSize 4MB")

    spark.stop()
  }
}
