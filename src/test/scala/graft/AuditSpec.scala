package graft

import org.scalatest.funsuite.AnyFunSuite

/** The audit endpoints (q96–q99) against independent driver-side
  * recomputations at sf0.001 — every number each report publishes is
  * re-derived here from the raw parquet with plain Scala collections
  * (no Spark, no shared kernels), so a regression in any composed kernel
  * (shingle index, term-frequency index, pair intersections, wide
  * signatures, quantizer) surfaces as a value diff, not just an oracle
  * mismatch at the driver gate.
  */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  // the canonical whitespace tokenization (graft.functions.Text.words)
  private def words(text: String): Array[String] =
    text.trim.split("[ \\t\\n\\u000B\\f\\r]+")

  private def h1(s: String): Long =
    graft.plans.Md5PrefixLong.hash(s.getBytes("UTF-8"), 0)
  private def h2(s: String): Long =
    graft.plans.Md5PrefixLong.hash(s.getBytes("UTF-8"), 8)

  /** (doc_id, lang, source, distinct 3-shingle h1 set). */
  private lazy val docs: Seq[(Long, String, String, Set[Long], Array[String])] =
    graft.util.Tables.documents(spark, d)
      .select("doc_id", "lang", "source", "text").collect().toSeq
      .filter(r => !r.isNullAt(3))
      .map { r =>
        val ws = words(r.getString(3))
        val sh = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        (r.getLong(0), r.getString(1), r.getString(2), sh.map(h1), ws)
      }

  test("q96 source overlap matches a driver-side shingle-set recomputation") {
    val bySrc = docs.groupBy(_._3).view
      .mapValues(_.map(_._4).reduce(_ ++ _)).toMap
    val expected = (for {
      (sa, ha) <- bySrc; (sb, hb) <- bySrc if sa < sb
      shared = (ha & hb).size if shared > 0
    } yield (sa, sb) ->
      (shared.toLong, shared.toDouble / (ha.size + hb.size - shared).toDouble))
      .toMap
    val got = SparkEntry.queries("q96_source_overlap")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == expected)
  }

  test("q132 sketch overlap matches a driver KMV recomputation; error vs exact bounded") {
    val k = 256
    val bySrc = docs.groupBy(_._3).view
      .mapValues(_.map(_._4).reduce(_ ++ _)).toMap
    val sigOf = bySrc.view.mapValues(_.toArray.sorted.take(k)).toMap
    // exact KMV estimate per pair: threshold = kth smallest of the union
    // of the two signatures (bottom-k composes), common counted under it
    val expected = (for {
      (sa, siga) <- sigOf; (sb, sigb) <- sigOf if sa < sb
      u = (siga.toSet ++ sigb.toSet).toArray.sorted
      denom = math.min(u.length, k)
      t = u(denom - 1)
      common = (siga.toSet & sigb.toSet).count(_ <= t)
      if common > 0
    } yield (sa, sb) -> (common.toLong, common.toDouble / denom.toDouble))
      .toMap
    val df = SparkEntry.queries("q132_source_overlap_sketch")(spark, d)
    // the scale claim rests on MAP-SIDE partial aggregation of the
    // signature buffers (the exchange carries |sources|·k longs, never
    // raw postings) — pin it on the physical plan
    assert(df.queryExecution.sparkPlan.toString
      .contains("partial_kmvsignature"),
      "q132 must partially aggregate signatures map-side")
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == expected)
    // the estimator's accuracy claim against the EXACT per-pair Jaccard
    // (q96's ground truth): exact when a pair's union fits inside k (both
    // signatures complete), and inside the ~1/sqrt(k) concentration
    // envelope everywhere (3.5 sigma — a regression in the sketch shows
    // up as a gross violation, not a near-miss)
    val exact = (for {
      (sa, ha) <- bySrc; (sb, hb) <- bySrc if sa < sb
      inter = (ha & hb).size if inter > 0
    } yield (sa, sb) ->
      (inter.toDouble / (ha.size + hb.size - inter).toDouble)).toMap
    got.foreach { case ((sa, sb), (_, est)) =>
      val truth = exact((sa, sb))
      val unionN = bySrc(sa).size + bySrc(sb).size -
        (bySrc(sa) & bySrc(sb)).size
      if (unionN <= k) assert(est == truth, s"($sa,$sb) union<=k must be exact")
      else assert(math.abs(est - truth) <= 3.5 / math.sqrt(k.toDouble),
        s"($sa,$sb) est=$est exact=$truth outside the envelope")
    }
  }

  test("q134: the banded pair stage is estimate-identical to the NL stage at fine-grained provenance") {
    // the r16 scale path: candidates from joining exploded signatures on
    // the element must reproduce the |S|²/2 NL stage's output EXACTLY —
    // every output pair shares a signature element (n_common > 0 needs
    // one), and both stages share the kmvEstimate expression
    val sigs = graft.queries.AuditOps.kmvSigs(spark, d, grain = Some(7))
      .persist()
    try {
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val nl = asMap(graft.queries.AuditOps.kmvPairsNL(sigs))
      val banded = asMap(graft.queries.AuditOps.kmvPairsBanded(sigs))
      assert(nl.nonEmpty,
        "fixture must co-occur somewhere or the pin is vacuous")
      assert(banded == nl)
      // and the registry face rides exactly the banded stage
      val q134 = SparkEntry
        .queries("q134_source_overlap_fine")(spark, d).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(q134 == nl)
    } finally { sigs.unpersist(); () }
  }

  test("kmvPairs front door: choice rule anchored to the measured regimes, dispatch never changes the answer") {
    import graft.queries.AuditOps
    // the measured anchors the rule must reproduce (kmvscale, BASELINE
    // r16 + r17): q132's tens-of-sources contract → NL (the only
    // measured NL win, |S|=20); banded from |S|≈100 at EVERY measured
    // tier, dense (sf0.1 shared vocabulary, |S|=140: banded 3.26 s vs
    // NL 5.13) and sparse (sf10 replicas) alike — the volume-comparison
    // rule the r16 verdict proposed would route dense |S|=140 to NL
    // (156k ≫ 9.7k candidate rows) and is measured-refuted (see
    // kmvChooseBanded's doc)
    assert(!AuditOps.kmvChooseBanded(20, 48640L))
    assert(AuditOps.kmvChooseBanded(140, 156441L))
    assert(AuditOps.kmvChooseBanded(100, 111685L))
    assert(AuditOps.kmvChooseBanded(100000L, 1000000L))
    // dispatch identity at both provenance grains of the gate corpus —
    // whatever stage it picks, the answer IS the NL stage's
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // r18: drive the dispatch across grains chosen to land in BOTH
    // regimes (coarse provenance → NL; 97-way fine-grained → |S| > 64
    // → banded), and pin the returned decision record against the rule
    var seen = Set.empty[String]
    for (grain <- Seq(Option.empty[Int], Some(7), Some(97))) {
      val sigs = graft.queries.AuditOps.kmvSigs(spark, d, grain).persist()
      try {
        val disp = AuditOps.kmvPairsDispatch(sigs)
        val got = asMap(disp.pairs)
        assert(got.nonEmpty && got == asMap(AuditOps.kmvPairsNL(sigs)),
          s"dispatch output diverged at grain=$grain")
        assert(disp.stage == (if (AuditOps.kmvChooseBanded(disp.nSources,
          disp.bandedRows)) "banded" else "nl"))
        assert(disp.nlPairs == disp.nSources * (disp.nSources - 1) / 2)
        seen += disp.stage
      } finally { sigs.unpersist(); () }
    }
    assert(seen == Set("nl", "banded"),
      s"dispatch must be exercised in both regimes, saw: $seen")
  }

  test("q97 DSIR weights match a driver-side fixed-point recomputation") {
    val tok = docs.map { case (id, lang, _, _, ws) => (id, lang, ws) }
    val bucketOf = (w: String) => java.lang.Math.floorMod(h1(w), 512L)
    val r = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val t = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    tok.foreach { case (_, lang, ws) =>
      ws.foreach { w =>
        val b = bucketOf(w)
        r(b) += 1
        if (lang == "en") t(b) += 1
      }
    }
    val ps = (b: Long) =>
      math.floor((t(b) + 1).toDouble * 1048576.0 / (r(b) + 1).toDouble).toLong
    val expected = tok.map { case (id, lang, ws) =>
      val sps = ws.map(w => ps(bucketOf(w))).sum
      id -> (lang, ws.length.toLong,
        sps.toDouble / (ws.length.toDouble * 1048576.0))
    }.toMap
    val got = SparkEntry.queries("q97_dsir_weights")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == expected)
  }

  /** (vec_id, label, quantized vector). */
  private lazy val vecs: Seq[(Long, Int, Array[Long])] =
    graft.util.Tables.embeddings(spark, d)
      .select("vec_id", "label", "embedding").collect().toSeq
      .map { r =>
        val q = r.getSeq[Float](2).map(x =>
          math.floor(x.toDouble * 1048576.0).toLong).toArray
        (r.getLong(0), r.getInt(1), q)
      }

  /** The r13 FIXED probe panel: the ProbePanelSize vectors with the
    * smallest (md5Long(vec_id), vec_id) — the driver-side mirror of
    * TrainingOps.quantizedPanel's pinned-panel contract (it must NOT
    * grow with the corpus; see the r10→r13 exclusion story).
    */
  private lazy val fixedPanel: Seq[(Long, Int, Array[Long])] =
    vecs.sortBy(v => (h1(v._1.toString), v._1))
      .take(graft.queries.TrainingOps.ProbePanelSize)

  test("q98 ANN recall matches a driver-side brute-force recomputation") {
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val probes = fixedPanel
    assert(probes.nonEmpty)
    def top10(q: (Long, Int, Array[Long]), cand: Seq[(Long, Int, Array[Long])]): Set[Long] =
      cand.filter(_._1 != q._1)
        .map(v => (v._1, cos(v._3, q._3)))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val expected = probes.map { p =>
      val exact = top10(p, vecs)
      val ivf = top10(p, vecs.filter(_._2 == p._2))
      p._1 -> (exact & ivf).size.toLong
    }.toMap
    val got = SparkEntry.queries("q98_ann_recall")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    SparkEntry.queries("q98_ann_recall")(spark, d).collect().foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("q106 hard negatives match a driver-side in-cell band recomputation") {
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val probes = fixedPanel
    val expected = probes.flatMap { p =>
      vecs.filter(v => v._2 == p._2 && v._1 != p._1)
        .map(v => (v._1, cos(v._3, p._3)))
        .filter { case (_, c) => c >= 0.35 && c < 0.75 }
        .sortBy { case (id, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, c), i) => (p._1, (i + 1).toLong, id, c) }
    }.toSet
    val got = SparkEntry.queries("q106_hard_negatives")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty) // the frozen corpus has band pairs — a zero here
    // means the band or panel drifted
  }

  test("q98 top-10 cuts plan partial WindowGroupLimits below the qid exchange") {
    val p = SparkEntry.queries("q98_ann_recall")(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("q106 top-5 cut plans a partial WindowGroupLimit; candidates stay cell-joined") {
    val p = SparkEntry.queries("q106_hard_negatives")(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q104 broadcasts only the bounded lang-rate frames; base scanned once") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val raw = SparkEntry.queries("q104_language_temperature")(spark, d)
      .queryExecution.executedPlan
    val plan: SparkPlan = raw match { // AQE wraps as a leaf — unwrap
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    // every broadcast side must sit above an aggregation — the bounded
    // |langs|-row rate table or the 1-row min-mass, never the doc-level
    // base frame itself
    val bx = plan.collect { case b: BroadcastExchangeExec => b }
    assert(bx.nonEmpty, plan.toString)
    bx.foreach(b => assert(
      b.collectFirst { case a: BaseAggregateExec => a }.isDefined,
      s"un-aggregated (unbounded) broadcast side:\n$b"))
    // the persisted base serves BOTH consumers (mass agg + keep pass)
    // through cache reads — two InMemoryTableScans, zero extra scans
    val cacheReads = plan.collect { case i: InMemoryTableScanExec => i }
    assert(cacheReads.size >= 2, plan.toString)
  }

  test("q99 MinHash calibration matches a driver-side recomputation") {
    // per-doc signature lanes min(h1 ^ b*h2) over the doc's shingles —
    // recomputed from shingle STRINGS (not the shared index)
    val shs = docs.map { case (id, _, _, _, ws) =>
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val sig = shs.view.mapValues { sh =>
      (0 until 8).map(b => sh.map(s => h1(s) ^ (b * h2(s))).min).toArray
    }.toMap
    val hs = shs.view.mapValues(_.map(h1)).toMap
    val ids = shs.keys.toSeq.sorted
    case class Acc(var n: Long = 0L, var lanes: Long = 0L,
      var inter: Long = 0L, var uni: Long = 0L)
    val acc = scala.collection.mutable.Map.empty[Long, Acc]
    for {
      i <- ids.indices; j <- (i + 1) until ids.length
      (ida, idb) = (ids(i), ids(j))
      inter = (hs(ida) & hs(idb)).size.toLong if inter > 0
    } {
      val uni = hs(ida).size + hs(idb).size - inter
      val lanes = (0 until 8).count(b => sig(ida)(b) == sig(idb)(b)).toLong
      val dec = math.min(math.floor(inter.toDouble * 10.0 / uni.toDouble).toLong, 9L)
      val a = acc.getOrElseUpdate(dec, Acc())
      a.n += 1; a.lanes += lanes; a.inter += inter; a.uni += uni
    }
    val expected = acc.map { case (dec, a) =>
      dec -> (a.n, a.inter.toDouble / a.uni.toDouble,
        a.lanes.toDouble / (a.n.toDouble * 8.0))
    }.toMap
    val got = SparkEntry.queries("q99_minhash_error")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got == expected)
  }

  test("q103 snapshot churn: partition identities hold and both diff classes occur") {
    val rows = SparkEntry.queries("q103_snapshot_churn")(spark, d).collect()
    assert(rows.nonEmpty)
    var added = 0L; var removed = 0L; var changed = 0L
    rows.foreach { r =>
      val Seq(nOld, nNew, nAdd, nRem, nChg, nUnc) = (1 to 6).map(r.getLong)
      // every old doc is removed|changed|unchanged; every new doc is
      // added|changed|unchanged — the diff is a partition of each side
      assert(nOld == nRem + nChg + nUnc, r.toString)
      assert(nNew == nAdd + nChg + nUnc, r.toString)
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
      added += nAdd; removed += nRem; changed += nChg
    }
    // the deterministic snapshot views guarantee all three classes exist
    assert(added > 0 && removed > 0 && changed > 0)
  }

  test("q107 split leakage: a constructed cross-split duplicate is counted on both sides") {
    import spark.implicits._
    def coin(id: Long): Long =
      java.lang.Math.floorMod(h1(s"$id:sp"), 100L)
    // pick one train-coin id and one non-train-coin id from the coin
    // space itself — the split function is the md5 coin, so the leak
    // must be planted where the coin puts it
    val ids = (1L to 200L)
    val trainId = ids.find(coin(_) < 80).get
    val evalId = ids.find(coin(_) >= 90).get
    val dir = java.nio.file.Files.createTempDirectory("graft-leak-")
      .toFile.getAbsolutePath
    Seq(
      (trainId, "the shared leaked document body", "s1"),
      (evalId, "the shared leaked document body", "s2"), // exact dup across splits
      (ids.find(c => coin(c) < 80 && c != trainId).get, "unique train doc", "s1"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q107_split_leakage")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(rows("train") == ((2L, 1L))) // 2 train docs, 1 leaked
    assert(rows("test")._2 == 1L) // the duplicate's other side
    assert(!rows.contains("val") || rows("val")._2 == 0L)
  }

  test("q112 span masking: constructed corpus pins merge/adjacent/repeat/multi-eval semantics") {
    import spark.implicits._
    val e = (1 to 30).map(i => s"e$i")
    val f = (1 to 12).map(i => s"f$i")
    def t(xs: Seq[String]) = xs.mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-spans-")
      .toFile.getAbsolutePath
    Seq(
      (0L, t(e)),   // eval doc: the source of every e-gram
      (50L, t(f)),  // a second eval doc
      // three hits: [3,10], [12,19] (1-token gap keeps them apart), and
      // the REPEATED e1..e8 at [23,30] — all-occurrence semantics must
      // mark the second site too
      (1L, t(Seq("a", "b") ++ e.slice(0, 8) ++ Seq("c") ++ e.slice(9, 17)
        ++ Seq("d", "d", "d") ++ e.slice(0, 8))),
      (2L, t(e.take(9))),                      // overlapping windows merge
      (3L, t(e.slice(0, 8) ++ e.slice(9, 17))), // adjacent windows merge
      (4L, t((1 to 10).map(i => s"x$i"))),      // clean doc: absent
      (5L, "e1 e2"),                            // too short for any 8-gram
      (6L, t(f.slice(1, 9))))                   // hit via the SECOND eval doc
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q112_decontaminate_spans")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 3L, 24L, 30L),
      (2L, 1L, 9L, 9L),
      (3L, 1L, 16L, 16L),
      (6L, 1L, 8L, 8L)))
  }

  test("q112 exchanges are string-free: corpus text never crosses a shuffle or broadcast") {
    import org.apache.spark.sql.execution.SparkPlan
    val df = SparkEntry.queries("q112_decontaminate_spans")(spark, d)
    df.count() // materialize the adaptive plan + the cached kernel
    def exchanges(p: SparkPlan): Seq[org.apache.spark.sql.execution.exchange.Exchange] = {
      val buf = scala.collection.mutable.Buffer
        .empty[org.apache.spark.sql.execution.exchange.Exchange]
      p.foreach {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          if (a.executedPlan ne p) buf ++= exchanges(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          buf ++= exchanges(q.plan)
        case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          buf ++= exchanges(i.relation.cachedPlan)
        case e: org.apache.spark.sql.execution.exchange.Exchange => buf += e
        case _ =>
      }
      buf.toSeq
    }
    val ex = exchanges(df.queryExecution.executedPlan)
    assert(ex.nonEmpty)
    for (e <- ex; a <- e.child.output)
      assert(!a.dataType.simpleString.contains("string"),
        s"text-bearing exchange: ${a.name}: ${a.dataType.simpleString} in\n$e")
  }

  test("q114 mask apply: the masked TEXT is exactly the span-complement, fully-masked docs hash empty") {
    import spark.implicits._
    def md5(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val e = (1 to 30).map(i => s"e$i")
    def t(xs: Seq[String]) = xs.mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-mask-")
      .toFile.getAbsolutePath
    Seq(
      (0L, t(e)), // eval
      // spans [3,10], [12,19], [23,30] -> survivors a b c d d d
      (1L, t(Seq("a", "b") ++ e.slice(0, 8) ++ Seq("c") ++ e.slice(9, 17)
        ++ Seq("d", "d", "d") ++ e.slice(0, 8))),
      (2L, t(e.take(9))), // fully masked
      (3L, t((1 to 5).map(i => s"x$i")))) // clean: absent from the report
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q114_mask_apply")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (1L, md5("a b c d d d"), 6L, 30L),
      (2L, md5(""), 0L, 9L)))
  }

  test("q113 per-source caps: driver recomputation off the quality kernel, partial WindowGroupLimit in the plan") {
    val df = SparkEntry.queries("q113_source_caps")(spark, d)
    // the top-K extraction must leave each map partition pre-limited:
    // a partial WindowGroupLimit BELOW the source exchange (deeper in
    // the printed tree than the final one above it)
    val plan = df.queryExecution.executedPlan.toString
    val first = plan.indexOf("WindowGroupLimit")
    assert(first >= 0 && plan.indexOf("WindowGroupLimit", first + 1) > first, plan)
    // ground truth composed from the (oracle-green) quality kernel
    val qual = SparkEntry.queries("q36_quality_score")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getDouble(5))).toMap
    val src = graft.util.Tables.documents(spark, d)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = qual.toSeq.groupBy { case (id, _) => src(id) }.toSeq
      .map { case (s0, xs) =>
        val kept = xs.sortBy { case (id, (_, sc)) => (-sc, id) }.take(10)
        (s0, xs.size.toLong, kept.size.toLong,
          kept.map(_._2._2).min, kept.map(_._2._1).sum)
      }
      .sortBy(_._1)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("q102 expectations: every check fires on a deliberately dirty corpus") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-dirty-")
      .toFile.getAbsolutePath
    Seq( // dup id 1; null text on 3; n_chars wrong on 4
      (1L, "a b c", "en", "s1", 5L), (1L, "d e f", "en", "s1", 5L),
      (3L, null.asInstanceOf[String], "en", "s1", 0L),
      (4L, "ab", "en", "s1", 99L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "click", -5.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "hover", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    Seq((100L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet") // custkey 1 has no customer row
    Seq((2L, "x")).toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    Seq((999L, 1L)).toDF("l_orderkey", "l_linenumber")
      .write.parquet(s"$dir/lineitem.parquet") // orderkey 999 has no order

    val got = SparkEntry.queries("q102_expectations")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(got("documents.doc_id_unique") == ((1L, 0)))
    assert(got("documents.text_not_null") == ((1L, 0)))
    assert(got("documents.n_chars_consistent") == ((1L, 0)))
    assert(got("events.value_non_negative") == ((1L, 0)))
    assert(got("events.event_type_in_domain") == ((1L, 0)))
    assert(got("orders.custkey_references_customer") == ((1L, 0)))
    assert(got("lineitem.orderkey_references_orders") == ((1L, 0)))
    assert(got("embeddings.dim_constant") == ((1L, 0)))
  }

  test("q111 pair expansion is gated: train side semi-joins contaminationHits before the h1 join") {
    // the r11 verdict's hot-shingle hazard: ungated, the train x eval
    // join fans out df_train(h1) * df_eval(h1) per shingle. The gate is
    // lossless (n_shared(t,e) <= n_hits(t)) and must be IN the plan —
    // a refactor back to the ungated expansion fails here.
    val df = SparkEntry.queries("q111_contamination_pairs")(spark, d)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("LeftSemi"), p)
  }

  test("q109 text recovery is postings-bounded: the Generate sits above a semi join, and " +
      "the gated result is identical to an ungated recomputation") {
    val df = SparkEntry.queries("q109_memorization_ngrams")(spark, d)
    df.count() // build + cache the shared shingle index
    // string-form plan: under AQE the physical tree hides inside
    // AdaptiveSparkPlanExec, but toString renders the whole tree
    val whole = df.queryExecution.executedPlan.toString
    // judge only the CONSUMER plan — the cached shingle index's build
    // plan (inside the rendered InMemoryRelation) legitimately carries
    // its own corpus-wide Generate
    val p = whole.substring(0, whole.indexOf("InMemoryRelation"))
    // exactly ONE recovery Generate in the consumer plan, and the semi
    // join (the postings gate) sits BELOW it — deeper in the printed
    // tree — so its input is the posting docs, never the corpus
    val gen = p.indexOf("Generate shinglegenerator")
    assert(gen >= 0 && p.indexOf("Generate shinglegenerator", gen + 1) < 0, whole)
    val semi = p.indexOf("LeftSemi")
    assert(semi > gen, whole)
    // identity vs the r11 corpus-wide recovery
    import org.apache.spark.sql.functions._
    val idx = graft.queries.TrainingOps.shingleIndex(spark, d)
    val top = idx.groupBy("h1").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("h1").asc).limit(10)
    val ungated = graft.util.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
      .selectExpr("shingles(text, 3) AS ngram")
      .select(graft.functions.Hashing.md5Long(col("ngram")).as("h1"), col("ngram"))
      .join(broadcast(top), "h1")
      .select(col("ngram"), col("n_docs")).distinct()
      .orderBy(col("n_docs").desc, col("ngram").asc)
      .collect().map(_.toString).toSeq
    assert(df.collect().map(_.toString).toSeq == ungated)
  }

  // the RAW-parquet driver-side semantic tier (this file's charter):
  // quantize exactly as the engine does (floor(x·2^20) as int64) and
  // enumerate every unordered in-cell pair with its exact cosine — a
  // regression anywhere in the shared cellPairCos kernel (quantizer,
  // salting, retention pruning) surfaces in the consumers' value diffs,
  // independent of the kernel itself
  private lazy val inCellPairs: Seq[(Long, Long, Double)] = {
    val vecs = graft.util.Tables.embeddings(spark, d)
      .select("vec_id", "label", "embedding").collect()
      .map { r =>
        val q = r.getSeq[Float](2)
          .map(x => math.floor(x.toDouble * 1048576.0).toLong).toArray
        (r.getLong(0), r.getInt(1), q)
      }
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    for {
      cell <- vecs.groupBy(_._2).values.toSeq
      Array((ia, _, qa), (ib, _, qb)) <- cell.sortBy(_._1).combinations(2)
    } yield (ia, ib, dot(qa, qb).toDouble /
      (math.sqrt(dot(qa, qa).toDouble) * math.sqrt(dot(qb, qb).toDouble)))
  }

  test("q115 semantic contamination matches a driver-side exact-quantization recomputation") {
    val expected = inCellPairs
      .filter { case (a, b, c) => c >= 0.35 && ((a % 50 == 0) != (b % 50 == 0)) }
      .map { case (a, b, c) => if (a % 50 == 0) (a, b, c) else (b, a, c) }
      .sortBy(t => (t._1, t._2))
    assert(expected.nonEmpty) // non-vacuous at this SF
    val got = SparkEntry.queries("q115_semantic_contamination")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("q118 incremental semantic dedup matches a driver-side best-standing-partner recomputation") {
    val best = inCellPairs
      .filter { case (a, b, c) => c >= 0.35 && ((a % 10 == 0) != (b % 10 == 0)) }
      .map { case (a, b, c) => if (a % 10 == 0) (a, b, c) else (b, a, c) }
      .groupBy(_._1).view.mapValues(
        _.minBy { case (_, p, c) => (-c, p) }).toMap
    val expected = graft.util.Tables.embeddings(spark, d)
      .select("vec_id").collect().map(_.getLong(0)).filter(_ % 10 == 0)
      .sorted.toSeq.map { id =>
        best.get(id) match {
          case Some((_, p, c)) => (id, "near", Some(p), Some(c))
          case None => (id, "fresh", None, None)
        }
      }
    assert(expected.exists(_._2 == "near")) // non-vacuous at this SF
    val got = SparkEntry.queries("q118_incremental_semantic")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == expected)
  }

  test("q116 embedded-subset gate: an unembedded lexical pair is excluded, never 'disagreement'") {
    // constructed corpus: the fixtures' vec_id set is 1:1 with doc_id,
    // so the gate never filters there — this pins the documented
    // contract that a lexical pair with an unembedded side reads as
    // "not evaluated" (absent), not as lexical_only disagreement
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tiergate-")
      .toFile.getAbsolutePath
    def text(p: String) = (1 to 24).map(i => s"$p$i").mkString(" ")
    Seq(
      (1L, text("a")), (2L, text("a")),   // embedded near-dup pair
      (3L, text("b")), (4L, text("b")),   // UNEMBEDDED near-dup pair
      (5L, text("c")), (6L, text("dd")))  // semantic-only pair (below)
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val v = Array.fill(8)(0.5f)
    Seq(
      (1L, v.toSeq, 0), (2L, v.toSeq, 1), // different cells: no sem pair
      (5L, v.toSeq, 2), (6L, v.toSeq, 2)) // same cell, cos 1: sem pair
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q116_dedup_tier_agreement")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSeq
    assert(got == Seq((1L, 2L, "lexical_only"), (5L, 6L, "semantic_only")))
  }

  test("q116 tier agreement recomposes from the q29 and q33 pair lists on the embedded subset") {
    val emb = graft.util.Tables.embeddings(spark, d)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val lex = SparkEntry.queries("q29_lsh_neardup")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .filter { case ((a, b), _) => emb(a) && emb(b) }.toMap
    val sem = SparkEntry.queries("q33_ivf_neardup")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // the lexical tier must have found at least one embedded pair at
    // this SF or the agreement test is vacuous on the lex side
    assert(lex.nonEmpty)
    val expected = (lex.keySet ++ sem.keySet).toSeq.sorted.map { k =>
      val tier =
        if (sem.contains(k) && lex.contains(k)) "both"
        else if (sem.contains(k)) "semantic_only"
        else "lexical_only"
      (k._1, k._2, sem.get(k), lex.get(k), tier)
    }
    val got = SparkEntry.queries("q116_dedup_tier_agreement")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getString(4))).toSeq
    assert(got == expected)
  }

  test("q117 decision table recomposes from the q65/q115/q112/q125 outputs over the raw doc spine") {
    // severity composition pinned against the four tiers' own
    // oracle-green outputs: drop beats mask beats keep, and the doc
    // spine is ALL train docs (null-text docs count as keep). The media
    // drop flag (r15) is q125's pair list restricted to cross-split
    // pairs, train side.
    val dlex = SparkEntry.queries("q65_decontaminate")(spark, d).collect()
      .filter(_.getLong(1) >= 8).map(_.getLong(0)).toSet
    val dsem = SparkEntry.queries("q115_semantic_contamination")(spark, d)
      .collect().map(_.getLong(1)).toSet
    val dmed = SparkEntry.queries("q125_media_neardup")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 50 == 0) != (b % 50 == 0) }
      .map { case (a, b) => if (a % 50 == 0) b else a }.toSet
    val dmask = SparkEntry.queries("q112_decontaminate_spans")(spark, d)
      .collect().map(_.getLong(0)).toSet
    val base = graft.util.Tables.documents(spark, d)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._1 % 50 != 0)
    val expected = base.toSeq.groupBy { case (id, src, _) =>
      val dec =
        if (dlex(id) || dsem(id) || dmed(id)) "drop"
        else if (dmask(id)) "mask"
        else "keep"
      (src, dec)
    }.view.mapValues(rs => (rs.size.toLong, rs.map(_._3).sum)).toMap
    // at least one non-keep decision must exist at this SF or the
    // composition is untested
    assert(expected.keySet.map(_._2) != Set("keep"))
    val got = SparkEntry.queries("q117_decontam_decision")(spark, d)
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  /** Constructed corpus for the X104 dup-span tier: A (a1..a8) is owned
    * by doc 1 and also appears in docs 2 (twice), 3 and 6; B (b1..b8)
    * is owned by doc 3 and also appears in doc 4. Pins keep-first
    * (owners absent from the report), all-occurrence (doc 2's two
    * sites), adjacent-occurrence merging (doc 6's back-to-back A A →
    * one span) and clean/short docs absent.
    */
  private def dupSpanCorpus(): String = {
    import spark.implicits._
    val a = (1 to 8).map(i => s"a$i")
    val b = (1 to 8).map(i => s"b$i")
    def t(xs: Seq[String]) = xs.mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-dupspan-")
      .toFile.getAbsolutePath
    Seq(
      (1L, t(a)),                                    // owner of A: immune
      (2L, t(Seq("x", "y") ++ a ++ Seq("z") ++ a)),  // A at [3,10], [12,19]
      (3L, t(a ++ b)),                               // A at [1,8]; owns B
      (4L, t(Seq("c") ++ b)),                        // B at [2,9]
      (5L, t((1 to 10).map(i => s"u$i"))),           // clean: absent
      (6L, t(Seq("p") ++ a ++ a)))                   // adjacent: one [2,17]
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q119 dup-span report: keep-first, all-occurrence and merge semantics on a constructed corpus") {
    val got = SparkEntry.queries("q119_dupspan_report")(spark, dupSpanCorpus())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (2L, 2L, 16L, 19L),
      (3L, 1L, 8L, 16L),
      (4L, 1L, 8L, 9L),
      (6L, 1L, 16L, 17L)))
  }

  test("q120 dup-span apply: owners keep their text, non-owners keep exactly the span complement") {
    def md5(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val got = SparkEntry.queries("q120_dupspan_apply")(spark, dupSpanCorpus())
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (2L, md5("x y z"), 3L, 19L),
      (3L, md5((1 to 8).map(i => s"b$i").mkString(" ")), 8L, 16L),
      (4L, md5("c"), 1L, 9L),
      (6L, md5("p"), 1L, 17L)))
  }

  test("q120 exchanges are string-free: corpus text never crosses a shuffle or broadcast") {
    import org.apache.spark.sql.execution.SparkPlan
    val df = SparkEntry.queries("q120_dupspan_apply")(spark, d)
    df.count() // materialize the adaptive plan + the cached kernel
    def exchanges(p: SparkPlan): Seq[org.apache.spark.sql.execution.exchange.Exchange] = {
      val buf = scala.collection.mutable.Buffer
        .empty[org.apache.spark.sql.execution.exchange.Exchange]
      p.foreach {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          if (a.executedPlan ne p) buf ++= exchanges(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          buf ++= exchanges(q.plan)
        case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          buf ++= exchanges(i.relation.cachedPlan)
        case e: org.apache.spark.sql.execution.exchange.Exchange => buf += e
        case _ =>
      }
      buf.toSeq
    }
    val ex = exchanges(df.queryExecution.executedPlan)
    assert(ex.nonEmpty)
    // the one permitted string: the report's OWN masked_hash output (a
    // 32-char hex per span-bearing doc — output-sized rows on the final
    // presentation exchange). Corpus text and token arrays never cross.
    for (e <- ex; a <- e.child.output)
      assert(!a.dataType.simpleString.contains("string")
          || a.name == "masked_hash",
        s"text-bearing exchange: ${a.name}: ${a.dataType.simpleString} in\n$e")
  }

  test("q121 batch novelty matches a driver-side shingle-membership recomputation") {
    val standing = docs.filter(_._1 % 10 != 0).flatMap(_._4).toSet
    val expected = docs.filter(t => t._1 % 10 == 0 && t._4.nonEmpty)
      .sortBy(_._1)
      .map { case (id, _, _, sh, _) =>
        val n = sh.size.toLong
        val seen = sh.count(standing.contains).toLong
        val nov = (n - seen).toDouble / n.toDouble
        val band =
          if (nov >= 0.9) "novel" else if (nov >= 0.5) "mixed" else "dup_heavy"
        (id, n, seen, nov, band)
      }
    assert(expected.nonEmpty)
    val got = SparkEntry.queries("q121_batch_novelty")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toSeq
    assert(got == expected)
  }

  test("q121 band edges: an exact standing copy reads dup_heavy, all-new reads novel, half reads mixed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty-")
      .toFile.getAbsolutePath
    Seq(
      (1L, "s1 s2 s3 s4"),   // standing
      (10L, "s1 s2 s3 s4"),  // exact copy: novelty 0 → dup_heavy
      (20L, "u1 u2 u3 u4"),  // all-new: novelty 1 → novel
      (30L, "s1 s2 s3 v1"))  // {s1s2s3 seen, s2s3v1 new}: 0.5 → mixed
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q121_batch_novelty")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getString(4))).toSeq
    assert(got == Seq((10L, 0.0, "dup_heavy"), (20L, 1.0, "novel"),
      (30L, 0.5, "mixed")))
  }

  test("q130 vector-index stats match a driver-side recomputation of all eleven metrics") {
    def pct7(vs: Seq[Long], p: Double): Double = {
      val s0 = vs.sorted
      val h = (s0.length - 1) * p
      val l = math.floor(h).toInt
      if (l + 1 >= s0.length) s0.last.toDouble
      else s0(l) + (h - l) * (s0(l + 1) - s0(l))
    }
    // occupancy tier from the raw embeddings (labels ARE the cells)
    val cellsOf = vecs.map(_._2)
    val occ = cellsOf.groupBy(identity).view.mapValues(_.size.toLong).values.toSeq
    // threshold tier from exact in-cell cosines (brute force per cell —
    // the retained region is a superset, so the θ-filter is exact)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val nearPairs = for {
      (cell, vs) <- vecs.groupBy(_._2).toSeq
      (a, i) <- vs.zipWithIndex; b <- vs.drop(i + 1)
      if cos(a._3, b._3) >= 0.35
    } yield (math.min(a._1, b._1), math.max(a._1, b._1))
    val deg = (nearPairs.map(_._1) ++ nearPairs.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).values.toSeq
    val expected = Map(
      "cand_pairs" -> occ.map(c => c * (c - 1) / 2).sum.toDouble,
      "cell_max" -> occ.max.toDouble,
      "cell_mean" -> vecs.size.toDouble / occ.size,
      "cell_p50" -> pct7(occ, 0.5),
      "cell_p99" -> pct7(occ, 0.99),
      "cells" -> occ.size.toDouble,
      "near_deg_max" -> deg.max.toDouble,
      "near_deg_p99" -> pct7(deg, 0.99),
      "near_pairs" -> nearPairs.size.toDouble,
      "near_vecs" -> deg.size.toDouble,
      "vectors" -> vecs.size.toDouble)
    val got = SparkEntry.queries("q130_vector_index_stats")(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    for ((k, v) <- expected)
      assert(math.abs(got(k) - v) < 1e-9, s"$k: got ${got(k)} want $v")
    assert(expected("near_pairs") > 0, "threshold tier vacuous at this SF")
  }

  test("q124 index stats match a driver-side recomputation of all sixteen metrics") {
    // type-7 interpolated percentile (the percentile/quantile_cont
    // convention): lower + frac * (higher - lower)
    def pct(vs: Seq[Long], p: Double): Double = {
      val s0 = vs.sorted
      val h = (s0.length - 1) * p
      val l = math.floor(h).toInt
      if (l + 1 >= s0.length) s0.last.toDouble
      else s0(l) + (h - l) * (s0(l + 1) - s0(l))
    }
    def md5hex(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // per-doc h1 SEQUENCE keyed by distinct shingle strings (not a set
    // of h1 — a 60-bit collision inside one doc must count two postings
    // rows, as the index does)
    val shStr = docs.map { case (id, _, _, _, ws) =>
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val hSeq = shStr.filter(_._2.nonEmpty)
      .map { case (id, sh) => id -> sh.toSeq.map(h1) }
    val dfs = hSeq.flatMap { case (_, s0) => s0 }
      .groupBy(identity).values.map(_.size.toLong).toSeq
    val perDoc = hSeq.map(_._2.size.toLong)
    val sig = shStr.filter(_._2.nonEmpty).map { case (id, sh) =>
      id -> (0 until 8).map(b => sh.map(s => h1(s) ^ (b * h2(s))).min)
    }
    val buckets = sig.flatMap { case (_, m) =>
      (0 until 4).map(k => (k, s"${m(2 * k)},${m(2 * k + 1)}")) }
      .groupBy(identity).values.map(_.size.toLong).toSeq
    val exacts = docs.map { case (_, _, _, _, ws) => md5hex(ws.mkString("")) }
    val expected = Map[String, Double](
      "bucket_count" -> buckets.size.toDouble,
      "bucket_max" -> buckets.max.toDouble,
      "bucket_p99" -> pct(buckets, 0.99),
      "candidate_pairs" -> buckets.map(c => c * (c - 1) / 2).sum.toDouble,
      "df_max" -> dfs.max.toDouble,
      "df_mean" -> perDoc.sum.toDouble / dfs.size.toDouble,
      "df_p50" -> pct(dfs, 0.5),
      "df_p99" -> pct(dfs, 0.99),
      "distinct_shingles" -> dfs.size.toDouble,
      "doc_shingles_max" -> perDoc.max.toDouble,
      "doc_shingles_p50" -> pct(perDoc, 0.5),
      "docs" -> perDoc.size.toDouble,
      "exact_distinct" -> exacts.distinct.size.toDouble,
      "exact_docs" -> exacts.size.toDouble,
      "exact_dup_rate" -> (1.0 - exacts.distinct.size.toDouble / exacts.size),
      "postings_rows" -> perDoc.sum.toDouble)
    val got = SparkEntry.queries("q124_index_stats")(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("remediation closure: both apply tiers match a driver recomputation and actually decontaminate") {
    def md5hex(s0: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def grams(ws: Array[String]): Seq[(Int, String)] =
      if (ws.length < 8) Seq.empty
      else (0 to ws.length - 8).map(i => (i + 1, ws.slice(i, i + 8).mkString(" ")))
    def mask(ws: Array[String], hitPos: Seq[Int]): Array[String] = {
      val covered = hitPos.flatMap(p => p until (p + 8)).toSet // 1-based
      ws.zipWithIndex.collect { case (w, i) if !covered.contains(i + 1) => w }
    }
    val wsOf = docs.map(t => t._1 -> t._5).toMap

    // ---- q120 (corpus-internal keep-first) vs driver recomputation
    val docsOf = wsOf.toSeq.flatMap { case (id, ws) => grams(ws).map(_._2 -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val owner = docsOf.filter(_._2.size >= 2).view.mapValues(_.min).toMap
    val dupMasked = wsOf.flatMap { case (id, ws) =>
      val hits = grams(ws).collect { case (p, s0) if owner.get(s0).exists(_ != id) => p }
      if (hits.isEmpty) None else Some(id -> mask(ws, hits))
    }
    val q120out = SparkEntry.queries("q120_dupspan_apply")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(q120out.keySet == dupMasked.keySet)
    assert(dupMasked.nonEmpty) // non-vacuous at this SF
    for ((id, ws) <- dupMasked) {
      assert(q120out(id)._1 == md5hex(ws.mkString(" ")), s"doc $id hash")
      assert(q120out(id)._2 == ws.length.toLong, s"doc $id kept count")
    }
    // CLOSURE: in the masked corpus (masked docs + untouched rest),
    // every formerly-duplicated 8-gram survives in exactly its owner —
    // and on this corpus no cross-doc duplicate remains at all (seam
    // grams born at cut boundaries could in principle collide; pinned
    // empirically here)
    val after = wsOf.map { case (id, ws) => id -> dupMasked.getOrElse(id, ws) }
    val residual = after.toSeq.flatMap { case (id, ws) => grams(ws).map(_._2 -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(residual.collect { case (s0, n) if owner.contains(s0) => n }.forall(_ <= 1),
      "a formerly-duplicated gram survives in more than one doc")
    assert(residual.values.forall(_ <= 1), "post-apply cross-doc duplicate")

    // ---- q114 (eval-driven) vs driver recomputation
    val evalGrams = docs.filter(_._1 % 50 == 0)
      .flatMap(t => grams(t._5).map(_._2)).toSet
    val evMasked = docs.filter(_._1 % 50 != 0).flatMap { case (id, _, _, _, ws) =>
      val hits = grams(ws).collect { case (p, s0) if evalGrams.contains(s0) => p }
      if (hits.isEmpty) None else Some(id -> mask(ws, hits))
    }.toMap
    val q114out = SparkEntry.queries("q114_mask_apply")(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(q114out.keySet == evMasked.keySet)
    assert(evMasked.nonEmpty)
    for ((id, ws) <- evMasked) {
      assert(q114out(id)._1 == md5hex(ws.mkString(" ")), s"doc $id hash")
      assert(q114out(id)._2 == ws.length.toLong, s"doc $id kept count")
    }
    // CLOSURE: no masked train doc carries any eval 8-gram afterwards
    assert(evMasked.forall { case (_, ws) =>
      grams(ws).forall(t => !evalGrams.contains(t._2)) },
      "an eval 8-gram survives the mask apply")
  }

  test("q123 batch triage recomposes from the q95/q121/q36/q127 outputs") {
    val v = SparkEntry.queries("q95_incremental_dedup")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val nb = SparkEntry.queries("q121_batch_novelty")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    val mv = SparkEntry.queries("q127_incremental_media")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val q = SparkEntry.queries("q36_quality_score")(spark, d).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getInt(1).toLong),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    val expected = v.groupBy { case (id, ve) =>
        (ve, nb.getOrElse(id, "none"), mv(id)) }
      .view.mapValues { xs =>
        val toks = xs.flatMap(x => q.get(x._1).flatMap(_._1)).sum
        val scores = xs.flatMap(x => q.get(x._1).flatMap(_._2))
        (xs.size.toLong, toks, scores.min, scores.max)
      }.toMap
    // non-vacuous: more than one triage cell at this SF
    assert(expected.size > 1)
    val got = SparkEntry.queries("q123_batch_triage")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got == expected)
  }

  test("q125 media near-dup matches a driver recomputation; edits flip O(edit) bits") {
    // independent fingerprint: plain Scala over the raw text bytes (the
    // r15 skip-gram sketch — 120 buckets packed as two 60-bit longs)
    def fpOf(bytes: Array[Byte]): (Long, Long) = {
      val hist = new Array[Long](120)
      var i = 0
      while (i + 5 < bytes.length) {
        val g = (bytes(i) & 0xffL) * 16777216L +
          (bytes(i + 1) & 0xffL) * 65536L +
          (bytes(i + 3) & 0xffL) * 256L + (bytes(i + 5) & 0xffL)
        hist((((g * 2654435761L) >>> 16) % 120L).toInt) += 1
        i += 1
      }
      val fp0 = (0 until 60).foldLeft(0L)((fp, j) =>
        if ((hist(j) & 1L) == 1L) fp | (1L << j) else fp)
      val fp1 = (60 until 120).foldLeft(0L)((fp, j) =>
        if ((hist(j) & 1L) == 1L) fp | (1L << (j - 60)) else fp)
      (fp0, fp1)
    }
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val texts = graft.util.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.length >= 125)
    val fps = texts.map { case (id, t) => id -> fpOf(t.getBytes("UTF-8")) }
    // ground truth: all pairs at hamming <= 4 (exhaustive at sf0.001 —
    // the banded join must find EXACTLY these: pigeonhole over 5x24-bit
    // bands guarantees a shared band at hamming <= 4, so banding loses
    // nothing the verify would keep)
    val expected = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = ham(fa, fb) if h <= 4
    } yield (ia, ib, h)).sortBy(p => (p._1, p._2)).toSeq
    val got = SparkEntry.queries("q125_media_neardup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == expected)

    // the perceptual property, pinned directly: a small byte edit moves
    // the fingerprint a small hamming distance. A position-0 edit is
    // sampled by exactly ONE window (starts p−1/p−3/p−5 don't exist),
    // which toggles at most two bucket parities (old gram out, new gram
    // in) — the general interior bound is 8 (4 windows × 2),
    // property-pinned in PureFunctionProps; the corpus background sits
    // near the 120-bit binomial mean (~60)
    val (_, t0) = texts.head
    val edited = ("Z" + t0.substring(1)).getBytes("UTF-8") // head edit -> 1 window
    val dEdit = ham(fpOf(t0.getBytes("UTF-8")), fpOf(edited))
    assert(dEdit <= 2, s"head-byte edit moved the fingerprint $dEdit bits")
    val back = fps.map(_._2)
    val med = (for (a <- back.take(20); b <- back.drop(20).take(20))
      yield ham(a, b)).sorted
    assert(med(med.length / 2) >= 30,
      s"background median hamming ${med(med.length / 2)} — fingerprint lost discrimination")

    // q128: cluster labels equal a driver union-find over the same
    // verified pairs (root = component minimum, the house convention)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    expected.foreach { case (a0, b0, _) =>
      parent.getOrElseUpdate(a0, a0); parent.getOrElseUpdate(b0, b0)
      val (ra, rb) = (find(a0), find(b0))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
        parent(hi) = lo }
    }
    val expLabels = parent.keySet.toSeq.sorted.map(n => (n, find(n)))
    val gotLabels = SparkEntry.queries("q128_media_clusters")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotLabels == expLabels)
  }

  test("q129 media calibration matches a driver recomputation; hit_rate is 1.0 inside the verify radius") {
    // the independent fingerprint from the q125 test, duplicated here so
    // the two recomputations cannot share a bug with the engine
    def fpOf(bytes: Array[Byte]): (Long, Long) = {
      val hist = new Array[Long](120)
      var i = 0
      while (i + 5 < bytes.length) {
        val g = (bytes(i) & 0xffL) * 16777216L +
          (bytes(i + 1) & 0xffL) * 65536L +
          (bytes(i + 3) & 0xffL) * 256L + (bytes(i + 5) & 0xffL)
        hist((((g * 2654435761L) >>> 16) % 120L).toInt) += 1
        i += 1
      }
      val fp0 = (0 until 60).foldLeft(0L)((fp, j) =>
        if ((hist(j) & 1L) == 1L) fp | (1L << j) else fp)
      val fp1 = (60 until 120).foldLeft(0L)((fp, j) =>
        if ((hist(j) & 1L) == 1L) fp | (1L << (j - 60)) else fp)
      (fp0, fp1)
    }
    def bandKeys(f: (Long, Long)): Seq[Long] = Seq(
      f._1 & 0xFFFFFF, (f._1 >> 24) & 0xFFFFFF,
      ((f._1 >> 48) & 0xFFF) | ((f._2 & 0xFFF) << 12),
      (f._2 >> 12) & 0xFFFFFF, (f._2 >> 36) & 0xFFFFFF)
    val fps = graft.util.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.length >= 125)
      .map { case (id, t) => id -> fpOf(t.getBytes("UTF-8")) }
    // the fixed probe panel: smallest (md5Long(doc_id), doc_id) — the
    // fixedPanel mirror, over media fingerprints
    val panel = fps.sortBy { case (id, _) => (h1(id.toString), id) }
      .take(graft.queries.TrainingOps.ProbePanelSize)
    val expected = (for {
      (qid, qf) <- panel; (id, f) <- fps if id != qid
    } yield {
      val h = java.lang.Long.bitCount(qf._1 ^ f._1) +
        java.lang.Long.bitCount(qf._2 ^ f._2)
      val hit = bandKeys(qf).zip(bandKeys(f)).exists(p => p._1 == p._2)
      (h, hit)
    }).groupBy(_._1).map { case (h, rows) =>
      (h.toLong, rows.size.toLong, rows.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
      .map { case (h, n, k) => (h, n, k, k.toDouble / n.toDouble) }
    val got = SparkEntry.queries("q129_media_calibration")(spark, d)
      .collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    // the pigeonhole claim, MEASURED: every pooled radius inside the
    // verify threshold surfaces at rate exactly 1.0
    assert(got.filter(_._1 <= 4).forall(_._4 == 1.0),
      "banding missed a pair inside the hamming-4 radius")
    // and the panel saw pairs on both sides of the radius (the
    // calibration is vacuous otherwise)
    assert(got.exists(_._1 <= 4) && got.exists(_._1 > 4), got.take(6).toString)
  }

  test("q131 media-index stats match a driver recomputation; candidate_pairs predicts the q125 join") {
    def fpOf(bytes: Array[Byte]): (Long, Long) = {
      val hist = new Array[Long](120)
      var i = 0
      while (i + 5 < bytes.length) {
        val g = (bytes(i) & 0xffL) * 16777216L +
          (bytes(i + 1) & 0xffL) * 65536L +
          (bytes(i + 3) & 0xffL) * 256L + (bytes(i + 5) & 0xffL)
        hist((((g * 2654435761L) >>> 16) % 120L).toInt) += 1
        i += 1
      }
      val fp0 = (0 until 60).foldLeft(0L)((fp, j) =>
        if ((hist(j) & 1L) == 1L) fp | (1L << j) else fp)
      val fp1 = (60 until 120).foldLeft(0L)((fp, j) =>
        if ((hist(j) & 1L) == 1L) fp | (1L << (j - 60)) else fp)
      (fp0, fp1)
    }
    def bandKeys(f: (Long, Long)): Seq[Long] = Seq(
      f._1 & 0xFFFFFF, (f._1 >> 24) & 0xFFFFFF,
      ((f._1 >> 48) & 0xFFF) | ((f._2 & 0xFFF) << 12),
      (f._2 >> 12) & 0xFFFFFF, (f._2 >> 36) & 0xFFFFFF)
    def pct7(vs: Seq[Long], p: Double): Double = {
      val s0 = vs.sorted
      val h = (s0.length - 1) * p
      val l = math.floor(h).toInt
      if (l + 1 >= s0.length) s0.last.toDouble
      else s0(l) + (h - l) * (s0(l + 1) - s0(l))
    }
    val fps = graft.util.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.length >= 125)
      .map { case (id, t) => id -> fpOf(t.getBytes("UTF-8")) }
    val occ = fps.flatMap { case (_, f) =>
      bandKeys(f).zipWithIndex.map { case (k, bk) => (bk, k) } }
      .groupBy(identity).view.mapValues(_.size.toLong).values.toSeq
    val candPairs = occ.map(c => c * (c - 1) / 2).sum
    // the r17 size-class posture: floor(log2) as the exact bit length,
    // classes of n and n+8 deduplicated (Multimodal.sizeClassesOf)
    val nByDoc = graft.util.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) ->
        r.getString(1).getBytes("UTF-8").length.toLong)
      .filter(_._2 >= 125).toMap
    def scls(n: Long): Seq[Long] =
      Seq(63L - java.lang.Long.numberOfLeadingZeros(n),
        63L - java.lang.Long.numberOfLeadingZeros(n + 8)).distinct
    val occSc = fps.flatMap { case (id, f) =>
      for (sc <- scls(nByDoc(id)); (k, bk) <- bandKeys(f).zipWithIndex)
        yield (sc, bk, k) }
      .groupBy(identity).view.mapValues(_.size.toLong).values.toSeq
    val candPairsSc = occSc.map(c => c * (c - 1) / 2).sum
    val expected = Map(
      "bucket_count" -> occ.size.toDouble,
      "bucket_max" -> occ.max.toDouble,
      "bucket_p99" -> pct7(occ, 0.99),
      "candidate_pairs" -> candPairs.toDouble,
      "candidate_pairs_sized" -> candPairsSc.toDouble,
      "docs_per_bucket_mean" -> fps.size.toDouble * 5.0 / occ.size,
      "media_docs" -> fps.size.toDouble)
    val got = SparkEntry.queries("q131_media_index_stats")(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    for ((k, v) <- expected)
      assert(math.abs(got(k) - v) < 1e-9, s"$k: got ${got(k)} want $v")
    // the PREDICTION claim: candidate_pairs equals the exact
    // pre-distinct row count of q125's band self-join (each unordered
    // in-bucket pair appears exactly once per shared (bk, bkey))
    val joinRows = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      k <- 0 until 5 if bandKeys(fa)(k) == bandKeys(fb)(k)
    } yield 1).size.toLong
    assert(candPairs == joinRows,
      s"candidate_pairs $candPairs != band-join rows $joinRows")
  }

  test("q126 media×lexical tier agreement: all three tiers on a constructed corpus") {
    import spark.implicits._
    // a corpus exercising each disagreement cell BY CONSTRUCTION:
    //  - docs 1,2: exact duplicates → jacc 1.0 AND hamming 0 → 'both';
    //  - doc 3 = doc 1 with ONE of 60 words replaced by a 40-char blob
    //    → 57/63 shared shingles (jacc 0.90 ≥ 0.8, LSH-caught) while
    //    ~80 changed skip-gram instances blow the parity sketch past
    //    hamming 4 → 'lexical_only' (token overlap the byte profile
    //    does not see);
    //  - docs 4,5: TWO-word payloads over the 125-byte floor, one char
    //    apart — no 3-shingle exists, the lexical tier structurally
    //    cannot evaluate them, the byte tier reads hamming <= 2 (the
    //    last byte is sampled by exactly one window) → 'media_only';
    //  - doc 6: unrelated (absent from every pair list).
    val words = (0 until 60).map(i => s"w${i}alpha")
    val a = words.mkString(" ")
    val b = words.updated(30, "x" * 40).mkString(" ")
    val short1 = "a" * 62 + " " + "b" * 62
    val short2 = "a" * 62 + " " + "b" * 61 + "c"
    val unrel = "completely unrelated content that clears the skip-gram " +
      "floor easily with many distinct words here and still more padding " +
      "words to pass the one twenty five byte minimum"
    val dir = java.nio.file.Files.createTempDirectory("graft-tieragree-")
      .toFile.getAbsolutePath
    Seq((1L, a, "en", "s1", a.length.toLong),
      (2L, a, "en", "s1", a.length.toLong),
      (3L, b, "en", "s1", b.length.toLong),
      (4L, short1, "en", "s1", short1.length.toLong),
      (5L, short2, "en", "s1", short2.length.toLong),
      (6L, unrel, "en", "s1", unrel.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q126_media_tier_agreement")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4)).toMap
    assert(got == Map(
      (1L, 2L) -> "both",
      (1L, 3L) -> "lexical_only", (2L, 3L) -> "lexical_only",
      (4L, 5L) -> "media_only"), got.toString)
  }
}
