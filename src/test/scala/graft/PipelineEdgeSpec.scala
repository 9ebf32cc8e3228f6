package graft

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-corpus edge cases for the round-7 pipeline operators: null
  * and empty texts, duplicate and normalization-equivalent documents, an
  * eval-split member with a contaminated twin, a pid bucket boundary
  * (doc_id 1023/1024), and a group smaller than the sample size k. The
  * driver corpus is clean on all of these, so without this spec a
  * regression in the edge handling would pass the oracle gate unnoticed.
  */
class PipelineEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-edge-")
      .toFile.getAbsolutePath
    Seq(
      (0L, "alpha beta gamma alpha beta gamma", "en", "src1", 33L), // eval split
      (1L, "alpha beta gamma alpha beta gamma", "en", "src1", 33L), // contaminated twin
      (2L, null.asInstanceOf[String], "de", "src3", 0L),
      (3L, "", "de", "src3", 0L),
      (4L, "Word! word", "fr", "src4", 10L), // normalizes to "word word"
      (5L, "word word", "fr", "src5", 9L), // its normalized duplicate
      (50L, "delta epsilon zeta eta", "en", "src2", 22L), // eval split
      (1023L, "x y z", "zh", "src6", 5L), // last doc of pid bucket 0
      (1024L, "x q", "zh", "src7", 3L)) // first doc of pid bucket 1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir).collect()

  test("q65: the duplicated train doc is flagged, eval docs never surface") {
    val rows = run("q65_decontaminate").map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.contains(1L) && rows(1L) >= 1L) // shares every shingle with eval doc 0
    assert(!rows.contains(0L) && !rows.contains(50L))
  }

  test("q66: null dropped, empty counts one token, bucket boundary exact") {
    // doc order 0,1,3,4,5,50,1023,1024 (doc 2 is null); token counts
    // 6,6,1,2,2,4,3,2 — cumulative-before 0,6,12,13,15,17,21,24: one
    // 256-token sequence holding all 8 docs, 26 tokens. doc 1024 starts
    // pid bucket 1, so its count arrives through the offsets table.
    val rows = run("q66_sequence_pack")
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (0L, 8L, 26L, 0L, 1024L))
  }

  test("q70: byte-different but normalization-equal docs share a group") {
    val rows = run("q70_normalized_dedup")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dups = rows.filter(_._2 > 1)
    // {0,1} identical, {4,5} equal after lower/punct/ws normalization
    assert(dups.map(d => (d._2, d._3)).toSet == Set((2L, 0L), (2L, 4L)))
  }

  test("q71: a group smaller than k yields exactly its size in ranks") {
    val rows = run("q71_per_group_sample")
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val zh = rows.filter(_._1 == "zh")
    assert(zh.map(_._2).sorted.toSeq == Seq(1, 2))
    assert(zh.map(_._3).toSet == Set(1023L, 1024L))
    // no group exceeds k
    assert(rows.groupBy(_._1).values.forall(_.length <= 5))
  }

  test("q72: null text fails the length stage, counts cascade") {
    val r = run("q72_filter_funnel").head
    // 9 docs total; none has >= 30 tokens -> funnel collapses after stage 1
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (9L, 0L, 0L, 0L))
  }

  test("q76: identical docs contain each other fully") {
    val rows = run("q76_containment")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val pair = rows.find(t => t._1 == 0L && t._2 == 1L)
    assert(pair.exists(t => t._3 == 1.0 && t._4 == 1.0), rows.toSeq)
  }

  test("q73: a corpus missing centroid ids fails loudly, never mislabels") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-edge-emb-")
      .toFile.getAbsolutePath
    // only 10 vectors — vec_ids 10..15 absent, so positional cids would
    // silently diverge from the oracle's vec_id labels without the guard
    (0L until 10L).map(i => (i, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("q73_vq_assign")(spark, d)
    }
    assert(e.getMessage.contains("vec_id 0..15"), e.getMessage)
  }

  test("q67: a source outside the src<N> contract aborts loudly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-edge-src-")
      .toFile.getAbsolutePath
    // DuckDB's strict cast would error on 'web1'; without the Spark-side
    // raise_error the non-ANSI cast NULLs silently and the engines diverge
    Seq((0L, "alpha", "en", "web1", 5L), (1L, "beta", "en", "src1", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val e = intercept[Exception] {
      SparkEntry.queries("q67_domain_mix")(spark, d).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("src<N> corpus contract")), e.toString)
  }

  test("q77: known-answer PII detection and redaction (the gate corpus has no PII)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-edge-pii-")
      .toFile.getAbsolutePath
    // the oracle gate only proves ENGINE PARITY — a regex that matched
    // nothing would still hash-match. These vectors pin that the
    // patterns actually detect and redact.
    Seq(
      (0L, "mail a@b.co and x.y+z@mail.example.org, server 10.0.255.1, call +4915123456789 or 555-123-4567", "en", "src1", 90L),
      (1L, "no pii here, just 1.2.3 and a@b (not a match)", "en", "src1", 40L),
      (2L, null.asInstanceOf[String], "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("q77_pii_scrub")(spark, d).collect()
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert((r0.getInt(1), r0.getInt(2), r0.getInt(3)) == (2, 1, 2),
      s"counts: ${r0.toString}") // (n_email, n_ip, n_phone): both +49... and 555-123-4567 are phones
    val expectedRedacted = "mail <EMAIL> and <EMAIL>, server <IP>, call <PHONE> or <PHONE>"
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(expectedRedacted.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r0.getString(4) == md5hex, s"redaction hash: ${r0.getString(4)}")
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert((r1.getInt(1), r1.getInt(2), r1.getInt(3)) == (0, 0, 0), r1.toString)
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.isNullAt(1) && r2.isNullAt(4), r2.toString) // NULL text propagates
  }

  test("q67/q69: null and empty texts neither crash nor skew the counts") {
    // q67 samples over ALL 9 docs (no text dependence)
    assert(run("q67_domain_mix").map(_.getLong(2)).sum == 9L)
    // q69 counts the empty doc's single empty-string token like the oracle
    val vocab = run("q69_vocab_topk").map(r => r.getString(0) -> r.getLong(1)).toMap
    // "word" = 1 from doc 4 ("Word!" is a distinct token) + 2 from doc 5
    assert(vocab("alpha") == 4L && vocab("word") == 3L && vocab.contains(""))
  }

  test("q86: null/sub-bigram docs drop; hand-computed scores; identical docs tie") {
    val got = run("q86_lm_score")
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 2 (null) and doc 3 (empty → one token, no bigram) never surface
    assert(!got.contains(2L) && !got.contains(3L))
    // identical docs score identically (the model is corpus-global)
    assert(got(0L) == got(1L))
    // hand-computed: doc 1023 "x y z" → (x,y): c12=1, c1(x)=2 (docs
    // 1023+1024) → p=1/2; (y,z): c12=1, c1(y)=1 → p=1 ⇒ mean 0.75.
    // doc 1024 "x q" → one bigram at p=1/2.
    assert(got(1023L) == ((2L, 0.75)) && got(1024L) == ((1L, 0.5)))
  }

  test("q87: every doc (null text included) gets a shard; positions dense; rerun-stable") {
    val a = run("q87_shard_layout").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.length == 9 && a.map(_._1).toSet.contains(2L)) // null-text doc too
    a.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.size.toLong))
    }
    // the layout is a pure function of doc ids — rerun-identical
    val b = run("q87_shard_layout").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("q100: hand-computed Gopher rules — bullets, ellipsis runs, stopword gate, empty text") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-gopher-")
      .toFile.getAbsolutePath
    Seq(
      (0L, "- one\n- two\nplain"), // 2/3 bullet lines
      (1L, "wait... more...\nok"), // 1/2 ellipsis lines; two '...' runs
      (2L, null.asInstanceOf[String]), // dropped
      (3L, ""), // one empty token, one empty line
      (4L, "the cat sat with the dog and that hat"), // 4 distinct stopwords
      (5L, "a…\nb")) // unicode ellipsis: line end AND symbol count
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("q100_gopher_rules")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 1L, 3L, 4L, 5L))
    def frac(id: Long, i: Int) = rows(id).getDouble(i)
    // columns: doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    //          ellipsis_frac, alpha_frac, n_stop, shape_pass, passes —
    //          the pass flags asserted BY NAME (r11 added shape_pass at
    //          index 8; a positional getInt(8) would silently retarget)
    def flag(id: Long, name: String) =
      rows(id).getInt(rows(id).fieldIndex(name))
    assert(rows(0L).getLong(1) == 5L && frac(0L, 4) == 2.0 / 3.0)
    assert(frac(0L, 6) == 3.0 / 5.0) // "-" tokens carry no letter
    assert(frac(1L, 3) == 2.0 / 3.0) // two '...' runs over 3 words
    assert(frac(1L, 5) == 0.5)
    assert(rows(3L).getLong(1) == 1L && frac(3L, 2) == 0.0 &&
      flag(3L, "passes") == 0)
    assert(rows(4L).getLong(7) == 4L) // the, with, and, that
    assert(frac(5L, 3) == 0.5 && frac(5L, 5) == 0.5) // U+2026 is 1 char
    // none passes the 50-word floor — on EITHER flag: shape_pass (the
    // release gate) and passes (the full audit) both gate on n_words
    rows.keySet.foreach { id =>
      assert(flag(id, "shape_pass") == 0 && flag(id, "passes") == 0, id)
    }
  }

  test("q105: chunk boundaries hand-computed — stride overlap, short tails, 1-token doc") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-chunk-")
      .toFile.getAbsolutePath
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    Seq((0L, toks(100)), (1L, toks(64)), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q105_chunk_windows")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 100 tokens → starts 0/48/96 → chunk sizes 64, 52, 4
    assert(got((0L, 0L)) == 64L && got((0L, 1L)) == 52L && got((0L, 2L)) == 4L)
    // 64 tokens → starts 0/48 → sizes 64, 16 (the 16-token overlap tail)
    assert(got((1L, 0L)) == 64L && got((1L, 1L)) == 16L)
    assert(got((2L, 0L)) == 1L) // single token: one chunk
    assert(got((3L, 0L)) == 1L) // empty text: one empty-token chunk
    assert(got.size == 7)
  }

  test("q82: byte-identical twins cluster; exactly one keeps, the smaller id") {
    val rows = run("q82_dedup_keep_best")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byDoc = rows.map(r => r._1 -> r).toMap
    // docs 0 and 1 are byte-identical → same cluster, equal quality
    assert(byDoc.contains(0L) && byDoc.contains(1L))
    assert(byDoc(0L)._2 == byDoc(1L)._2 && byDoc(0L)._3 == byDoc(1L)._3)
    // the tie breaks to the smaller id: 0 keeps, 1 drops
    assert(byDoc(0L)._4 == 1L && byDoc(1L)._4 == 0L)
    // every cluster keeps exactly one member
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._4).sum == 1L, g.mkString(","))
    }
  }
}
