package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing

import java.nio.file.Files

/** Column-level hashing helpers (F1/A2/F4 + the md5Long base hashes used by
  * minhash/simhash/LSH). Runs on the shared local session.
  */
class HashingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("simpleHash strips ALL whitespace then md5s (F1, utils.rs:12-17)") {
    val rows = Seq("a b\tc", "  a\n\nbc ", "abc", "ab c\r\n").toDF("t")
      .select(Hashing.simpleHash($"t").as("h")).distinct().collect()
    assert(rows.map(_.getString(0)).toSet == Set(md5Hex("abc")))
  }

  test("simpleHash is whitespace-placement-invariant (randomized)") {
    val rnd = new scala.util.Random(42)
    val base = "contract Foo { function bar() public {} }"
    val variants = (1 to 25).map { _ =>
      base.flatMap { ch =>
        val pad = Seq(" ", "\t", "\n", "")(rnd.nextInt(4))
        if (ch == ' ') pad + " " + pad else ch.toString
      }
    }
    val hs = variants.toDF("t").select(Hashing.simpleHash($"t")).distinct().collect()
    assert(hs.length == 1)
    assert(hs.head.getString(0) == md5Hex(base.replaceAll("\\s+", "")))
  }

  test("multisetHash is element-order-insensitive (A2, plain_contract.rs:169-177)") {
    val a = Seq(("g", "h1"), ("g", "h2"), ("g", "h3")).toDF("k", "h")
    val b = Seq(("g", "h3"), ("g", "h1"), ("g", "h2")).toDF("k", "h")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(Hashing.multisetHash($"h").as("mh")).collect().head.getString(1)
    assert(agg(a) == agg(b))
    assert(agg(a) == md5Hex("h1h2h3")) // sorted concat
  }

  test("multisetDigest: order/partitioning-insensitive, element-sensitive, hand-computable") {
    // the MANIFEST-TIER digest (O(1) buffer): same multiset → same digest
    // under any row order and partitioning; one changed element → a
    // different digest; and the value is exactly
    // md5(sum(md5Long(e)) + ":" + sum(md5Long2(e))) — the DuckDB mirror.
    val es = (1 to 500).map(i => s"elem$i")
    def digest(elems: Seq[String], parts: Int): String =
      elems.map(("g", _)).toDF("k", "e").repartition(parts)
        .groupBy("k").agg(Hashing.multisetDigest($"e").as("d"))
        .collect().head.getString(1)
    val d1 = digest(es, 1)
    assert(digest(scala.util.Random.shuffle(es), 16) == d1)
    assert(digest(es.updated(3, "elemX"), 16) != d1)
    assert(digest(es :+ "elem1", 16) != d1) // multiset, not set: multiplicity counts
    def half(e: String, from: Int): BigInt =
      BigInt(md5Hex(e).substring(from, from + 15), 16)
    val s1 = es.map(half(_, 0)).sum
    val s2 = es.map(half(_, 16)).sum
    assert(d1 == md5Hex(s"$s1:$s2"))
  }

  test("rowIdTrusted equals rowId on whitespace-free key parts") {
    val df = Seq((7L, 2), (123L, 9)).toDF("a", "b")
    val both = df.select(Hashing.rowId($"a", lit("|"), $"b").as("strict"),
      Hashing.rowIdTrusted($"a", lit("|"), $"b").as("trusted")).collect()
    assert(both.forall(r => r.getString(0) == r.getString(1)))
  }

  test("corpus invariant: no Unicode-only whitespace in hashed text columns") {
    // Spark strips (?U)\s while every DuckDB oracle keeps RE2's ASCII \s —
    // equal hashes rely on the corpus containing no non-ASCII whitespace.
    // ENFORCE the invariant (ADVICE r3) instead of asserting it in a
    // comment; checked at the driver's own gate scale (sf0.01).
    val uniWs = "[\\u00a0\\u0085\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.01")
    assert(docs.filter($"text".rlike(uniWs)).count() == 0)
    val ev = graft.util.Tables.events(spark, "/root/testdata/sf0.01")
    assert(ev.filter($"event_type".rlike(uniWs) || $"props".rlike(uniWs))
      .count() == 0)
  }

  test("rowId = simple_hash of concatenated key parts (F4, functions.rs:31)") {
    val r = Seq((7L, 2)).toDF("a", "b")
      .select(Hashing.rowId($"a", lit("|"), $"b")).collect().head.getString(0)
    assert(r == md5Hex("7|2"))
    // whitespace in a key part is stripped before hashing, like the
    // reference's simple_hash-derived ids (utils.rs:12-17)
    val ws = Seq(("contracts/My Token.sol", "0xdeadbeef")).toDF("f", "sel")
      .select(Hashing.rowId($"f", $"sel")).collect().head.getString(0)
    assert(ws == md5Hex("contracts/MyToken.sol0xdeadbeef"))
  }

  test("simpleHash strips Unicode whitespace like the Rust regex \\s (NBSP)") {
    val r = Seq("a b c", "abc").toDF("t")
      .select(Hashing.simpleHash($"t")).distinct().collect()
    assert(r.map(_.getString(0)).toSet == Set(md5Hex("abc")))
  }

  test("md5Long/md5Long2 are non-negative 60-bit and independent") {
    val rows = (1 to 200).map(_.toString).toDF("t")
      .select(Hashing.md5Long($"t").as("h1"), Hashing.md5Long2($"t").as("h2"))
      .collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < (1L << 60)))
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < (1L << 60)))
    // distinct inputs spread across the range (sanity: no degenerate hashing)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.map(r => r.getLong(0) == r.getLong(1)).count(identity) == 0)
  }

  test("native md5Long equals the conv(substring(md5)) oracle form (randomized)") {
    // graft_md5long reads digest bytes directly; the DuckDB oracle (and
    // the shared index's hex-sliced h1/h2) parse 15 hex chars — pin the
    // bit-equivalence on random strings incl. unicode and empties
    val rnd = new scala.util.Random(11)
    val strs = (1 to 500).map { i =>
      if (i % 47 == 0) ""
      else if (i % 13 == 0) s"héllo- -${rnd.nextLong()}"
      else rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString
    }
    val df = strs.toDF("t").select(
      Hashing.md5Long($"t").as("n1"),
      Hashing.md5Long2($"t").as("n2"),
      conv(substring(md5($"t"), 1, 15), 16, 10).cast("long").as("c1"),
      conv(substring(md5($"t"), 17, 15), 16, 10).cast("long").as("c2"))
    val bad = df.filter($"n1" =!= $"c1" || $"n2" =!= $"c2").count()
    assert(bad == 0)
  }

  test("decSum sums exactly in decimal (no FP drift) and returns double") {
    val vals = Seq.fill(1000)(0.1)
    val s = vals.toDF("v").agg(Hashing.decSum($"v").as("s")).collect().head.getDouble(0)
    assert(s == 100.0) // naive double summation would give 99.9999999999986
  }

  test("simhash60 kernel: null/empty token arrays yield NULL, never NPE or all-bits") {
    assert(Hashing.simhash60(null) == null)
    assert(Hashing.simhash60(Array.empty[String]) == null)
    // a real array majority-votes over DISTINCT tokens: duplicates don't
    // change the fingerprint, and a single token's fingerprint is its
    // own 60-bit hash (every bit count is 0 or 1, 2·c ≥ 1 ⟺ c = 1...
    // plus the tie bits where 2·0 ≥ 0 fails only for n ≥ 1 when c = 0)
    val one = Hashing.simhash60(Array("foo"))
    assert(one != null && one == Hashing.simhash60(Array("foo", "foo", "foo")))
    assert((one.longValue() >>> 60) == 0L) // 60-bit domain
  }

  test("q30 survives a null-text document end-to-end (dropped, not NPE)") {
    // the guard the advisor flagged: a null text reaches the UDF as a
    // null token array under the old form — pin the query-level behavior
    // on a tiny corpus containing one
    val dir = Files.createTempDirectory("graft-nulltext-").toFile.getAbsolutePath
    try {
      Seq(
        (1L, "alpha beta gamma", "en", "web", 16L),
        (2L, null.asInstanceOf[String], "en", "web", 0L),
        (3L, "delta epsilon", "en", "web", 13L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = SparkEntry.queries("q30_simhash")(spark, dir).collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L)) // doc 2 dropped
      assert(out.forall(!_.isNullAt(1)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
