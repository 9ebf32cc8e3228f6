package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_decsum (int128 exact decimal sum) must be VALUE-IDENTICAL to the
  * built-in sum(DECIMAL(20,6)) cast to double — same exact integer total,
  * same single decimal→double rounding — under nulls, negatives,
  * carry-heavy magnitudes and forced partial/merge paths.
  */
class DecimalMicrosSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def builtin(c: org.apache.spark.sql.Column) =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(20, 6))).cast("double")

  private def custom(c: org.apache.spark.sql.Column) =
    call_function("graft_decsum", c.cast(org.apache.spark.sql.types.DecimalType(20, 6)))

  test("matches built-in decimal sum on randomized data (nulls, negatives, merges)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { i =>
      val v: java.lang.Double =
        if (i % 97 == 0) null
        else (rnd.nextDouble() - 0.5) * 2e7 // ±1e7, 6+ digit magnitudes
      (i % 13).toLong -> v
    }
    // 16 partitions force map-side partials and the int128 MERGE path
    val df = rows.toDF("k", "v").repartition(16)
    val got = df.groupBy("k")
      .agg(builtin($"v").as("ref"), custom($"v").as("fast"))
      .collect()
    assert(got.length == 13)
    got.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"k=${r.getLong(0)}: builtin=${r.getDouble(1)} int128=${r.getDouble(2)}")
    }
  }

  test("global aggregate (no grouping keys) — the null-INPUT_ROW codegen path") {
    import spark.implicits._
    // HashAggregate's no-keys result projection has a null ctx.INPUT_ROW;
    // a CodegenFallback final conversion NPEs there (regression test)
    val s = Seq.fill(1000)(0.1).toDF("v")
      .agg(custom($"v").as("s")).collect().head.getDouble(0)
    assert(s == 100.0)
  }

  test("all-null group yields NULL; lo-word carry crosses correctly") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Double)]((1L, null), (1L, null)).toDF("k", "v")
    val r = df.groupBy("k").agg(custom($"v").as("s")).collect().head
    assert(r.isNullAt(1))

    // magnitudes chosen so the unsigned lo word wraps during accumulation:
    // 12 × 9e12 micros ≈ 1.08e14 — small for int128, but summing mixed
    // signs walks lo through wraparound repeatedly
    val vals = Seq(9e6, -9e6, 9e6, 9e6, -9e6, 9e6, 9e6, 9e6, -9e6, 9e6, 9e6, 9e6)
    val df2 = vals.map(v => (1L, v)).toDF("k", "v").repartition(5)
    val r2 = df2.groupBy("k").agg(builtin($"v").as("ref"), custom($"v").as("fast"))
      .collect().head
    assert(java.lang.Double.compare(r2.getDouble(1), r2.getDouble(2)) == 0)
  }

  test("double fast path matches the decimal-cast path on rounding boundaries") {
    import spark.implicits._
    // adversarial inputs for DoubleToMicros: exact half-micro ties (the
    // HALF_UP vs half-even divergence the guard must catch), values whose
    // double*1e6 lands just off a tie, sub-micro magnitudes, negatives,
    // and large-but-in-domain magnitudes past the 4e12-micros fast-path
    // cutoff — every one must equal CAST(x AS DECIMAL(20,6)) semantics
    val ties = Seq(
      5e-7, -5e-7, 1.5e-6, -1.5e-6, 2.5e-6, 0.0000015,
      1.0000005, -1.0000005, 123.4567895, -123.4567895,
      0.49999999999999994, 1e-7, -1e-7, 0.9999999, 123456.789012,
      4.9e12, -4.9e12, 9.2e12, 0.1 + 0.2, 1.0 / 3.0, math.Pi * 1e5)
    val df = ties.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
    val got = df.agg(
      builtin($"v").as("ref"),
      call_function("graft_decsum", $"v").as("fast")).collect().head
    assert(java.lang.Double.compare(got.getDouble(0), got.getDouble(1)) == 0,
      s"builtin=${got.getDouble(0)} fast=${got.getDouble(1)}")
    // and per-row equality, not just in aggregate
    ties.foreach { v =>
      val r = Seq((1L, v)).toDF("k", "v")
        .agg(builtin($"v"), call_function("graft_decsum", $"v")).collect().head
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"v=$v: builtin=${r.getDouble(0)} fast=${r.getDouble(1)}")
    }
    // NaN / infinities behave like the legacy cast: NULL contribution
    val weird = Seq[(Long, java.lang.Double)](
      (1L, Double.NaN), (1L, Double.PositiveInfinity),
      (1L, Double.NegativeInfinity), (1L, null)).toDF("k", "v")
    val w = weird.agg(builtin($"v"), call_function("graft_decsum", $"v")).collect().head
    assert(w.isNullAt(0) && w.isNullAt(1))
    val mixed = Seq[(Long, java.lang.Double)](
      (1L, Double.NaN), (1L, 2.5)).toDF("k", "v")
    val m = mixed.agg(builtin($"v"), call_function("graft_decsum", $"v")).collect().head
    assert(java.lang.Double.compare(m.getDouble(0), m.getDouble(1)) == 0)
  }

  test("non-double numeric inputs keep the original cast-outside contract") {
    import spark.implicits._
    // the pre-fast-path decSum accepted any numeric via its
    // DECIMAL(20,6) cast; the widened aggregate must preserve that
    val longs = Seq((1L, 3L), (1L, 4L), (1L, 5L)).toDF("k", "v")
    val r = longs.agg(
      sum($"v".cast(org.apache.spark.sql.types.DecimalType(20, 6))).cast("double").as("ref"),
      call_function("graft_decsum", $"v").as("got")).collect().head
    assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
    val ints = Seq((1L, 7), (1L, -2)).toDF("k", "v")
    val r2 = ints.agg(call_function("graft_decsum", $"v")).collect().head
    assert(r2.getDouble(0) == 5.0)
  }

  test("per-row values beyond int64 micros sum exactly (full DECIMAL(20,6) domain)") {
    import spark.implicits._
    // DECIMAL(20,6) admits |value| up to ~1e14 = 1e20 micros > int64; the
    // r5 aggregate threw a domain error there — r6's (hi, lo) int128
    // per-row conversion must instead match the built-in exactly across
    // the whole domain, including carry interplay between wide rows and
    // ordinary ones and an all-wide negative group
    val wide = Seq(
      "10000000000000.000000",   // 1e13 → 1e19 micros, past int64
      "-99999999999999.999999",  // the (20,6) negative extreme
      "99999999999999.999999",   // the (20,6) positive extreme
      "9223372036854.775807",    // exactly Long.MaxValue micros
      "9223372036854.775808",    // one micro past Long.MaxValue
      "-9223372036854.775809",   // one micro past Long.MinValue
      "0.000001", "123456.789012", "-0.5")
    val df = wide.zipWithIndex.map { case (v, i) =>
      (i.toLong % 3, new java.math.BigDecimal(v)) }.toDF("k", "v")
      .select($"k", $"v".cast(org.apache.spark.sql.types.DecimalType(20, 6)).as("v"))
      .repartition(4) // force partial/merge through the int128 path
    val got = df.groupBy("k")
      .agg(sum($"v").cast("double").as("ref"),
        call_function("graft_decsum", $"v").as("fast"))
      .collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
        s"k=${r.getLong(0)}: builtin=${r.getDouble(1)} int128=${r.getDouble(2)}")
    }

    // DOUBLE inputs past int64 micros but inside (20,6): same exactness
    val dbl = Seq[(Long, java.lang.Double)](
      (1L, 5e13), (1L, -1.23456e13), (1L, 42.5),
      (1L, 9.9e13), (1L, -9.9e13))
    val rd = dbl.toDF("k", "v").groupBy("k")
      .agg(builtin($"v").as("ref"), call_function("graft_decsum", $"v").as("fast"))
      .collect().head
    assert(java.lang.Double.compare(rd.getDouble(1), rd.getDouble(2)) == 0,
      s"builtin=${rd.getDouble(1)} fast=${rd.getDouble(2)}")

    // a DOUBLE past the (20,6) range mirrors the built-in's cast under
    // the session's ANSI mode: the SAME SparkArithmeticException error
    // class (NUMERIC_VALUE_OUT_OF_RANGE) the built-in sum's cast raises,
    // so class/SQLSTATE-based error handling cannot tell them apart
    val over = Seq[(Long, java.lang.Double)]((1L, 2e14)).toDF("k", "v")
    val exRef = intercept[Exception] { over.agg(builtin($"v")).collect() }
    val exFast = intercept[Exception] {
      over.agg(call_function("graft_decsum", $"v")).collect()
    }
    val refConds = DecimalMicrosSumSpec.conditions(exRef)
    val fastConds = DecimalMicrosSumSpec.conditions(exFast)
    assert(refConds.exists(_.startsWith("NUMERIC_VALUE_OUT_OF_RANGE")), refConds)
    assert(fastConds.exists(_.startsWith("NUMERIC_VALUE_OUT_OF_RANGE")), fastConds)
    assert((refConds intersect fastConds)
      .exists(_.startsWith("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"ref=$refConds fast=$fastConds")
  }

  test("int128 accumulator wrap and the decimalOut 38-digit gap are detected, never silent") {
    import spark.implicits._
    def df(v: String) = Seq(v, v).toDF("s")
      .select($"s".cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("v"))
    // two rows at the DECIMAL(38,6) extreme: ~1e38 micros each, total
    // ~2e38 > int128 max ~1.7e38 — the accumulator itself wraps
    val near = "99999999999999999999999999999999.999999"
    // two 6e31-unit rows: total 1.2e38 micros — int128 holds it exactly,
    // but 39 unscaled digits exceed Decimal(38,6) (the representation gap)
    val gap = "60000000000000000000000000000000"

    // ANSI (session default): the built-in sum(DECIMAL(38,6)) raises a
    // SQLSTATE-22003 overflow — NUMERIC_VALUE_OUT_OF_RANGE when the
    // per-add precision check trips first, ARITHMETIC_OVERFLOW from
    // CheckOverflowInSum otherwise; ours raises the decimal-sum
    // ARITHMETIC_OVERFLOW condition (CheckOverflowInSum's own)
    val exRef = intercept[Exception] { df(near).agg(sum($"v")).collect() }
    val exWrap = intercept[Exception] {
      df(near).agg(call_function("graft_decsum", $"v")).collect()
    }
    val exGap = intercept[Exception] {
      df(gap).agg(call_function("graft_decsum_dec", $"v")).collect()
    }
    val refConds = DecimalMicrosSumSpec.conditions(exRef)
    assert(refConds.exists(c => c == "ARITHMETIC_OVERFLOW" ||
      c.startsWith("NUMERIC_VALUE_OUT_OF_RANGE")), refConds)
    assert(DecimalMicrosSumSpec.conditions(exWrap).contains("ARITHMETIC_OVERFLOW"),
      DecimalMicrosSumSpec.conditions(exWrap))
    assert(DecimalMicrosSumSpec.conditions(exGap).contains("ARITHMETIC_OVERFLOW"),
      DecimalMicrosSumSpec.conditions(exGap))

    // the double-out evaluator is NOT affected by the 38-digit gap: the
    // exact int128 total 1.2e38 micros rounds to 1.2e32 — correct where
    // the built-in's 38-digit buffer has already overflowed
    val okGap = df(gap).agg(call_function("graft_decsum", $"v")).collect().head
    assert(okGap.getDouble(0) == 1.2e32, okGap.getDouble(0))

    // legacy mode: NULL, exactly like the built-in's CheckOverflowInSum
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      assert(df(near).agg(sum($"v")).collect().head.isNullAt(0))
      assert(df(near).agg(call_function("graft_decsum", $"v"))
        .collect().head.isNullAt(0))
      assert(df(gap).agg(call_function("graft_decsum_dec", $"v"))
        .collect().head.isNullAt(0))
      // and a non-overflowing legacy sum still produces its value
      val fine = df("1.5").agg(call_function("graft_decsum", $"v"))
        .collect().head.getDouble(0)
      assert(fine == 3.0)
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("randomized extreme-magnitude groups match BigInteger truth; wraps always flag (property)") {
    import spark.implicits._
    // the add128 overflow probe is the subtle bit (two-step signed-add
    // XOR combination): pin it against BigInteger arithmetic on inputs
    // whose behavior is ORDER-INDEPENDENT, because Spark's partial
    // aggregation order is nondeterministic —
    //  * exact groups: sum of |v| < 1e38 micros, so no intermediate wrap
    //    under ANY order and the total is a representable Decimal(38,6)
    //  * overflow groups: all values share a sign, so prefix sums are
    //    monotone and EVERY order wraps (or lands in the 38-digit gap)
    val rnd = new scala.util.Random(99)
    def randMicros(maxDigits: Int): BigInt = {
      val digits = 30 + rnd.nextInt(maxDigits - 29)
      val s = (1 to digits).map(_ => rnd.nextInt(10)).mkString.dropWhile(_ == '0')
      if (s.isEmpty) BigInt(1) else BigInt(s)
    }
    // ---- exact groups: one job, 25 groups × ~12 rows of ±~1e36 micros
    val groups = (0 until 25).map { g =>
      val vals = (0 until 12).map { _ =>
        val v = randMicros(36) // ≤ ~1e36 each; 12 × 1e36 << 1e38
        if (rnd.nextBoolean()) v else -v
      }
      (g.toLong, vals)
    }
    val rows = groups.flatMap { case (g, vs) =>
      vs.map(v => (g, new java.math.BigDecimal(v.bigInteger, 6).toPlainString))
    }
    val got = rows.toDF("k", "s")
      .select($"k", $"s".cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("v"))
      .repartition(7) // force partial/merge int128 paths
      .groupBy("k").agg(call_function("graft_decsum_dec", $"v").as("t"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    groups.foreach { case (g, vs) =>
      val expected = new java.math.BigDecimal(vs.sum.bigInteger, 6)
      assert(got(g).compareTo(expected) == 0, s"k=$g: got ${got(g)} want $expected")
    }
    // ---- overflow groups: same-sign rows whose total wraps int128 or
    // lands in the [1e38, 1.7e38) representation gap — both must raise,
    // never return a wrapped/truncated value
    (1 to 4).foreach { i =>
      val sign = if (i % 2 == 0) 1 else -1
      val n = 2 + rnd.nextInt(3)
      // each |row| in [6e37, 1e38): n rows total in [1.2e38, 5e38) —
      // always past the 38-digit limit, sometimes past int128
      val vs = (0 until n).map { _ =>
        val v = BigInt("6" + (1 to 37).map(_ => rnd.nextInt(10)).mkString)
        BigInt(sign) * v
      }
      val df = vs.map(v => new java.math.BigDecimal(v.bigInteger, 6).toPlainString)
        .toDF("s")
        .select($"s".cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("v"))
      val ex = intercept[Exception] {
        df.agg(call_function("graft_decsum_dec", $"v")).collect()
      }
      assert(DecimalMicrosSumSpec.conditions(ex).contains("ARITHMETIC_OVERFLOW"),
        s"group $i (${vs.mkString(",")}): ${DecimalMicrosSumSpec.conditions(ex)}")
    }
  }

  test("scale-6 decimals of any precision take the direct path (no narrowing cast)") {
    import spark.implicits._
    // a DECIMAL(38,6) input (e.g. re-aggregating graft_decsum_dec exact
    // subtotals) must NOT be squeezed through a (20,6) cast that nulls
    // values past 1e14 — the direct int128 conversion keeps them exact
    val vals = Seq("123456789012345678.123456", "-987654321098765432.654321",
      "10000000000000000000.000001", "0.000002")
    val df = vals.map(v => (1L, new java.math.BigDecimal(v))).toDF("k", "v")
      .select($"k", $"v".cast(org.apache.spark.sql.types.DecimalType(38, 6)).as("v"))
    val r = df.groupBy("k")
      .agg(sum($"v").cast("double").as("ref"),
        call_function("graft_decsum", $"v").as("fast"))
      .collect().head
    assert(java.lang.Double.compare(r.getDouble(1), r.getDouble(2)) == 0,
      s"builtin=${r.getDouble(1)} int128=${r.getDouble(2)}")
  }
}

object DecimalMicrosSumSpec {
  /** Every Spark error condition (error class) in a failure's cause
    * chain — task failures arrive wrapped in SparkException layers.
    */
  def conditions(t: Throwable): Set[String] =
    if (t == null) Set.empty
    else (t match {
      case st: org.apache.spark.SparkThrowable if st.getCondition != null =>
        Set(st.getCondition)
      case _ => Set.empty[String]
    }) ++ conditions(t.getCause)
}
