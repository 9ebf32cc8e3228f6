package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, BinaryExpression, BitwiseAnd, BitwiseNot, BitwiseOr, BitwiseXor, EvalMode, Expression, If, IsNotNull, LeafExpression, LessThan, Literal, Or, ShiftRightUnsigned, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, Decimal, DecimalType, DoubleType, LongType}

/** Exact decimal sum as an INT128 accumulator — `graft_decsum(col)` where
  * `col` is DECIMAL(20,6).
  *
  * Motivation (SURVEY §7.3 tier: custom Catalyst beats built-in): Spark's
  * `sum(DECIMAL(20,6))` carries a DECIMAL(30,6) buffer whose precision
  * exceeds the 18-digit compact-long limit, so every row update
  * deserializes and reserializes a JVM BigDecimal in the aggregation
  * buffer — measured 0.27 s per column over 600k rows where a long sum
  * costs 0.04 s. The value being summed is micros (unscaled decimal at
  * scale 6), an integer; this aggregate keeps the EXACT running total as
  * a 128-bit integer in two codegen-friendly long columns (lo unsigned,
  * hi signed) with branch-free carry arithmetic, and converts to the
  * presentation double ONCE per group.
  *
  * Scale safety: int128 overflows at ~1.7e38 — 2^64 times the headroom of
  * a long-micros sum, far beyond any 100 TB aggregate (DuckDB's own
  * decimal SUM uses the same int128 representation, which is also why the
  * result is bit-identical to the oracle's
  * `CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE)`: exact integer total,
  * one exact-decimal→nearest-double conversion at the end).
  *
  * OVERFLOW is detected, never wrapped: every update/merge carries a
  * branch-free signed-overflow probe on the hi word into an `ovf` buffer
  * flag (reachable only when per-row inputs approach the full
  * DECIMAL(38,6) extremes — two ~1e32-unit rows suffice), and the
  * `decimalOut` evaluator additionally range-checks the representation
  * gap (int128 totals in [1e38, 1.7e38) micros exceed Decimal(38,6)).
  * Both follow the session's eval mode captured at PLAN time, exactly
  * like the built-in `sum(DECIMAL)`'s `CheckOverflowInSum`: ANSI raises
  * the ARITHMETIC_OVERFLOW SparkArithmeticException
  * ([[Micros128.sumOverflow]]), legacy yields NULL.
  *
  * INPUT DOMAIN: exact over the ENTIRE domain of any scale-6 decimal
  * input (precision ≤ 38). Per-row values are converted to int128 micros
  * as a (hi, lo) long pair by [[Micros128]]: the common case (unscaled
  * fits int64) pays one static call and a sign-extension, the wide case
  * (DECIMAL(20,6) admits up to ~1e14, i.e. 1e20 micros > int64) takes the
  * exact BigInteger split — value-identical to `sum(DECIMAL(20,6))` with
  * no per-row domain restriction. DOUBLE input follows the session's
  * `CAST(x AS DECIMAL(20,6))` semantics exactly (eval mode captured at
  * plan time, like Cast itself): NaN/±Inf contribute NULL in both modes;
  * a finite value past the (20,6) range (|x| ≳ 1e14) raises the ANSI
  * out-of-range condition — the same one the built-in sum's cast raises —
  * or contributes NULL with ANSI off ([[Micros128.dblInDomain]]).
  *
  * All buffer updates use LEGACY (wrapping) eval mode: lo-word wraparound
  * is the carry mechanism itself, and must not trip ANSI overflow checks.
  */
case class DecimalMicrosSum(child: Expression,
    decimalOut: Boolean = false) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  /** decimalOut keeps the EXACT total as DECIMAL(38,6) so a second-level
    * aggregation (rollup/cube re-aggregation over first-level groups) can
    * re-sum exactly and round to double ONCE at the very end — the same
    * value the flat int128 sum produces. Int128 totals past 38 digits
    * (the [1e38, 1.7e38)-micros gap) overflow per the captured eval mode
    * — see [[Int128MicrosToDecimal]].
    */
  override def dataType: DataType =
    if (decimalOut) DecimalType(38, 6) else DoubleType
  override def prettyName: String =
    if (decimalOut) "graft_decsum_dec" else "graft_decsum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.NumericType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_decsum requires a numeric input, got ${other.catalogString}")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()
  private lazy val ovf = AttributeReference("ovf", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen, ovf)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false), Literal(false))

  private def add128(hiA: Expression, loA: Expression,
      xHi: Expression, xLo: Expression): (Expression, Expression, Expression) =
    Int128Arith.add128(hiA, loA, xHi, xLo)

  override lazy val updateExpressions: Seq[Expression] = {
    // a non-contributing input adds (0, 0) and leaves `seen` untouched.
    // Every path converts the row to FULL int128 micros (hi, lo): the
    // common fits-in-long case is a static call plus sign-extension, the
    // wide case (scale-6 decimals past int64 micros) splits the exact
    // BigInteger — no per-row domain restriction. DOUBLE input mirrors
    // the legacy CAST(x AS DECIMAL(20,6)) exactly, including NULL for
    // NaN/±Inf and for values past the (20,6) range; any other numeric
    // goes through the same CAST to DECIMAL(20,6) the pre-fast-path
    // decSum applied for it (session cast semantics).
    val (contributes, loExpr, hiExpr) = child.dataType match {
      case DoubleType =>
        // capture the session's cast semantics at PLAN time, as Cast
        // itself does: with ANSI on, an out-of-(20,6)-range double raises
        // the same out-of-range condition the built-in sum's cast raises;
        // with ANSI off it contributes NULL like the legacy cast
        val ansi = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled
        (And(IsNotNull(child), DoubleInDec20Domain(child, ansi)),
          DoubleMicros128Lo(child): Expression,
          DoubleMicros128Hi(child): Expression)
      case dt: DecimalType if dt.scale == 6 =>
        (IsNotNull(child),
          Micros128Lo(child): Expression, Micros128Hi(child): Expression)
      case _ =>
        // pre-fast-path decSum applied this cast outside the aggregate;
        // a cast that nulls (legacy overflow) must contribute nothing,
        // exactly like a null input row did then
        val cast = org.apache.spark.sql.catalyst.expressions.Cast(
          child, DecimalType(20, 6))
        (IsNotNull(cast),
          Micros128Lo(cast): Expression, Micros128Hi(cast): Expression)
    }
    val xLo = If(contributes, loExpr, Literal(0L))
    val xHi = If(contributes, hiExpr, Literal(0L))
    val (newHi, newLo, over) = add128(hi, lo, xHi, xLo)
    Seq(newHi, newLo, Or(seen, contributes), Or(ovf, over))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo, over) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(newHi, newLo, Or(seen.left, seen.right),
      Or(Or(ovf.left, ovf.right), over))
  }

  /** ANSI-vs-legacy captured at plan time (as the built-in sum's
    * `CheckOverflowInSum` does via its `failOnError`): accumulator wrap →
    * raise (ANSI) or NULL (legacy); the decimalOut representation gap is
    * checked inside [[Int128MicrosToDecimal]] under the same mode.
    */
  override lazy val evaluateExpression: Expression = {
    val ansi = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled
    val onOverflow: Expression =
      if (ansi) RaiseDecsumOverflow(dataType) else Literal(null, dataType)
    val conv: Expression =
      if (decimalOut) Int128MicrosToDecimal(hi, lo, ansi)
      else Int128MicrosToDouble(hi, lo)
    If(seen, If(ovf, onOverflow, conv), Literal(null, dataType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DecimalMicrosSum =
    copy(child = newChildren.head)
}

/** The int128 buffer-add shared by the two-long-word aggregates
  * ([[DecimalMicrosSum]], [[HashSum128]]) — expression-level multi-word
  * addition with a branch-free overflow probe.
  */
private[plans] object Int128Arith {

  private def addL(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** (hi, lo) += (xHi, xLo) in int128: wrapping lo add, branch-free
    * unsigned carry-out `((a & b) | ((a | b) & ~sum)) >>> 63`, carry into
    * the hi word. The third element is the signed-overflow probe of the
    * two-step hi add (a+b, then +carry): for each step the standard
    * `((a ^ s) & (b ^ s)) < 0` sign test, combined with XOR because over
    * a two-step chain the wraps can cancel — the total overflows iff
    * EXACTLY one step wraps (Hacker's Delight multi-word addition). All
    * bitwise longs, one comparison: stays branch-free and codegen-hot.
    */
  def add128(hiA: Expression, loA: Expression,
      xHi: Expression, xLo: Expression): (Expression, Expression, Expression) = {
    val newLo = addL(loA, xLo)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(loA, xLo),
        BitwiseAnd(BitwiseOr(loA, xLo), BitwiseNot(newLo))), Literal(63))
    val s1 = addL(hiA, xHi)
    val newHi = addL(s1, carry)
    val o1 = BitwiseAnd(BitwiseXor(hiA, s1), BitwiseXor(xHi, s1))
    val o2 = BitwiseAnd(BitwiseXor(s1, newHi), BitwiseXor(carry, newHi))
    val over = LessThan(BitwiseXor(o1, o2), Literal(0L))
    (newHi, newLo, over)
  }
}

/** Per-row int128-micros conversion statics shared by the
  * [[DecimalMicrosSum]] input paths. The full unscaled scale-6 value is
  * delivered as a (hi, lo) long pair — hi = bits 64..127 (signed),
  * lo = bits 0..63 — so a row NEVER leaves the aggregate's exact domain:
  * a DECIMAL(20,6) at its 1e14 extreme is 1e20 micros, well inside
  * int128.
  *
  * Cost model: the fits-in-int64 common case (every row whose |value| <
  * ~9.22e12 — all of TPC-H and every in-repo measure) is `toUnscaledLong`
  * plus a sign-extension shift, exactly what the old single-word path
  * paid; only genuinely wide rows take the BigInteger split, and the
  * JVM's zero-cost-unless-thrown try/catch keeps the branch free.
  *
  * DOUBLE input mirrors the legacy `CAST(x AS DECIMAL(20,6))`: Spark
  * casts through the double's SHORTEST decimal representation rounding
  * HALF_UP at scale 6, and nulls NaN/±Inf and values past the (20,6)
  * range. The fast path is one multiply + round, valid when the scaled
  * value is (a) small enough that accumulated double error < 1e-3 micros
  * (|x·1e6| < 4e12: ≤ half-ulp from the multiply plus ≤ 2.4e-4 from
  * shortest-repr vs binary, both bounded well under the guard) and
  * (b) at least 2e-3 micros from a .5 rounding boundary, so round-nearest
  * and HALF_UP-on-shortest-repr land on the same integer. Near-tie or
  * large values take the exact BigDecimal conversion (rare: ≥ 7
  * significant decimals within 2e-3 of a half-micro, or |x| ≥ 4e6).
  */
object Micros128 {

  /** low 64 bits of the unscaled scale-6 value */
  def decLo(d: Decimal): Long =
    try d.toUnscaledLong
    catch {
      case _: ArithmeticException =>
        d.toJavaBigDecimal.unscaledValue().longValue()
    }

  /** bits 64..127 (signed) of the unscaled scale-6 value */
  def decHi(d: Decimal): Long =
    try d.toUnscaledLong >> 63 // sign-extension of an in-int64 value
    catch {
      case _: ArithmeticException =>
        d.toJavaBigDecimal.unscaledValue().shiftRight(64).longValue()
    }

  private val MaxUnscaled = java.math.BigInteger.TEN.pow(20)

  /** Does `CAST(x AS DECIMAL(20,6))` produce a value (vs NULL)? False for
    * NaN and ±Inf (both cast modes null those). A finite value past the
    * (20,6) range (|rounded micros| ≥ 1e20) follows the captured cast
    * mode: ANSI raises the out-of-range condition exactly like the
    * built-in sum's cast; legacy contributes NULL.
    */
  def dblInDomain(x: Double, ansi: Boolean): Boolean =
    x == x && !java.lang.Double.isInfinite(x) &&
      (java.lang.Math.abs(x) < 4e6 ||
        micros(x).abs().compareTo(MaxUnscaled) < 0 ||
        (if (ansi)
          // the genuine Spark error CONDITION the built-in sum's ANSI
          // cast raises (NUMERIC_VALUE_OUT_OF_RANGE.WITH_SUGGESTION,
          // SQLSTATE 22003) on an ArithmeticException implementing the
          // public SparkThrowable interface — class/condition-based error
          // handling sees the same condition from either aggregate. (The
          // SparkArithmeticException class itself and its
          // QueryExecutionErrors factory are private[spark]/private[sql];
          // SparkThrowable is the public contract error handlers match
          // on.) Message parameters mirror
          // cannotChangeDecimalPrecisionError's.
          throw new GraftArithmeticException(
            "NUMERIC_VALUE_OUT_OF_RANGE.WITH_SUGGESTION",
            "<value> cannot be represented as Decimal(<precision>, " +
              "<scale>). If necessary set <config> to \"false\" to " +
              "bypass this error, and return NULL instead.",
            Map(
              "value" -> java.math.BigDecimal.valueOf(x).toPlainString,
              "precision" -> "20",
              "scale" -> "6",
              "config" -> AnsiConfQuoted))
        else false))

  private val AnsiConfQuoted =
    "\"" + org.apache.spark.sql.internal.SQLConf.ANSI_ENABLED.key + "\""

  /** The built-in decimal sum's overflow condition (what
    * `QueryExecutionErrors.overflowInSumOfDecimalError` raises: error
    * class ARITHMETIC_OVERFLOW with the try_sum suggestion, SQLSTATE
    * 22003) — raised by the ANSI evaluator when the int128 accumulator
    * wrapped or a decimalOut total exceeds Decimal(38,6).
    */
  def sumOverflow(): Nothing =
    throw new GraftArithmeticException(
      "ARITHMETIC_OVERFLOW",
      "<message>.<alternative> If necessary set <config> to \"false\" " +
        "to bypass this error.",
      Map(
        "message" -> "Overflow in sum of decimals",
        "alternative" -> (" Use 'try_sum' to tolerate overflow and " +
          "return NULL instead."),
        "config" -> AnsiConfQuoted))

  def dblLo(x: Double): Long = {
    val p = x * 1e6
    if (fastOk(p)) java.lang.Math.rint(p).toLong
    else micros(x).longValue()
  }

  def dblHi(x: Double): Long = {
    val p = x * 1e6
    if (fastOk(p)) java.lang.Math.rint(p).toLong >> 63
    else micros(x).shiftRight(64).longValue()
  }

  private def fastOk(p: Double): Boolean =
    java.lang.Math.abs(p) < 4e12 && {
      // distance from the nearest half-integer boundary; boundary cases
      // (exact .5 micros, HALF_UP vs half-even) go to the exact path
      val n = java.lang.Math.rint(p)
      java.lang.Math.abs(java.lang.Math.abs(p - n) - 0.5) > 2e-3
    }

  /** One exact conversion per distinct row value, not three: dblInDomain,
    * dblLo and dblHi each need the same BigInteger on the wide/near-tie
    * path, and the three update expressions see the same input value in
    * sequence on the same thread — a one-slot thread-local memo collapses
    * the up-to-3 BigDecimal constructions per row to 1. (Pure function of
    * x, so a stale hit across rows with equal values is still correct.)
    */
  private final class Memo {
    var x: Double = 0.0
    var big: java.math.BigInteger = null
  }
  private val memo = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo
  }
  private def micros(x: Double): java.math.BigInteger = {
    val m = memo.get()
    if (m.big == null || m.x != x) {
      m.x = x
      m.big = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue()
    }
    m.big
  }
}

/** An ArithmeticException carrying a Spark error condition through the
  * public [[org.apache.spark.SparkThrowable]] interface — what
  * condition-based error handling (`getCondition`/`getSqlState`) matches
  * on. The message renders exactly like Spark's own:
  * `[CONDITION] template-with-params SQLSTATE: nnnnn` (both conditions
  * used here are SQLSTATE 22003, numeric value out of range).
  */
class GraftArithmeticException(
    condition: String, template: String, params: Map[String, String])
  extends ArithmeticException(
    s"[$condition] " + params.foldLeft(template) { case (m, (k, v)) =>
      m.replace(s"<$k>", v)
    } + " SQLSTATE: 22003")
  with org.apache.spark.SparkThrowable {

  override def getCondition: String = condition
  override def getMessageParameters: java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    params.foreach { case (k, v) => m.put(k, v) }
    m
  }
}

/** Raises the decimal-sum ARITHMETIC_OVERFLOW condition when evaluated —
  * the ANSI branch of [[DecimalMicrosSum]]'s overflow check. Runs once
  * per GROUP inside the evaluator's If, guarded by the `ovf` flag. Real
  * doGenCode (not CodegenFallback) for the same null-INPUT_ROW reason as
  * [[Int128MicrosToDouble]].
  */
case class RaiseDecsumOverflow(dataType: DataType) extends LeafExpression {
  override def nullable: Boolean = true
  override def foldable: Boolean = false
  override def prettyName: String = "graft_decsum_overflow"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    Micros128.sumOverflow()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val jt = CodeGenerator.javaType(dataType)
    // the static always throws; the declarations after it keep janino's
    // reachability analysis happy and the ExprCode contract intact
    ev.copy(code =
      code"""
            |graft.plans.Micros128.sumOverflow();
            |boolean ${ev.isNull} = true;
            |$jt ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
            |""".stripMargin)
  }
}

/** [[Micros128.decLo]] as a codegen expression. */
case class Micros128Lo(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_micros128_lo"
  override protected def nullSafeEval(input: Any): Any =
    Micros128.decLo(input.asInstanceOf[Decimal])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Micros128.decLo($c)")
  override protected def withNewChildInternal(
      newChild: Expression): Micros128Lo = copy(child = newChild)
}

/** [[Micros128.decHi]] as a codegen expression. */
case class Micros128Hi(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_micros128_hi"
  override protected def nullSafeEval(input: Any): Any =
    Micros128.decHi(input.asInstanceOf[Decimal])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Micros128.decHi($c)")
  override protected def withNewChildInternal(
      newChild: Expression): Micros128Hi = copy(child = newChild)
}

/** [[Micros128.dblLo]] as a codegen expression. */
case class DoubleMicros128Lo(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dbl_micros128_lo"
  override protected def nullSafeEval(input: Any): Any =
    Micros128.dblLo(input.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Micros128.dblLo($c)")
  override protected def withNewChildInternal(
      newChild: Expression): DoubleMicros128Lo = copy(child = newChild)
}

/** [[Micros128.dblHi]] as a codegen expression. */
case class DoubleMicros128Hi(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dbl_micros128_hi"
  override protected def nullSafeEval(input: Any): Any =
    Micros128.dblHi(input.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Micros128.dblHi($c)")
  override protected def withNewChildInternal(
      newChild: Expression): DoubleMicros128Hi = copy(child = newChild)
}

/** [[Micros128.dblInDomain]] as a codegen predicate — the double path's
  * contribution gate: NULL for NaN/±Inf, and for finite out-of-range
  * values either the ANSI out-of-range error or a NULL contribution,
  * per the plan-time-captured `ansi` mode.
  */
case class DoubleInDec20Domain(child: Expression, ansi: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_dbl_in_dec20_domain"
  override protected def nullSafeEval(input: Any): Any =
    Micros128.dblInDomain(input.asInstanceOf[Double], ansi)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Micros128.dblInDomain($c, $ansi)")
  override protected def withNewChildInternal(
      newChild: Expression): DoubleInDec20Domain = copy(child = newChild)
}

/** Exact (hi·2^64 + unsigned lo) micros → nearest double of the scale-6
  * decimal. Runs once per GROUP (not per row). Real codegen (a static
  * helper call), NOT CodegenFallback: the fallback path interpolates
  * `ctx.INPUT_ROW`, which is null inside HashAggregate's no-grouping-keys
  * result projection — the one place an aggregate's evaluateExpression is
  * guaranteed to appear.
  */
case class Int128MicrosToDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int128_micros_to_double"

  override protected def nullSafeEval(hi: Any, lo: Any): Any =
    Int128MicrosToDouble.toDouble(hi.asInstanceOf[Long], lo.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (h, l) => s"graft.plans.Int128MicrosToDouble.toDouble($h, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128MicrosToDouble =
    copy(left = newLeft, right = newRight)
}

object Int128MicrosToDouble {
  private[plans] val loMask = (BigInt(1) << 64) - 1

  /** Exact int128 reassembly, then one exact-decimal→double rounding. */
  def toDouble(hi: Long, lo: Long): Double = {
    val total = (BigInt(hi) << 64) | (BigInt(lo) & loMask)
    new java.math.BigDecimal(total.bigInteger, 6).doubleValue()
  }
}

/** Exact (hi·2^64 + unsigned lo) micros as DECIMAL(38,6) — no rounding at
  * all; the [[DecimalMicrosSum]] decimalOut evaluator for re-aggregable
  * exact subtotals.
  *
  * An int128 total is NOT always a Decimal(38,6): the accumulator tops
  * out near 1.7e38 micros while 38 digits end at 1e38, leaving a
  * representation gap [1e38, 1.7e38) that the accumulator's wrap flag
  * cannot see. Totals in the gap follow the plan-time-captured eval
  * mode: ANSI raises the decimal-sum ARITHMETIC_OVERFLOW
  * ([[Micros128.sumOverflow]]), legacy yields NULL — identical to the
  * built-in sum's `CheckOverflowInSum` at ITS 38-digit buffer limit.
  */
case class Int128MicrosToDecimal(left: Expression, right: Expression,
    ansi: Boolean) extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 6)
  override def prettyName: String = "int128_micros_to_decimal"

  override protected def nullSafeEval(hi: Any, lo: Any): Any =
    Int128MicrosToDecimal.toDecimal(
      hi.asInstanceOf[Long], lo.asInstanceOf[Long], ansi)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (h, l) => s"""
      ${ev.value} = graft.plans.Int128MicrosToDecimal.toDecimal($h, $l, $ansi);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128MicrosToDecimal =
    copy(left = newLeft, right = newRight)
}

object Int128MicrosToDecimal {
  private val MaxUnscaled = java.math.BigInteger.TEN.pow(38)

  /** Exact int128 micros → Decimal(38,6); ANSI-raises or legacy-NULLs a
    * total whose unscaled magnitude needs more than 38 digits.
    */
  def toDecimal(hi: Long, lo: Long, ansi: Boolean): Decimal = {
    val total = (BigInt(hi) << 64) | (BigInt(lo) & Int128MicrosToDouble.loMask)
    if (total.bigInteger.abs.compareTo(MaxUnscaled) >= 0) {
      if (ansi) Micros128.sumOverflow() else null
    } else Decimal(new java.math.BigDecimal(total.bigInteger, 6), 38, 6)
  }
}
