package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, BinaryExpression, BitwiseAnd, BitwiseNot, BitwiseOr, EqualTo, EvalMode, Expression, If, IsNaN, IsNotNull, Literal, Not, Or, ShiftRight, ShiftRightUnsigned, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
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
  * INPUT DOMAIN: each PER-ROW value must fit int64 micros, i.e.
  * |value| < ~9.22e12 (DECIMAL(18,6)-representable) — the int128 headroom
  * is the accumulator's, not the row's. DECIMAL(20,6) admits wider values;
  * [[MicrosLong]] rejects those loudly with a domain error instead of the
  * bare ArithmeticException `UnscaledValue` would surface. Callers with
  * genuinely wider per-row values belong on the built-in `sum(DECIMAL)`.
  *
  * All buffer updates use LEGACY (wrapping) eval mode: lo-word wraparound
  * is the carry mechanism itself, and must not trip ANSI overflow checks.
  */
case class DecimalMicrosSum(child: Expression,
    decimalOut: Boolean = false) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  /** decimalOut keeps the EXACT total as DECIMAL(38,6) (int128 micros fit:
    * |total| < 1.7e32 micros = 1.7e26 units < 1e32) so a second-level
    * aggregation (rollup/cube re-aggregation over first-level groups) can
    * re-sum exactly and round to double ONCE at the very end — the same
    * value the flat int128 sum produces.
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

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  private def addL(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** (hi, lo) += (xHi, xLo) in int128: wrapping lo add, branch-free
    * unsigned carry-out `((a & b) | ((a | b) & ~sum)) >>> 63`, carry into
    * the hi word.
    */
  private def add128(hiA: Expression, loA: Expression,
      xHi: Expression, xLo: Expression): (Expression, Expression) = {
    val newLo = addL(loA, xLo)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(loA, xLo),
        BitwiseAnd(BitwiseOr(loA, xLo), BitwiseNot(newLo))), Literal(63))
    val newHi = addL(addL(hiA, xHi), carry)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // a non-contributing input adds (0, 0) and leaves `seen` untouched.
    // DOUBLE input takes the no-BigDecimal fast path (DoubleToMicros —
    // value-identical to CAST(x AS DECIMAL(20,6)) then UnscaledValue),
    // with NaN/±Inf treated exactly like the legacy cast treats them: as
    // NULL. DECIMAL(20,6) keeps the cast-based path; any other numeric
    // goes through the same CAST to DECIMAL(20,6) the pre-fast-path
    // decSum applied for it (session cast semantics).
    val (contributes, micros) = child.dataType match {
      case DoubleType =>
        (And(IsNotNull(child), Not(Or(IsNaN(child),
          Or(EqualTo(child, Literal(Double.PositiveInfinity)),
            EqualTo(child, Literal(Double.NegativeInfinity)))))),
          DoubleToMicros(child): Expression)
      case dt if dt == DecimalType(20, 6) =>
        (IsNotNull(child), MicrosLong(child): Expression)
      case _ =>
        // pre-fast-path decSum applied this cast outside the aggregate;
        // a cast that nulls (legacy overflow) must contribute nothing,
        // exactly like a null input row did then
        val cast = org.apache.spark.sql.catalyst.expressions.Cast(
          child, DecimalType(20, 6))
        (IsNotNull(cast), MicrosLong(cast): Expression)
    }
    val xLo = If(contributes, micros, Literal(0L))
    val xHi = ShiftRight(xLo, Literal(63)) // sign-extend micros to int128
    val (newHi, newLo) = add128(hi, lo, xHi, xLo)
    Seq(newHi, newLo, Or(seen, contributes))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(newHi, newLo, Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    if (decimalOut)
      If(seen, Int128MicrosToDecimal(hi, lo), Literal(null, DecimalType(38, 6)))
    else
      If(seen, Int128MicrosToDouble(hi, lo), Literal(null, DoubleType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DecimalMicrosSum =
    copy(child = newChildren.head)
}

/** Unscaled micros of a scale-6 decimal as a long — `UnscaledValue` with
  * the input domain made LOUD: a DECIMAL(20,6) row beyond int64 micros
  * (|value| ≥ ~9.22e12) raises a named graft_decsum domain error instead
  * of `longValueExact`'s bare ArithmeticException. In-domain rows cost
  * exactly what UnscaledValue costs (one static call in codegen).
  */
case class MicrosLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_micros_long"

  override protected def nullSafeEval(input: Any): Any =
    MicrosLong.toLongExact(input.asInstanceOf[Decimal])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MicrosLong.toLongExact($c)")

  override protected def withNewChildInternal(
      newChild: Expression): MicrosLong = copy(child = newChild)
}

object MicrosLong {
  def toLongExact(d: Decimal): Long =
    try d.toUnscaledLong
    catch {
      case _: ArithmeticException => throw new ArithmeticException(
        s"graft_decsum input out of domain: per-row |value| must be < 2^63 " +
          s"micros (~9.22e12 at scale 6), got $d. The int128 headroom is the " +
          "accumulator's, not the row's — use the built-in sum(DECIMAL) for " +
          "wider per-row values.")
    }
}

/** Exact scale-6 micros of a DOUBLE — value-identical to
  * `UnscaledValue(CAST(x AS DECIMAL(20,6)))` (Spark casts through the
  * double's SHORTEST decimal representation, then rounds HALF_UP at
  * scale 6) but without constructing a BigDecimal per row on the common
  * path. Fast path: one multiply + round, valid when the scaled value is
  * (a) small enough that accumulated double error < 1e-3 micros
  * (|x·1e6| < 4e12: ≤ half-ulp from the multiply plus ≤ 2.4e-4 from
  * shortest-repr vs binary, both bounded well under the guard) and
  * (b) at least 2e-3 micros away from a .5 rounding boundary, so every
  * rounding rule — the double's round-nearest and decimal HALF_UP on the
  * shortest repr — lands on the same integer. Near-tie or large values
  * fall back to the exact BigDecimal conversion (rare: requires ≥ 7
  * significant decimals landing within 2e-3 of a half-micro).
  */
case class DoubleToMicros(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_double_to_micros"

  override protected def nullSafeEval(input: Any): Any =
    DoubleToMicros.toMicros(input.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DoubleToMicros.toMicros($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DoubleToMicros = copy(child = newChild)
}

object DoubleToMicros {
  def toMicros(x: Double): Long = {
    val p = x * 1e6
    if (java.lang.Math.abs(p) < 4e12) {
      val n = java.lang.Math.rint(p)
      // distance from the nearest half-integer boundary; boundary cases
      // (exact .5 micros, HALF_UP vs half-even) go to the exact path
      if (java.lang.Math.abs(java.lang.Math.abs(p - n) - 0.5) > 2e-3) {
        return n.toLong
      }
    }
    slow(x)
  }

  private def slow(x: Double): Long =
    try {
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    } catch {
      case _: ArithmeticException => throw new ArithmeticException(
        s"graft_decsum input out of domain: per-row |value| must be < 2^63 " +
          s"micros (~9.22e12 at scale 6), got $x. The int128 headroom is the " +
          "accumulator's, not the row's — use the built-in sum(DECIMAL) for " +
          "wider per-row values.")
    }
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
  */
case class Int128MicrosToDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = false
  override def dataType: DataType = DecimalType(38, 6)
  override def prettyName: String = "int128_micros_to_decimal"

  override protected def nullSafeEval(hi: Any, lo: Any): Any =
    Int128MicrosToDecimal.toDecimal(hi.asInstanceOf[Long], lo.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (h, l) => s"graft.plans.Int128MicrosToDecimal.toDecimal($h, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128MicrosToDecimal =
    copy(left = newLeft, right = newRight)
}

object Int128MicrosToDecimal {
  /** Exact int128 micros → Decimal(38,6); always representable. */
  def toDecimal(hi: Long, lo: Long): Decimal = {
    val total = (BigInt(hi) << 64) | (BigInt(lo) & Int128MicrosToDouble.loMask)
    Decimal(new java.math.BigDecimal(total.bigInteger, 6), 38, 6)
  }
}
