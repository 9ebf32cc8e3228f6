package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryExpression, Cast, Expression, If, IsNotNull, Literal, Or, ShiftRight}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, Decimal, DecimalType, IntegerType, LongType, ShortType}

/** Exact int128 sum of int64 values — `graft_hashsum(col)` — the
  * MERGEABLE membership-digest kernel (A2 at manifest tier).
  *
  * Motivation: the A2 order-insensitive multiset hash
  * (`plain_contract.rs:169-177`, [[graft.functions.Hashing.multisetHash]])
  * buffers `collect_list` of every element hash per group. That is the
  * reference's semantics for BOUNDED groups (a contract's file set), but
  * at manifest tier — q108's per-(split, lang) id-set hash, q89's
  * per-shard content checksum — the group is corpus-sized, so the
  * aggregation buffer holds billions of elements in one reduce task: the
  * exact single-task memory blowup the rest of the engine avoids. An
  * order-insensitive digest only needs a COMMUTATIVE, ASSOCIATIVE
  * combine; summing the per-element 60-bit md5-derived halves
  * ([[Md5PrefixLong]]) exactly gives one, and this aggregate carries the
  * exact total in the [[DecimalMicrosSum]] two-long int128 buffer: O(1)
  * per group, partial-aggregable (map-side combine works again —
  * `collect_list` forbids it), and bit-identical under any partitioning,
  * task order or AQE re-plan.
  *
  * Exactness is the portability contract: DuckDB's `sum(BIGINT)` is an
  * exact HUGEINT (int128) sum, so the oracle mirrors the total verbatim
  * (`CAST(sum(h) AS VARCHAR)` = this aggregate's DECIMAL(38,0) rendered
  * as a string). A float or wrapping-long sum could not be mirrored.
  *
  * Headroom: n elements of < 2^60 sum below 10^38 (the DECIMAL(38,0)
  * ceiling) for any n < 8.6e19 — no realizable corpus reaches it. The
  * int128 wrap probe and the 38-digit representation gap are still
  * checked and follow the plan-time-captured eval mode, exactly like
  * [[DecimalMicrosSum]]: ANSI raises ARITHMETIC_OVERFLOW, legacy NULLs.
  *
  * Collision posture (documented, not hidden): an additive digest of
  * 60-bit halves is weaker than a cryptographic hash of the sorted list
  * — two DIFFERENT multisets can collide with probability ~2^-120 under
  * random element hashes (both independent halves must collide). That is
  * the standard mergeable-checksum tradeoff (rsync/zsync rolling sums,
  * Postgres' hash_combine): for a manifest equality check it is 10^-36,
  * not an attack surface.
  */
case class HashSum128(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "graft_hashsum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hashsum requires an integral input, got ${other.catalogString}")
  }

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()
  private lazy val ovf = AttributeReference("ovf", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen, ovf)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    val asLong: Expression =
      if (child.dataType == LongType) child else Cast(child, LongType)
    val contributes = IsNotNull(child)
    val xLo = If(contributes, asLong, Literal(0L))
    // sign-extension: a signed long's int128 form is (x >> 63, x)
    val xHi = If(contributes, ShiftRight(asLong, Literal(63)), Literal(0L))
    val (newHi, newLo, over) = Int128Arith.add128(hi, lo, xHi, xLo)
    Seq(newHi, newLo, Or(seen, contributes), Or(ovf, over))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo, over) =
      Int128Arith.add128(hi.left, lo.left, hi.right, lo.right)
    Seq(newHi, newLo, Or(seen.left, seen.right),
      Or(Or(ovf.left, ovf.right), over))
  }

  override lazy val evaluateExpression: Expression = {
    val ansi = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled
    val onOverflow: Expression =
      if (ansi) RaiseDecsumOverflow(dataType) else Literal(null, dataType)
    If(seen, If(ovf, onOverflow, Int128ToDecimal38(hi, lo, ansi)),
      Literal(null, dataType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HashSum128 =
    copy(child = newChildren.head)
}

/** Exact (hi·2^64 + unsigned lo) as DECIMAL(38,0) — [[HashSum128]]'s
  * evaluator. The int128 representation gap past 38 digits
  * ([1e38, 1.7e38)) follows the captured eval mode, exactly like
  * [[Int128MicrosToDecimal]] at its scale.
  */
case class Int128ToDecimal38(left: Expression, right: Expression,
    ansi: Boolean) extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "int128_to_decimal38"

  override protected def nullSafeEval(hi: Any, lo: Any): Any =
    Int128ToDecimal38.toDecimal(
      hi.asInstanceOf[Long], lo.asInstanceOf[Long], ansi)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (h, l) => s"""
      ${ev.value} = graft.plans.Int128ToDecimal38.toDecimal($h, $l, $ansi);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128ToDecimal38 =
    copy(left = newLeft, right = newRight)
}

object Int128ToDecimal38 {
  private val MaxUnscaled = java.math.BigInteger.TEN.pow(38)

  def toDecimal(hi: Long, lo: Long, ansi: Boolean): Decimal = {
    val total = (BigInt(hi) << 64) | (BigInt(lo) & Int128MicrosToDouble.loMask)
    if (total.bigInteger.abs.compareTo(MaxUnscaled) >= 0) {
      if (ansi) Micros128.sumOverflow() else null
    } else Decimal(new java.math.BigDecimal(total.bigInteger, 0), 38, 0)
  }
}
