package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_md5long(x)` / `graft_md5long2(x)` — the 60-bit md5-derived
  * integer hashes (`Hashing.md5Long`/`md5Long2`) computed NATIVELY from
  * the digest bytes instead of `conv(substring(md5(x), …), 16, 10)`:
  * identical values (the first/second 15 hex chars of an md5 are exactly
  * the first/second 8 digest bytes read big-endian shifted right 4 bits)
  * without materializing and re-parsing a 32-char hex string per row.
  * These sit on the hottest per-row paths in the engine — every shingle,
  * every simhash word, every sampled key — where the hex round-trip was
  * measurable allocation traffic.
  *
  * DuckDB oracle equivalence is unchanged:
  * `('0x' || substr(md5(x), 1, 15))::BIGINT` (resp. chars 17..31).
  */
case class Md5PrefixLong(child: Expression, second: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String =
    if (second) "graft_md5long2" else "graft_md5long"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING or BINARY input, got ${other.catalogString}")
    }

  private def offset: Int = if (second) 8 else 0

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Md5PrefixLong.hash(s.getBytes, offset)
    case b: Array[Byte] => Md5PrefixLong.hash(b, offset)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5PrefixLong.hash(${bytes(c)}, $offset)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixLong = copy(child = newChild)
}

object Md5PrefixLong {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit non-negative long from digest bytes [off, off+8) big-endian,
    * shifted right 4 — bit-identical to parsing 15 hex chars.
    */
  def hash(input: Array[Byte], off: Int): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(input)
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (dig(off + i) & 0xffL)
      i += 1
    }
    v >>> 4
  }
}
