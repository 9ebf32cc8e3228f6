package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact int64 dot product over two `array<bigint>` columns, as a native
  * codegen expression — the hot kernel of every pairwise similarity
  * operator (q32 brute-force cosine, q33 IVF cells, q48 ANN verify).
  *
  * Why an Expression and not the tight-loop UDF it replaces: a Scala UDF
  * pays, PER PAIR, a `toLongArray` bulk copy of both unsafe arrays plus
  * the boxed invoke round-trip. Generated code reads `getLong(i)`
  * straight off the UnsafeArrayData inside the join's produced row —
  * zero copies, zero allocation, and the expression stays inside the
  * surrounding WholeStageCodegen span instead of breaking it. On q33's
  * within-cell pair stream (the operator's asymptotic cost at 100 TB)
  * that is the difference between the dot being the bottleneck and the
  * join's row production being it.
  *
  * Semantics: CHECKED int64 arithmetic (Math.multiplyExact/addExact —
  * JIT intrinsics, same cost as the plain ops on the non-overflow
  * path). The quantization contract keeps |x| ≤ 2^21, so a dim-128 dot
  * is ≤ 2^49 — far from overflow — but an out-of-contract vector must
  * abort loudly, not wrap silently into a wrong-but-plausible
  * similarity: the VectorQuantizer.nearest convention, and the same
  * loud-vs-silent call as the NULL-element case below. A NULL array
  * propagates NULL; a length mismatch or a NULL ELEMENT throws rather
  * than silently truncating/zeroing — a vector with a null component is
  * corrupt input (DuckDB's SUM would silently NULL the whole dot).
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_long expects two array<bigint> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot_long: length mismatch ($n vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_dot_long: null element at index $i")
      s = Math.addExact(s, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot_long: length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "graft_dot_long: null element at index " + $i);
         |  }
         |  $s = java.lang.Math.addExact($s, java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}
