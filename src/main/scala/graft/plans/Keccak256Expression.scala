package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Keccak

/** `keccak256(binary) → lowercase hex string` as a native Catalyst
  * expression (SURVEY §7.3's optional stretch, promoting the F2 UDF). Same
  * contract as the built-in `md5`: binary in, hex `StringType` out.
  *
  * Unlike a ScalaUDF this participates in whole-stage codegen — no
  * serialization boundary, no null-wrapper object allocation per row; the
  * generated code calls the static Keccak-f[1600] routine directly.
  */
case class Keccak256(child: Expression) extends UnaryExpression {

  // ExpectsInputTypes is unusable outside org.apache.spark.sql
  // (AbstractDataType is private[sql]) — check the input type directly
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"keccak256 requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "keccak256"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Keccak.toHex(Keccak.hash256(input.asInstanceOf[Array[Byte]])))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Keccak.toHex(graft.functions.Keccak.hash256($c)))")

  override protected def withNewChildInternal(newChild: Expression): Keccak256 =
    copy(child = newChild)
}

/** Session extension registering `keccak256` as a SQL function. Opt in
  * with `spark.sql.extensions=graft.plans.GraftExtensions`; from the
  * DataFrame API use `call_function("keccak256", col)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("keccak256"),
      new ExpressionInfo(classOf[Keccak256].getName, "keccak256"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "keccak256 expects exactly one argument")
        Keccak256(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShingleGenerator].getName, "shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "shingles(text, n) expects two arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingles n must be an integer literal, got $other")
        }
        ShingleGenerator(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_decsum"),
      new ExpressionInfo(classOf[DecimalMicrosSum].getName, "graft_decsum"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_decsum expects exactly one argument")
        DecimalMicrosSum(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_decsum_dec"),
      new ExpressionInfo(classOf[DecimalMicrosSum].getName, "graft_decsum_dec"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_decsum_dec expects exactly one argument")
        DecimalMicrosSum(children.head, decimalOut = true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[ShingleGenerator].getName, "ngrams"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "ngrams(text, n) expects two arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"ngrams n must be an integer literal, got $other")
        }
        ShingleGenerator(children.head, n, distinct = false)
      }))
    ext.injectFunction((
      new FunctionIdentifier("posshingles"),
      new ExpressionInfo(classOf[ShingleGenerator].getName, "posshingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "posshingles(text, n) expects two arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"posshingles n must be an integer literal, got $other")
        }
        ShingleGenerator(children.head, n, positional = true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("posngrams"),
      new ExpressionInfo(classOf[ShingleGenerator].getName, "posngrams"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "posngrams(text, n) expects two arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"posngrams n must be an integer literal, got $other")
        }
        ShingleGenerator(children.head, n, distinct = false, positional = true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("termfreqs"),
      new ExpressionInfo(classOf[TermFreqGenerator].getName, "termfreqs"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "termfreqs(text, maxN) expects two arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"termfreqs maxN must be an integer literal, got $other")
        }
        TermFreqGenerator(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "graft_dot_long"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot_long expects exactly two arguments")
        DotProductLong(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hashsum"),
      new ExpressionInfo(classOf[HashSum128].getName, "graft_hashsum"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_hashsum expects exactly one argument")
        HashSum128(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5long"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "graft_md5long"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_md5long expects exactly one argument")
        Md5PrefixLong(children.head, second = false)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5long2"),
      new ExpressionInfo(classOf[Md5PrefixLong].getName, "graft_md5long2"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_md5long2 expects exactly one argument")
        Md5PrefixLong(children.head, second = true)
      }))
    ext.injectOptimizerRule(_ => PresentationSortRule())
  }
}
