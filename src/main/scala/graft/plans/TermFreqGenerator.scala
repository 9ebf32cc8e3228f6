package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram frequency rows `(g, term, tf)` for every gram size
  * g ∈ 1..maxN, as a native Catalyst [[Generator]] — registered as
  * `termfreqs(text, maxN)`.
  *
  * This is the build step of the engine's shared TERM-FREQUENCY index
  * (TrainingOps.termFreq): the whole tokenizer-statistics family (q69
  * vocabulary, q78 merge pairs, q79 lift, q86 LM model instances, q88
  * tf/df) derives from these rows, so the corpus pays ONE tokenize pass
  * per session instead of one per query.
  *
  * The per-document AGGREGATION happens here, map-side inside the
  * generator (the posshingles first-occurrence trick applied to counts):
  * each document emits one row per DISTINCT (g, term) carrying its
  * occurrence count, so no `groupBy(doc_id, term)` — and no shuffle of
  * token-volume rows — ever exists in the plan. Emission order is gram
  * size then first-seen term (deterministic; consumers aggregate, so
  * order is semantics-free). Memory is O(distinct terms of one document),
  * the same class as the shingle set the dedup generators already hold.
  *
  * Tokenization is the engine's single SQL-exact definition ([[SqlTok]]),
  * so `SUM(tf) WHERE g=1` equals `count(explode(Text.words(text)))` and
  * the g=2 rows equal `ngrams(text, 2)` with multiplicity — consumers'
  * DuckDB oracles stay word-for-word unchanged.
  */
case class TermFreqGenerator(child: Expression, maxN: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(maxN >= 1, s"termfreqs maxN must be >= 1, got $maxN")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"termfreqs requires STRING input, got ${child.dataType.catalogString}")

  override def elementSchema: StructType =
    StructType(StructField("g", IntegerType) ::
      StructField("term", StringType) ::
      StructField("tf", LongType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty
    val words = SqlTok.words(t.asInstanceOf[UTF8String].toString)
    val sb = new java.lang.StringBuilder
    def gram(i: Int, n: Int): String = {
      if (n == 1) return words(i)
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      sb.toString
    }
    val tiers = (1 to maxN).iterator.flatMap { n =>
      if (words.length < n) Iterator.empty
      else {
        val counts = new java.util.LinkedHashMap[String, Long]()
        var i = 0
        val last = words.length - n
        while (i <= last) {
          counts.merge(gram(i, n), 1L, (a, b) => a + b)
          i += 1
        }
        val it = counts.entrySet().iterator()
        new Iterator[InternalRow] {
          override def hasNext: Boolean = it.hasNext
          override def next(): InternalRow = {
            val e = it.next()
            InternalRow(n, UTF8String.fromString(e.getKey), e.getValue)
          }
        }
      }
    }
    tiers
  }

  override protected def withNewChildInternal(newChild: Expression): TermFreqGenerator =
    copy(child = newChild)
}
