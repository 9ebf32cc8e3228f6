package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side copy of the engine's ONE tokenization
  * (graft.functions.Text.words), replicated with SQL semantics EXACTLY:
  * SQL trim strips SPACES only (Java's String.trim also eats \t\n etc.,
  * which would drop the leading empty token the SQL split keeps for
  * "\tfoo"), and the split must keep trailing empty tokens (Spark's split
  * uses limit -1; Java's default limit 0 drops them for "foo\t"). Shared
  * by every text generator so there is exactly one place this contract
  * can drift.
  */
private[plans] object SqlTok {
  def words(s0: String): Array[String] = {
    var b0 = 0
    var e0 = s0.length
    while (b0 < e0 && s0.charAt(b0) == ' ') b0 += 1
    while (e0 > b0 && s0.charAt(e0 - 1) == ' ') e0 -= 1
    s0.substring(b0, e0).split("[ \\t\\n\\x0B\\f\\r]+", -1)
  }
}

/** Word n-gram shingles as a native Catalyst [[Generator]] (the 1→N tier
  * `explode` belongs to). One pass over the tokens replaces the HOF
  * pipeline `explode(array_distinct(transform(sequence(...), …)))` —
  * which builds the full array, runs an interpreted lambda per shingle
  * and an O(n²) distinct — in the hottest dedup path (q28/q29/q31/q38).
  *
  * Two modes, registered as separate SQL functions:
  *  - `shingles(text, n)` (distinct = true): per-document SET semantics,
  *    insertion-ordered — what every set-similarity consumer (Jaccard,
  *    MinHash, containment) wants;
  *  - `ngrams(text, n)` (distinct = false): every occurrence with
  *    MULTIPLICITY, corpus-count semantics — what frequency consumers
  *    (q78 BPE merge-pair counting) want; skips the hash set entirely.
  *  - `posshingles(text, n)` (positional = true): distinct shingles
  *    paired with their FIRST 1-based token position — the per-document
  *    fingerprint profile substring-level dedup (q80) aligns across
  *    documents. First-occurrence dedup happens HERE, map-side inside
  *    the generator, so no per-document min(pos) aggregation (and its
  *    shuffle) ever exists in the plan.
  *  - `posngrams(text, n)` (positional = true, distinct = false): EVERY
  *    occurrence with its 1-based token position — what span-level
  *    masking (q112 surgical decontamination) needs, where a repeated
  *    contaminated n-gram must mark every site, not just its first.
  *    Streaming like `ngrams` (no hash set, no buffering).
  *
  * Generators are planned through `GenerateExec`; eval-based (codegen
  * fallback) like most built-in generators that produce variable row
  * counts.
  */
case class ShingleGenerator(child: Expression, n: Int, distinct: Boolean = true,
    positional: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires STRING input, got ${child.dataType.catalogString}")

  override def elementSchema: StructType =
    if (positional)
      StructType(StructField("pos", IntegerType) ::
        StructField("shingle", StringType) :: Nil)
    else StructType(StructField("shingle", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Iterator.empty
    // the engine's ONE tokenization, SQL-exact (see SqlTok above)
    val words = SqlTok.words(t.asInstanceOf[UTF8String].toString)
    if (words.length < n) return Iterator.empty
    val sb = new java.lang.StringBuilder
    def gram(i: Int): String = {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      sb.toString
    }
    if (positional && !distinct) {
      val last = words.length - n
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= last
        override def next(): InternalRow = {
          val g = gram(i)
          i += 1
          // i is now the 1-based position of the gram just built
          InternalRow(i, UTF8String.fromString(g))
        }
      }
    } else if (positional) {
      // first occurrence per shingle, 1-based (matching the oracle's
      // unnest(range(1, ...)) convention)
      val first = new java.util.LinkedHashMap[String, Int]()
      var i = 0
      while (i <= words.length - n) {
        first.putIfAbsent(gram(i), i + 1)
        i += 1
      }
      val it = first.entrySet().iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = {
          val e = it.next()
          InternalRow(e.getValue, UTF8String.fromString(e.getKey))
        }
      }
    } else if (distinct) {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= words.length - n) { seen.add(gram(i)); i += 1 }
      val it = seen.iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow =
          InternalRow(UTF8String.fromString(it.next()))
      }
    } else {
      val last = words.length - n
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= last
        override def next(): InternalRow = {
          val g = gram(i); i += 1
          InternalRow(UTF8String.fromString(g))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}
