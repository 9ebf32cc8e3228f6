package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{split, trim}

/** The engine's ONE whitespace tokenization. Every text operator (dedup
  * shingles, token counts, BM25, repetition, packing, funnel), every DuckDB
  * oracle (`regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')`) and
  * every driver-side spec recomputation must stay byte-identical to this
  * expression — a tweak here is a cross-engine semantics change, not a
  * refactor. Batch and streaming share this definition
  * (Streaming.funnelCounts ↔ q72).
  *
  * The class is spelled out instead of `\s` because the engines' `\s`
  * DISAGREE on one character: Java's is `[ \t\n\x0B\f\r]` while RE2's
  * (DuckDB) lacks `\x0B` (vertical tab). The explicit class is Java `\s`
  * verbatim — a Spark-side no-op — and pulls the oracle onto the same
  * definition, so a VT-bearing document tokenizes identically in both
  * engines instead of diverging at the hash gate.
  */
object Text {
  /** Java \s, spelled out — keep in sync with the oracle strings and
    * ShingleGenerator's executor-side copy.
    */
  val WsClass = "[ \\t\\n\\x0B\\f\\r]"

  def words(c: Column): Column = split(trim(c), WsClass + "+")
}
