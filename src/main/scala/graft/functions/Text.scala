package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{split, trim}

/** The engine's ONE whitespace tokenization. Every text operator (dedup
  * shingles, token counts, BM25, repetition, packing, funnel), every DuckDB
  * oracle (`regexp_split_to_array(trim(text), '\s+')`) and every driver-side
  * spec recomputation must stay byte-identical to this expression — a tweak
  * here is a cross-engine semantics change, not a refactor. Batch and
  * streaming share this definition (Streaming.funnelCounts ↔ q72).
  */
object Text {
  def words(c: Column): Column = split(trim(c), "\\s+")
}
