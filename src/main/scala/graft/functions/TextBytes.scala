package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Byte-offset string slicing (F9). Solidity AST `src` spans are *byte*
  * offsets into the (CRLF-normalized) source — `plain_contract.rs:462-469`
  * slices `bytes[start..start+length]` with lossy UTF-8 recovery. Spark's
  * `substring` is character-based, so on non-ASCII sources it would corrupt
  * spans; this UDF preserves the byte semantics exactly.
  */
object TextBytes {

  /** Slice `len` bytes starting at 0-based byte offset `start`, decoding the
    * result as UTF-8 (replacement chars on split code points — same as
    * Rust's `String::from_utf8_lossy`). Out-of-range is clamped.
    */
  def byteSlice(s: String, start: Int, len: Int): String = {
    if (s == null) return null
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val from = math.max(0, math.min(start, bytes.length))
    val until = math.max(from, math.min(start + len, bytes.length))
    new String(bytes, from, until - from, StandardCharsets.UTF_8)
  }

  /** CRLF → LF normalization applied before any byte-offset math (F8,
    * `plain_contract.rs:434`).
    */
  def normalizeCrlf(s: String): String =
    if (s == null) null else s.replace("\r\n", "\n")

  def byteSliceUdf(spark: SparkSession): UserDefinedFunction =
    udf((s: String, start: Int, len: Int) => byteSlice(s, start, len))
}
