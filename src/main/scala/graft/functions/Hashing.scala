package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Column-level hashing / normalization helpers, all built from codegen'd
  * Spark built-ins so they stay inside WholeStageCodegen — no UDFs in the
  * hot path.
  *
  * Reference semantics they reproduce:
  *  - F1 `simple_hash` (`utils.rs:12-17`): md5 of whitespace-stripped text.
  *  - A2 order-insensitive multiset hash (`plain_contract.rs:169-177`):
  *    md5 of the concatenation of the *sorted* per-element hashes.
  *  - F4 function row id (`functions.rs:31`): md5 over concatenated key parts.
  */
object Hashing {

  /** THE whitespace-strip pattern every content/id hash flows through —
    * `simpleHash`, `rowId`, `Ingest.contentId` and `Derive`'s string-side
    * id all reference this ONE constant, so a future tweak cannot
    * desynchronize row ids from content hashes. `(?U)` makes Java's `\s`
    * match Unicode White_Space, like the Rust regex crate's `\s` in the
    * reference (`utils.rs:12-17`) — NBSP and friends strip identically.
    * The DuckDB oracles keep RE2's ASCII `\s`: value-identical because the
    * corpus contains no Unicode-only whitespace, an invariant ENFORCED by
    * HashingSpec's corpus assertion (not merely claimed).
    */
  val WsPattern = "(?U)\\s+"

  /** F1: md5(text with ALL whitespace runs removed), lowercase hex. */
  def simpleHash(c: Column): Column = md5(regexp_replace(c, WsPattern, ""))

  /** Executor-side String form of [[simpleHash]] — same strip (the shared
    * [[WsPattern]]), same md5 — for typed row pipelines (Derive's id).
    */
  def simpleHashString(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.replaceAll(WsPattern, "").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** A2: aggregate — order-insensitive multiset hash of already-hashed
    * elements. Commutative by construction (sort before concat), so it is
    * safe under Spark's nondeterministic partial-aggregation order.
    *
    * BOUNDED GROUPS ONLY (the reference's own use: a contract's file
    * set, `plain_contract.rs:169-177`): the `collect_list` buffer holds
    * every element of the group, so a corpus-sized group is a
    * single-task memory blowup. Manifest-tier digests (per-split id
    * sets, per-shard content checksums) use [[multisetDigest]], whose
    * buffer is O(1).
    */
  def multisetHash(elementHash: Column): Column =
    md5(concat_ws("", sort_array(collect_list(elementHash))))

  /** Exact int128 sum of int64s ([[graft.plans.HashSum128]]) as
    * DECIMAL(38,0) — the O(1)-buffer commutative combine under
    * [[multisetDigest]]. DuckDB mirror: `sum(BIGINT)` (exact HUGEINT).
    */
  def hashSum(c: Column): Column =
    call_function("graft_hashsum", c)

  /** A2 at MANIFEST TIER: order-insensitive multiset digest with an
    * O(1) aggregation buffer — for groups that are corpus-sized (q108's
    * per-(split, lang) release id sets, q89's per-shard content
    * checksums), where [[multisetHash]]'s collect_list buffer would hold
    * billions of elements in one reduce task. Each element contributes
    * its two independent 60-bit md5-derived halves ([[md5Long]] /
    * [[md5Long2]] of the element's string form); both halves are summed
    * EXACTLY in int128 ([[hashSum]] — mergeable, partial-aggregable,
    * order-free by commutativity), and the digest is the md5 of
    * `"<sum1>:<sum2>"`. `concat` (not concat_ws) so an all-NULL group
    * yields NULL — the same value DuckDB's
    * `md5(CAST(sum(h1) AS VARCHAR) || ':' || CAST(sum(h2) AS VARCHAR))`
    * produces there. Collision tradeoff documented on [[graft.plans
    * .HashSum128]] (~2^-120 for differing multisets).
    */
  def multisetDigest(element: Column): Column = {
    val e = element.cast("string")
    md5(concat(hashSum(md5Long(e)).cast("string"), lit(":"),
      hashSum(md5Long2(e)).cast("string")))
  }

  /** F4: row id = simple_hash of the concatenated natural-key parts — the
    * reference derives ids with `simple_hash` (`functions.rs:31` →
    * `utils.rs:12-17`), so whitespace inside a key part (e.g. a
    * standard-json source name with spaces) is stripped before hashing.
    */
  def rowId(parts: Column*): Column =
    md5(regexp_replace(concat(parts.map(_.cast("string")): _*), WsPattern, ""))

  /** [[rowId]] minus the whitespace strip, for callers whose key parts
    * PROVABLY contain no whitespace (numeric casts, hex digests, fixed
    * separators): the regexp is a no-op there, and skipping it keeps the
    * per-row hot path at concat+md5. Oracles keep their regexp_replace —
    * values are identical either way, by the no-op guarantee.
    */
  def rowIdTrusted(parts: Column*): Column =
    md5(concat(parts.map(_.cast("string")): _*))

  /** First 15 hex chars of md5 parsed as a 60-bit non-negative long — the
    * portable "hash to integer" both Spark (`conv`) and the DuckDB oracle
    * (`('0x'||substr(md5(x),1,15))::BIGINT`) can compute identically.
    * Used as the base hash for minhash / simhash / LSH.
    */
  def md5Long(c: Column): Column =
    call_function("graft_md5long", c)

  /** Second 60-bit long from the tail of the same md5 — an independent hash
    * for double-hashing schemes (minhash_i = (h1 + i*h2) mod p).
    */
  def md5Long2(c: Column): Column =
    call_function("graft_md5long2", c)

  /** Exact-sum pattern for double measures: cast each value to
    * DECIMAL(20,6), sum exactly, then present as DOUBLE. Presenting as
    * DOUBLE rather than DECIMAL keeps the physical type identical between
    * the Spark parquet output and DuckDB's result — what the driver
    * hashes.
    *
    * The sum itself is [[graft.plans.DecimalMicrosSum]] (`graft_decsum`,
    * registered by GraftExtensions): an exact int128 accumulator over the
    * unscaled micros — value-identical to `sum(DECIMAL(20,6))` (and to
    * DuckDB's own int128 decimal SUM) but without the per-row BigDecimal
    * buffer the >18-digit built-in sum pays (measured 0.27 s → 0.07 s per
    * column over 600k rows).
    *
    * Determinism: both engines round double→DECIMAL(20,6) to nearest and
    * break exact decimal ties identically — Spark uses BigDecimal HALF_UP
    * and DuckDB rounds half away from zero (verified:
    * `CAST(±0.0078125::DOUBLE AS DECIMAL(20,6))` → ±0.007813 in both).
    * Scale 6 is deliberate: at higher scales (e.g. 10) DuckDB's
    * double→decimal cast multiplies by 10^scale in double arithmetic, which
    * for ~1e5 measures exceeds the 53-bit exact range and diverges from
    * Spark's exact BigDecimal conversion. Exact decimal → nearest double on
    * output is deterministic in both engines.
    */
  def decSum(c: Column): Column =
    call_function("graft_decsum", c)

  /** [[decSum]] keeping the EXACT int128 total as DECIMAL(38,6) — for
    * two-level aggregations (rollup/cube re-aggregation): first-level
    * groups keep exact subtotals, the re-aggregation sums those exactly,
    * and ONE decimal→double rounding happens at the very end — the same
    * value a flat decSum over all rows produces.
    */
  def decSumExact(c: Column): Column =
    call_function("graft_decsum_dec", c)

  /** X4 simhash kernel (q30): 60-bit near-dup fingerprint of a token
    * array — distinct the tokens, md5-prefix-hash each
    * ([[graft.plans.Md5PrefixLong]], the same native hash the shingle
    * index uses), count per-bit votes, majority-vote each of the 60 bits
    * (`2·popcount_j ≥ n`). One tight loop per document; boxed return so
    * a null or empty token array yields NULL instead of NPE-ing or
    * majority-voting every bit set on n=0 — callers drop such docs,
    * matching the explode form's implicit semantics.
    */
  def simhash60(ws: Array[String]): java.lang.Long = {
    if (ws == null || ws.isEmpty) return null
    val seen = new java.util.HashSet[String]()
    val cnt = new Array[Int](60)
    var n = 0
    var i = 0
    while (i < ws.length) {
      val w = ws(i)
      if (seen.add(w)) {
        n += 1
        val h = graft.plans.Md5PrefixLong.hash(w.getBytes("UTF-8"), 0)
        var j = 0
        while (j < 60) { cnt(j) += ((h >>> j) & 1L).toInt; j += 1 }
      }
      i += 1
    }
    // n ≥ 1 here: a non-empty array adds at least one distinct token, so
    // the n=0 all-bits-set degenerate case is unreachable by construction
    var sh = 0L
    var j = 0
    while (j < 60) { if (2L * cnt(j) >= n) sh |= 1L << j; j += 1 }
    java.lang.Long.valueOf(sh)
  }
}
