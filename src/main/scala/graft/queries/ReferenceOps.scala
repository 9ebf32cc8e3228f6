package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Hashing
import graft.util.Tables._

/** The reference's own query/operator surface (SURVEY.md §2), re-expressed
  * over the driver's TPC-H-ish corpus. Every entry is declarative
  * DataFrame API — Catalyst handles pushdown/pruning/join selection; AQE
  * (on by default in Spark 4) handles runtime re-planning.
  *
  * Determinism contract: every query ends in a total ORDER BY matching its
  * oracle; double aggregates go through exact DECIMAL sums
  * (Hashing.decSum) so hashes compare bit-stable against DuckDB.
  */
object ReferenceOps {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(20, 6))

  val all: Seq[Q] = Seq(

    // ---- S8/A1: count scan (`db.rs:198-204`) -----------------------------
    Q("q01_count_scan",
      (s, d) => lineitem(s, d).agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM lineitem")),

    // ---- S6/P3/O1: point lookup by key (`db.rs:109-120`) -----------------
    // Parquet predicate pushdown makes this a stats-pruned scan, the Spark
    // analog of DuckDB's indexed point read.
    Q("q02_point_lookup",
      (s, d) => orders(s, d)
        .filter(col("o_orderkey") === 42L)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(1),
      Some("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice " +
        "FROM orders WHERE o_orderkey = 42 LIMIT 1")),

    // ---- P1/P4: attribute filter + explicit projection (`db.rs:123-145`) -
    Q("q03_filter_project",
      (s, d) => customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey")),

    // ---- S5/O2: deterministic paginated scan (`main.rs:277-289`) ---------
    // The reference pages with bare OFFSET/LIMIT (order-nondeterministic);
    // we fix the hazard with a total ORDER BY — documented divergence.
    Q("q04_page_scan",
      (s, d) => lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .offset(100).limit(50)
        // re-sort after offset/limit: the collect-limit round trip does not
        // guarantee preserved output order
        .orderBy("l_orderkey", "l_linenumber"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "ORDER BY l_orderkey, l_linenumber LIMIT 50 OFFSET 100")),

    // ---- S7: sampled lookup, deterministic (`db.rs:123-145`) -------------
    // thread_rng OFFSET → seeded/deterministic sample: order by a hash of
    // the key. Same md5 on both engines ⇒ same "random" row.
    Q("q05_sampled_lookup",
      (s, d) => orders(s, d)
        .orderBy(md5(col("o_orderkey").cast("string")))
        .limit(1)
        .select("o_orderkey", "o_orderstatus"),
      Some("SELECT o_orderkey, o_orderstatus FROM orders " +
        "ORDER BY md5(CAST(o_orderkey AS VARCHAR)) LIMIT 1")),

    // ---- S9: PK dedup before insert (`db.rs:174`) ------------------------
    Q("q06_distinct",
      (s, d) => lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
        "ORDER BY l_returnflag, l_linestatus")),

    // ---- S9/S10 + §2.8: conflict-ignore upsert = anti-join ---------------
    // incoming-batch MINUS existing-keys, the Spark form of
    // `INSERT ... ON CONFLICT DO NOTHING` (`db.rs:172-196`).
    Q("q07_upsert_anti",
      (s, d) => {
        val o = orders(s, d)
        val incoming = o.filter(col("o_totalprice") > 400000.0)
        val existing = o.filter(col("o_orderkey") % 3 === 0).select("o_orderkey")
        incoming.join(existing, Seq("o_orderkey"), "left_anti")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice > 400000 AND o_orderkey NOT IN " +
        "(SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0) " +
        "ORDER BY o_orderkey")),

    // ---- J1: FK join contract↔function analog (`db.rs:76,83,86`) ---------
    // customer is the small dim ⇒ broadcast-hash join, no shuffle of orders.
    Q("q08_fk_join",
      (s, d) => orders(s, d)
        .join(broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, c_name, o_totalprice FROM orders " +
        "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey")),

    // ---- J1 at depth: multi-join + agg (TPC-H Q5 shape) ------------------
    // All dims broadcast; the only shuffle is the final groupBy on n_name.
    Q("q09_join_agg",
      (s, d) => lineitem(s, d)
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(Hashing.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy("r_name", "n_name"),
      Some("SELECT r_name, n_name, " +
        "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name, n_name ORDER BY r_name, n_name")),

    // ---- flagship group-agg (TPC-H Q1 shape; exercises partial agg) ------
    Q("q10_agg_pricing",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Hashing.decSum(col("l_quantity")).as("sum_qty"),
          Hashing.decSum(col("l_extendedprice")).as("sum_base"),
          Hashing.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc"),
          Hashing.decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 4)
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_base, " +
        "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS sum_disc, " +
        "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(20,6))) AS DOUBLE) AS sum_charge, " +
        "ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 4) AS avg_qty, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    // ---- J2: left-outer join + coalesce('') semantics --------------------
    // (`plain_contract.rs:503-508` — missing AST match ⇒ empty string;
    // here: customers with no qualifying orders ⇒ zeros.)
    Q("q11_leftouter",
      (s, d) => {
        val perCust = orders(s, d)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            Hashing.decSum(col("o_totalprice")).as("spend"))
        customer(s, d)
          .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("spend"), lit(0.0)).as("spend"))
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_name, COALESCE(n.n_orders, 0) AS n_orders, " +
        "COALESCE(n.spend, CAST(0 AS DOUBLE)) AS spend " +
        "FROM customer LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS spend " +
        "FROM orders GROUP BY o_custkey) n ON c_custkey = n.o_custkey " +
        "ORDER BY c_custkey")),

    // ---- A2: order-insensitive multiset hash (`plain_contract.rs:169-177`)
    Q("q12_multiset_hash",
      (s, d) => documents(s, d)
        .withColumn("h", Hashing.simpleHash(col("text")))
        .groupBy("source")
        .agg(Hashing.multisetHash(col("h")).as("mh"))
        .orderBy("source"),
      Some("SELECT source, md5(string_agg(h, '' ORDER BY h)) AS mh FROM " +
        "(SELECT source, md5(regexp_replace(text, '\\s+', '', 'g')) AS h " +
        "FROM documents) GROUP BY source ORDER BY source")),

    // ---- F1: content hash / dedup key (`utils.rs:12-17`) -----------------
    Q("q13_simple_hash",
      (s, d) => documents(s, d)
        .select(col("doc_id"), Hashing.simpleHash(col("text")).as("h"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, md5(regexp_replace(text, '\\s+', '', 'g')) AS h " +
        "FROM documents ORDER BY doc_id")),

    // ---- F5: JSON extraction from a string column (`db.rs:35-49`) --------
    Q("q14_json_extract",
      (s, d) => events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events ORDER BY event_id")),

    // ---- U2: 1→N flatten / explode (`plain_contract.rs:484-525`) ---------
    Q("q15_explode",
      (s, d) => embeddings(s, d)
        .filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("val").cast("double").as("val"))
        .orderBy("vec_id", "pos"),
      Some("SELECT * FROM (SELECT vec_id, UNNEST(range(len(embedding))) AS pos, " +
        "CAST(UNNEST(embedding) AS DOUBLE) AS val FROM embeddings WHERE vec_id < 5) " +
        "ORDER BY vec_id, pos")),

    // ---- A3: collect-list per group, order-normalized (`main.rs:291-329`)
    Q("q16_collect_roundtrip",
      (s, d) => orders(s, d)
        .groupBy("o_custkey")
        .agg(concat_ws(",", sort_array(collect_list(col("o_orderkey")))).as("ks"),
          count(lit(1)).as("n"))
        .orderBy("o_custkey"),
      Some("SELECT o_custkey, string_agg(CAST(o_orderkey AS VARCHAR), ',' " +
        "ORDER BY o_orderkey) AS ks, COUNT(*) AS n " +
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey")),

    // ---- O1: top-k (TakeOrderedAndProject — no full sort at scale) -------
    Q("q17_topk",
      (s, d) => orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc),
      Some("SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")),

    // ---- §2.9: ranking window (deterministic chunking re-expression) -----
    Q("q18_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn")),

    // ---- F6: compiler-version normalization (`plain_contract.rs:334-337`)
    // (synthetic version strings built from part columns; same in oracle)
    Q("q19_version_norm",
      (s, d) => part(s, d)
        .withColumn("ver", concat(lit("v"), col("p_size"), lit("."),
          col("p_partkey") % 100, lit("."), col("p_partkey") % 7, lit("-rc1")))
        .select(col("p_partkey"), col("ver"),
          regexp_extract(col("ver"), "v?(\\d+\\.\\d+\\.\\d+)", 1).as("version"))
        .orderBy("p_partkey"),
      Some("SELECT p_partkey, ver, regexp_extract(ver, 'v?(\\d+\\.\\d+\\.\\d+)', 1) AS version " +
        "FROM (SELECT p_partkey, concat('v', p_size, '.', p_partkey % 100, '.', " +
        "p_partkey % 7, '-rc1') AS ver FROM part) ORDER BY p_partkey")),

    // ---- F7: lossy string→typed coercions (`plain_contract.rs:52-62`) ----
    Q("q20_coercion",
      (s, d) => events(s, d)
        .select(col("event_id"),
          coalesce(expr("try_cast(get_json_object(props, '$.k') AS INT)"), lit(0)).as("k_int"),
          (col("event_type") === "purchase").as("flag"))
        .orderBy("event_id"),
      Some("SELECT event_id, COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER), 0) AS k_int, " +
        "event_type = 'purchase' AS flag FROM events ORDER BY event_id")),

    // ---- semi-join (EXISTS; §2.8 family) ----------------------------------
    Q("q21_semi_join",
      (s, d) => customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000) " +
        "ORDER BY c_custkey")),

    // ---- set ops: UNION (distinct) ---------------------------------------
    Q("q22_union",
      (s, d) => customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
        .union(orders(s, d).filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey").as("k")))
        .distinct()
        .orderBy("k"),
      Some("SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "UNION SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000 " +
        "ORDER BY k")),

    // ---- set ops: EXCEPT (distinct) --------------------------------------
    Q("q23_except",
      (s, d) => customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
        .except(orders(s, d).filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey").as("k")))
        .orderBy("k"),
      Some("SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "EXCEPT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000 " +
        "ORDER BY k")),

    // ---- F12: double-brace unwrap (`plain_contract.rs:258-263`) ----------
    Q("q24_brace_unwrap",
      (s, d) => events(s, d)
        .withColumn("wrapped", concat(lit("{"), col("props"), lit("}")))
        .select(col("event_id"),
          when(col("wrapped").startsWith("{{"),
            expr("substring(wrapped, 2, length(wrapped) - 2)"))
            .otherwise(col("wrapped")).as("unwrapped"))
        .orderBy("event_id"),
      Some("SELECT event_id, CASE WHEN starts_with(wrapped, '{{') THEN " +
        "substr(wrapped, 2, length(wrapped) - 2) ELSE wrapped END AS unwrapped " +
        "FROM (SELECT event_id, concat('{', props, '}') AS wrapped FROM events) " +
        "ORDER BY event_id")),

    // ---- F9: byte-offset slice (`plain_contract.rs:462-469`) -------------
    // UDF slices UTF-8 *bytes* (AST src offsets are byte-based); on the
    // all-ASCII corpus this equals substr, which the oracle uses. Non-ASCII
    // correctness is covered by ByteSliceSpec unit tests.
    Q("q25_byte_slice",
      (s, d) => {
        val slice = graft.functions.TextBytes.byteSliceUdf(s)
        documents(s, d).filter(col("n_chars") >= 30)
          .select(col("doc_id"), slice(col("text"), lit(10), lit(20)).as("piece"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, substr(text, 11, 20) AS piece FROM documents " +
        "WHERE n_chars >= 30 ORDER BY doc_id")),

    // ---- F4: derived row id (`functions.rs:31`) ---------------------------
    Q("q26_row_id",
      (s, d) => lineitem(s, d)
        .select("l_orderkey", "l_linenumber")
        // sort FIRST on the two numeric keys, derive the id AFTER: the
        // presentation gather then moves 12-byte rows instead of hauling
        // every 32-char hash through the exchange, and the id (a pure
        // function of the keys; trusted form — numeric casts + a fixed
        // '|' cannot contain whitespace, so the strip regexp is a no-op)
        // is computed on the sorted stream. Measured 2× on the full query.
        .orderBy("l_orderkey", "l_linenumber")
        .select(col("l_orderkey"), col("l_linenumber"),
          Hashing.rowIdTrusted(col("l_orderkey"), lit("|"), col("l_linenumber")).as("id")),
      Some("SELECT l_orderkey, l_linenumber, " +
        "md5(regexp_replace(concat(CAST(l_orderkey AS VARCHAR), '|', CAST(l_linenumber AS VARCHAR)), '\\s+', '', 'g')) AS id " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"))
  )
}
