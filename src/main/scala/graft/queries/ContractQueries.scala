package graft.queries

import org.apache.spark.sql.functions._

import graft.contracts.{Derive, Ingest}

/** The contract-domain pipeline (SURVEY §3.1–§3.3) run against the
  * reference's own fixture tree (read-only at /root/reference/contracts).
  * These exercise S1–S4 ingest, classification, content-hash dedup and the
  * U2/U3 function derivation end-to-end; golden values are pinned by
  * ContractPipelineSpec, so the registry entries are rows-only checks (the
  * folder-classification semantics are not expressible as DuckDB SQL over
  * the parquet corpus).
  */
object ContractQueries {

  private val fixtureRoot = "/root/reference/contracts"

  val all: Seq[Q] = Seq(

    // S1–S4 + F1/A2 + F7: the contract table (sfDir ignored — the input is
    // the reference fixture tree, not the synthetic corpus).
    Q("q45_contract_ingest",
      (s, _) => Ingest.contracts(s, fixtureRoot)
        .select(col("id"), col("name"), col("source_type"),
          size(col("files")).as("n_files"),
          col("metadata.compiler_version").as("compiler_version"),
          col("metadata.runs").as("runs"),
          col("metadata.optimization_used").as("optimization_used"))
        .orderBy("id"),
      None,
      bench = false),

    // U2/U3 + F2/F3/F4: the function table derivation.
    Q("q46_contract_functions",
      (s, _) => Derive.functionTable(s, fixtureRoot),
      None,
      bench = false)
  )
}
