package graft.contracts

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** U2: the `index-functions` derivation pipeline (`main.rs:260-338`,
  * `plain_contract.rs:484-525`) — contract rows → per-function rows.
  *
  * Spark shape (SURVEY §3.2): `filter(≠vyper) → flatMap(scan) → table`;
  * the reference's tokio-task/Mutex/barrier machinery disappears into
  * partition parallelism, and the solc subprocess is replaced by the
  * compiler-free [[Solidity]] scanner (the `CompilerBackend` seam of
  * SURVEY §7.4). Each task scans its partition's contracts independently —
  * at 100 TB this is a pure map stage, no shuffle at all until the sink's
  * id-dedup.
  */
object Derive {

  final case class FileEntry(name: String, content: String)

  /** One contract artifact with all of its files — the extraction unit
    * since r13 (user types resolve across an artifact's files, so the
    * whole artifact goes to the backend together, exactly as the
    * reference hands solc the full compilation unit). The grouping costs
    * nothing: `contracts.files` is already one array per row — this is
    * simply NOT exploding before extraction, so the stage stays a pure
    * map with zero shuffle.
    */
  final case class ContractFiles(
      contract_id: String,
      files: Seq[FileEntry])

  /** function table rows (db.rs:74-84 schema, plus the `resolved` flag —
    * false marks rows whose param types the compiler-free scanner cannot
    * expand to ABI encodings; their `selector` is null, never a guess).
    */
  final case class FunctionRow(
      id: String,
      contract_id: String,
      contract_name: String,
      function_name: String,
      filename: String,
      signature: String,
      selector: String,
      source_code: String,
      resolved: Boolean)

  /** contracts (Ingest schema) → function table. The backend seam (U1,
    * SURVEY §7.4) defaults to the compiler-free scanner; pass a
    * [[SolcBackend]] where a solc binary exists.
    */
  def functions(contracts: DataFrame,
      backend: CompilerBackend = ScannerBackend): Dataset[FunctionRow] = {
    val s = contracts.sparkSession
    import s.implicits._
    contracts
      .filter(col("source_type") =!= "vyper") // P6 language gate (main.rs:298-300)
      .select(col("id").as("contract_id"), col("files"))
      .as[ContractFiles]
      .flatMap { cf =>
        // standard-json containers expand to their sources map here (the
        // get_source_files analog) — a json-type contract's functions
        // come from the expanded .sol entries, like the reference's
        // compile step. The ARTIFACT extracts as one unit (extractAll)
        // so user types resolve across its files (r13).
        val expanded = cf.files
          .flatMap(f => SourceFiles.expand(f.name, f.content))
          .filter(_._1.endsWith(".sol"))
        backend.extractAll(expanded).map { case (filename, fn) =>
          FunctionRow(
            // F4 row id = simple_hash(contract_id ‖ filename ‖ selector)
            // (functions.rs:31 → utils.rs:12-17): the concat is
            // whitespace-STRIPPED before md5, so filenames containing
            // spaces (standard-json source keys) hash like the reference's.
            // Unresolved rows have no selector (null, see SolFunction
            // .resolved) — their id keys on the signature instead, which
            // is equally unique per (contract, file) and deterministic.
            id = graft.functions.Hashing.simpleHashString(
              cf.contract_id + filename +
                (if (fn.selector != null) fn.selector else fn.signature)),
            contract_id = cf.contract_id,
            contract_name = fn.contractName,
            function_name = fn.functionName,
            filename = filename,
            signature = fn.signature,
            selector = fn.selector,
            source_code = fn.sourceCode,
            resolved = fn.resolved)
        }
      }
  }

  /** Full derivation as a registry query: deterministic ordering, key
    * columns only (source_code slices are asserted by golden specs).
    */
  def functionTable(s: SparkSession, root: String): DataFrame =
    functions(Ingest.contracts(s, root))
      .toDF()
      .select("id", "contract_id", "contract_name", "function_name",
        "filename", "signature", "selector", "resolved")
      .orderBy("contract_id", "filename", "signature")
}
