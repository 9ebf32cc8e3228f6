package graft.contracts

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** S11: filesystem export sink (`plain_contract.rs:528-535` →
  * `write_entries` `:204-225`, `sanitize_path` `:228-240`). Point-lookup a
  * contract by id, explode its files, materialize them under `outDir` —
  * tiny cardinality by construction, so the collect-then-write is the
  * right shape (SURVEY §3.3).
  */
object Export {

  /** Drop `..` components and any absolute-root prefix — forced-relative
    * path (`plain_contract.rs:228-240`).
    */
  def sanitizePath(p: String): String =
    p.split('/').iterator
      .filter(seg => seg.nonEmpty && seg != "." && seg != "..")
      .mkString("/")

  /** Append ".sol" iff the name has no extension and the extended name
    * does not collide with an existing sibling (`plain_contract.rs:207-216`).
    */
  def defaultExtension(name: String, siblings: Set[String]): String = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    if (base.contains('.')) name
    else if (siblings.contains(name + ".sol")) name
    else name + ".sol"
  }

  /** Expand standard-json containers to their sources, then write — the
    * full export policy (`get_source_files` → `write_entries`,
    * `plain_contract.rs:322-324`). The single entry point for both the
    * library export and the CLI, so the expansion cannot be forgotten on
    * one path.
    */
  def exportEntries(entries: Seq[(String, String)], outDir: String): Seq[Path] =
    writeEntries(entries.flatMap { case (n, c) => SourceFiles.expand(n, c) }, outDir)

  /** Sanitize, default extensions, and write (name, content) entries
    * under `outDir` — the `write_entries` analog
    * (`plain_contract.rs:204-225`).
    */
  def writeEntries(entries: Seq[(String, String)], outDir: String): Seq[Path] = {
    val names = entries.map(e => sanitizePath(e._1)).toSet
    entries.map { case (name, content) =>
      val rel = defaultExtension(sanitizePath(name), names)
      val target = Paths.get(outDir).resolve(rel)
      Files.createDirectories(target.getParent)
      Files.writeString(target, content)
      target
    }
  }

  /** Point-lookup a contract in any contract-table DataFrame and export
    * its (expanded) source files — the single S6→S11 pipeline shared by
    * the library and the CLI. Empty result means the id does not exist
    * (the reference errors with "Contract not found", `main.rs:162-165`);
    * callers decide how loudly.
    */
  def exportFrom(contracts: org.apache.spark.sql.DataFrame, contractId: String,
      outDir: String): Seq[Path] = {
    val rows = contracts
      .filter(col("id") === contractId).limit(1)
      .select(explode(col("files")).as("f"))
      .select(col("f.name"), col("f.content"))
      .collect()
    exportEntries(rows.toSeq.map(r => (r.getString(0), r.getString(1))), outDir)
  }

  /** Export one contract's source files; returns the paths written. */
  def exportSource(s: SparkSession, root: String, contractId: String,
      outDir: String): Seq[Path] =
    exportFrom(Ingest.contracts(s, root), contractId, outDir)
}
