package graft.contracts

import scala.sys.process._
import scala.util.Try

import graft.functions.Keccak

/** U1 seam (SURVEY §7.4): the reference invokes a pinned `solc` child
  * process per contract (`plain_contract.rs:327-377`); here that is a
  * pluggable per-file extraction backend so the derivation pipeline runs
  * identically with or without a compiler on the host. Backends are
  * instantiated executor-side inside `mapPartitions`/`flatMap` — one
  * initialization per partition, never per row, and never on the driver.
  */
trait CompilerBackend extends Serializable {
  def name: String

  /** ABI-visible functions of one (CRLF-normalized) Solidity source. */
  def extract(filename: String, source: String): Seq[SolFunction]

  /** Artifact-scoped extraction: ALL (filename, source) pairs of one
    * contract artifact together — the same compilation unit the
    * reference hands solc, which is what lets user-defined types
    * resolve across the artifact's files (r13). Default: the per-file
    * extraction, file-local scope.
    */
  def extractAll(files: Seq[(String, String)]): Seq[(String, SolFunction)] =
    files.flatMap { case (n, c) => extract(n, c).map(n -> _) }
}

/** Default backend: the compiler-free lexical scanner ([[Solidity]]).
  * Always available; golden-tested against the reference fixtures.
  */
object ScannerBackend extends CompilerBackend {
  override val name = "scanner"
  override def extract(filename: String, source: String): Seq[SolFunction] =
    Solidity.extractFunctions(source)

  /** Artifact-wide user-type resolution: one merged symbol table over
    * every file, so `releasable(IERC20Upgradeable, address)` resolves
    * through the interface DEFINED in a sibling vendored file — the
    * solc-visibility semantics, compiler-free. Delegates to
    * [[Solidity.extractAll]], which lexes each file exactly once.
    */
  override def extractAll(
      files: Seq[(String, String)]): Seq[(String, SolFunction)] =
    Solidity.extractAll(files)
}

/** Real-compiler backend: shells out to `solc --combined-json abi` and
  * derives signatures/selectors from the emitted ABI — the same
  * ABI-driven iteration as the reference (`plain_contract.rs:499-508`).
  * Source slices are empty (`""`) exactly as the reference emits when its
  * AST walk misses (`unwrap_or("")`, `plain_contract.rs:503-508`); pairing
  * with the scanner's slices is a join away.
  *
  * UNAVAILABLE in this zero-egress container (no solc binary) — guarded by
  * [[SolcBackend.available]] and exercised only where a compiler exists.
  */
final class SolcBackend(solcPath: String = "solc") extends CompilerBackend {
  override val name = "solc"

  override def extract(filename: String, source: String): Seq[SolFunction] = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-solc")
    try {
      val src = tmp.resolve("in.sol")
      java.nio.file.Files.writeString(src, source)
      // compile failures (syntax errors, unresolvable imports) log and
      // skip the file — the reference's per-contract policy
      // (`main.rs:301-304`); throwing here would abort the whole job
      Try(Seq(solcPath, "--combined-json", "abi", src.toString).!!) match {
        case scala.util.Success(out) => parseCombinedAbi(out)
        case scala.util.Failure(e) =>
          System.err.println(s"[graft] solc failed for $filename: ${e.getMessage}")
          Seq.empty
      }
    } finally deleteRecursively(tmp)
  }

  /** Artifact-scoped compile (r13): write ALL of the artifact's sources
    * into one tempdir preserving their relative paths and compile them
    * in a single solc invocation — imports between the artifact's files
    * (the vendored OpenZeppelin tree) then resolve exactly as in the
    * reference's per-contract compile, where the per-file default would
    * fail on the first `import`. Emitted functions are attributed to the
    * defining source path (solc's `path:Contract` key), matching the
    * scanner's per-file attribution.
    */
  override def extractAll(
      files: Seq[(String, String)]): Seq[(String, SolFunction)] = {
    if (files.isEmpty) return Seq.empty
    val tmp = java.nio.file.Files.createTempDirectory("graft-solc")
    // the WHOLE body follows the per-contract skip policy (the extract
    // comment above): a malformed artifact — unwritable source key,
    // path-component too long, nested-under-a-file layout — must log
    // and FALL BACK, never abort the derivation job
    try Try {
      // keep names inside the sandbox (the export sink's sanitization
      // concern, applied to compile input); sanitized rels can COLLIDE
      // ('/A.sol' vs 'A.sol'; 'A.sol' vs 'a.sol' on a case-insensitive
      // filesystem, where two case-variant names alias ONE on-disk
      // file) — disambiguate on the CASE-FOLDED key with a numbered
      // sibling dir so no file's functions silently compile against
      // another's content
      val written = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val seenFolded = scala.collection.mutable.HashSet.empty[String]
      files.foreach { case (name, content) =>
        val base = name.replace("..", "__").dropWhile(_ == '/')
        val rel = Iterator.from(0)
          .map(i => if (i == 0) base else s"dup$i/$base")
          .find(r => seenFolded.add(r.toLowerCase(java.util.Locale.ROOT))).get
        val p = tmp.resolve(rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, content)
        written += rel -> name
      }
      val cmd = Seq(solcPath, "--combined-json", "abi",
        "--base-path", tmp.toString) ++
        written.keys.toSeq.sorted.map(r => tmp.resolve(r).toString)
      // realpath both sides before relativizing: a symlinked tmpdir
      // (macOS /var -> /private/var, symlinked TMPDIR) makes solc
      // report canonical absolute keys that naive relativize turns
      // into ../.. garbage — and an unmapped key must NEVER leak the
      // random temp path into FunctionRow.filename (Derive hashes
      // filename into the row id; a per-run temp path would break
      // upsert idempotency). Unmappable rows are dropped LOUDLY.
      val realTmp = tmp.toRealPath()
      parseCombinedAbiWithPaths(cmd.!!).flatMap { case (path, fn) =>
        val p = java.nio.file.Paths.get(path)
        val rel = Try {
          if (p.isAbsolute) realTmp.relativize(p.toRealPath()).toString
          else path
        }.getOrElse(path)
        written.get(rel) match {
          case Some(orig) => Some(orig -> fn)
          case None =>
            System.err.println(s"[graft] solc output path unmappable, " +
              s"row dropped: $path (${fn.contractName}.${fn.functionName})")
            None
        }
      }
    } match {
      case scala.util.Success(out) => out
      case scala.util.Failure(e) =>
        // e.g. solc < 0.6.9 rejecting --base-path, or a source key the
        // sandbox cannot materialize: fall back to the per-file default
        // (import-free files still extract — the pre-r13 behavior)
        // rather than yielding nothing for the whole artifact
        System.err.println(s"[graft] solc artifact compile failed " +
          s"(falling back to per-file): ${e.getMessage}")
        super.extractAll(files)
    } finally deleteRecursively(tmp)
  }

  /** Close-safe recursive delete: Files.walk holds DirectoryStreams
    * until closed — an unclosed stream per compiled artifact leaks fds
    * on long-lived executors.
    */
  private def deleteRecursively(tmp: java.nio.file.Path): Unit =
    Try {
      val s = java.nio.file.Files.walk(tmp)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }: Unit

  /** [[parseCombinedAbi]] keeping each contract's source path. */
  def parseCombinedAbiWithPaths(
      json: String): Seq[(String, SolFunction)] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val contracts = root.path("contracts")
    import scala.jdk.CollectionConverters._
    contracts.properties().asScala.toSeq.flatMap { entry =>
      val key = entry.getKey // "path/to/file.sol:Contract"
      val path = key.substring(0, key.lastIndexOf(':').max(0))
      val contractName = key.split(':').last
      val abiNode = entry.getValue.path("abi")
      val abi = if (abiNode.isTextual) mapper.readTree(abiNode.asText()) else abiNode
      abi.elements().asScala.filter(_.path("type").asText() == "function").map { fn =>
        val fname = fn.path("name").asText()
        val inputs = fn.path("inputs").elements().asScala
          .map(_.path("type").asText()).mkString(",")
        val sig = s"$fname($inputs)"
        path -> SolFunction(contractName, fname,
          visibility = "public",
          signature = sig, selector = Keccak.selector(sig), sourceCode = "")
      }.toSeq
    }
  }

  /** Parse solc's combined-json via Jackson (already on the Spark
    * classpath): contracts → ABI entries of type "function".
    * (ABI entries are public/external by construction.)
    */
  def parseCombinedAbi(json: String): Seq[SolFunction] =
    parseCombinedAbiWithPaths(json).map(_._2)
}

object SolcBackend {
  /** True iff a solc binary is runnable on this host. */
  def available(solcPath: String = "solc"): Boolean =
    Try(Seq(solcPath, "--version").!!).isSuccess
}
