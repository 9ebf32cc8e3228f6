package graft.queries

import org.apache.spark.sql.functions._

import graft.contracts.{Derive, Ingest}

/** The contract-domain pipeline (SURVEY §3.1–§3.3) run against the
  * reference's own fixtures. These exercise S1–S4 ingest, classification,
  * content-hash dedup and the U2/U3 function derivation end-to-end; golden
  * values are pinned by ContractPipelineSpec, and the registry entries are
  * hash-checked against pinned-constant oracles (the fixture tree is
  * frozen, so its expected rows are literals — the q44 pattern).
  */
object ContractQueries {

  /** Composed fixture root: the reference's demo metadata-folder contract
    * plus its Bueno721Drop etherscan dump laid out the way the reference's
    * scan filter expects — an address-named folder holding the
    * address-prefixed file (`main.rs:136-142`). The reference repo keeps
    * that dump at the fixture ROOT, where the directory scan's prefix rule
    * faithfully SKIPS it (the reference's own golden test bypasses the
    * scan via the per-file API, `plain_contract.rs:580-581`); composing
    * the conforming layout keeps the full OpenZeppelin-tree coverage
    * flowing through the REAL scan path. Built once per host under /tmp:
    * staged into a fresh temp directory, then atomically renamed into
    * place — a concurrent first build or a crashed previous one can never
    * leave a partial tree visible (the loser of the rename race reuses
    * the winner's complete tree).
    */
  private[graft] lazy val fixtureRoot: String = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    def deleteTree(root: Path): Unit =
      if (Files.exists(root)) {
        scala.util.Using.resource(Files.walk(root)) { w =>
          w.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
        }
      }
    val src = Paths.get("/root/reference/contracts")
    val addr = "0x9ca84eacf0d0775782ab5b34d01187b37f1ceea4"
    val base = Paths.get("/tmp/graft-fixture-tree")
    val ethFile = base.resolve(addr).resolve(s"${addr}_Bueno721Drop.json")
    if (!Files.exists(ethFile)) {
      // the etherscan file is the completeness marker (copied last into
      // the stage): a tree without it is a broken partial build from a
      // crashed process — remove it rather than let the rename race
      // handler below mistake it for a winner's complete tree
      deleteTree(base)
      val stage = Files.createTempDirectory(base.getParent, "graft-fixture-stage")
      Files.createDirectories(stage.resolve(addr))
      Files.createDirectories(stage.resolve("demo"))
      scala.util.Using.resource(Files.list(src.resolve("demo"))) { listing =>
        listing.forEach { p =>
          Files.copy(p, stage.resolve("demo").resolve(p.getFileName.toString),
            StandardCopyOption.REPLACE_EXISTING)
        }
      }
      Files.copy(src.resolve(s"${addr}_Bueno721Drop.json"),
        stage.resolve(addr).resolve(s"${addr}_Bueno721Drop.json"),
        StandardCopyOption.REPLACE_EXISTING)
      try Files.move(stage, base, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // another process won the race: keep theirs, discard the stage
        case _: java.nio.file.FileAlreadyExistsException |
            _: java.nio.file.AccessDeniedException |
            _: java.nio.file.DirectoryNotEmptyException =>
          deleteTree(stage)
      }
      // whoever won, the tree must now be COMPLETE — a missing marker
      // here means concurrent partial state; failing loudly beats
      // feeding q45/q46 a wrong fixture
      require(Files.exists(ethFile),
        s"fixture tree build finished without its completeness marker $ethFile")
    }
    base.toString
  }

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
      Some(Q.pinned("q45_oracle.sql")),
      bench = false),

    // U2/U3 + F2/F3/F4: the function table derivation.
    Q("q46_contract_functions",
      (s, _) => Derive.functionTable(s, fixtureRoot),
      Some(Q.pinned("q46_oracle.sql")),
      bench = false)
  )
}
