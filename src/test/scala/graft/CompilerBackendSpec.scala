package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.contracts.{ScannerBackend, SolcBackend, Solidity}

/** The U1 backend seam: scanner backend delegates to the lexical scanner;
  * solc backend's ABI parsing handles both combined-json shapes (abi as
  * array — modern solc — and as embedded JSON string — older solc) without
  * needing the binary itself.
  */
class CompilerBackendSpec extends AnyFunSuite {

  private val src =
    "contract T { function transfer(address to, uint amount) public {} }"

  test("ScannerBackend delegates to the lexical scanner") {
    assert(ScannerBackend.extract("T.sol", src) == Solidity.extractFunctions(src))
  }

  test("SolcBackend.parseCombinedAbi: abi as array (modern solc)") {
    val json =
      """{"contracts":{"in.sol:Token":{"abi":[
        |{"type":"function","name":"transfer","inputs":[
        |  {"name":"to","type":"address"},{"name":"amount","type":"uint256"}]},
        |{"type":"event","name":"Transfer","inputs":[]},
        |{"type":"function","name":"totalSupply","inputs":[]}
        |]}},"version":"0.8.19"}""".stripMargin
    val fns = new SolcBackend().parseCombinedAbi(json)
    assert(fns.map(_.signature).toSet ==
      Set("transfer(address,uint256)", "totalSupply()"))
    assert(fns.find(_.functionName == "transfer").get.selector == "0xa9059cbb")
    assert(fns.forall(_.contractName == "Token"))
    assert(fns.forall(_.sourceCode == "")) // ABI carries no source spans
  }

  test("SolcBackend.parseCombinedAbi: abi as JSON string (older solc)") {
    val json =
      """{"contracts":{"in.sol:Token":{"abi":
        |"[{\"type\":\"function\",\"name\":\"balanceOf\",\"inputs\":[{\"name\":\"a\",\"type\":\"address\"}]}]"
        |}},"version":"0.4.26"}""".stripMargin
    val fns = new SolcBackend().parseCombinedAbi(json)
    assert(fns.map(_.selector) == Seq("0x70a08231")) // balanceOf(address)
  }

  test("SolcBackend availability probe is false in this container") {
    assert(!SolcBackend.available())
  }
}
