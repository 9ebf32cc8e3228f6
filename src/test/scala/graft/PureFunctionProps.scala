package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.contracts.{Export, Solidity}
import graft.functions.{Keccak, TextBytes}

/** ScalaCheck properties for the pure functions (SURVEY §5 strategy):
  * invariants that hold for ALL inputs, complementing the vector-pinned
  * unit tests.
  */
object PureFunctionProps extends Properties("graft.pure") {

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\n', '.', '{', '}')))
      .map(_.mkString)

  private val anyText: Gen[String] = Gen.oneOf(asciiText, Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('é', '日', 'a', ' ', 'ß')).map(_.mkString))

  property("byteSlice: full-range slice is identity") = forAll(anyText) { s =>
    TextBytes.byteSlice(s, 0, s.getBytes("UTF-8").length) == s
  }

  property("byteSlice: bounded output, total on valid boundaries") =
    forAll(anyText, Gen.chooseNum(-5, 50), Gen.chooseNum(0, 50)) { (s, start, len) =>
      // lossy decoding may turn EVERY sliced byte into a 3-byte U+FFFD
      // (each orphan continuation byte decodes separately), so the tight
      // bound is 3× the slice length
      TextBytes.byteSlice(s, start, len).getBytes("UTF-8").length <= 3 * math.max(0, len)
    }

  property("byteSlice: ASCII slices concatenate to the original") =
    forAll(asciiText, Gen.chooseNum(0, 100)) { (s, kRaw) =>
      val k = if (s.isEmpty) 0 else kRaw % (s.length + 1)
      TextBytes.byteSlice(s, 0, k) + TextBytes.byteSlice(s, k, s.length) == s
    }

  property("normalizeCrlf: no CRLF survives, content otherwise intact") =
    forAll(anyText) { s =>
      val n = TextBytes.normalizeCrlf(s + "\r\n" + s)
      !n.contains("\r\n") && n == s.replace("\r\n", "\n") + "\n" + s.replace("\r\n", "\n")
    }

  property("keccak: 32-byte digest, deterministic") = forAll(anyText) { s =>
    val d = Keccak.hash256(s.getBytes("UTF-8"))
    d.length == 32 && Keccak.hash256Hex(s) == Keccak.hash256Hex(s)
  }

  property("keccak selector: 0x + 8 lowercase hex") = forAll(asciiText) { s =>
    Keccak.selector(s).matches("0x[0-9a-f]{8}")
  }

  property("sanitizePath: never escapes, never absolute") =
    forAll(Gen.listOf(Gen.oneOf("..", ".", "a", "b.sol", "", "dir"))) { segs =>
      val out = Export.sanitizePath(segs.mkString("/"))
      !out.startsWith("/") && !out.split('/').contains("..")
    }

  property("canonicalType is idempotent") =
    forAll(Gen.oneOf("uint", "int", "byte", "uint256", "address", "bool",
      "bytes32", "string", "uint[]", "int[4]")) { t =>
      Solidity.canonicalType(Solidity.canonicalType(t)) == Solidity.canonicalType(t)
    }

  property("splitParams inverts mkString for flat params") =
    forAll(Gen.listOf(Gen.oneOf("uint a", "address b", "bool c", "bytes32[] d"))) { ps =>
      Prop(ps.isEmpty || Solidity.splitParams(ps.mkString(",")) == ps)
    }

  property("defaultExtension always yields an extension") =
    forAll(Gen.oneOf("Counter", "a.sol", "x.vy", "noext"),
      Gen.listOf(Gen.oneOf("Counter.sol", "a.sol"))) { (n, sib) =>
      val out = Export.defaultExtension(n, sib.toSet)
      out.contains('.') || sib.contains(n + ".sol")
    }
}
