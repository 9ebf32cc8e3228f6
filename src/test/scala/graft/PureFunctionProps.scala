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

  private val tokens: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yy", "日本"))

  property("simhash60: invariant under token permutation AND duplication") =
    forAll(tokens, Gen.chooseNum(0L, Long.MaxValue)) { (ws, seed) =>
      // the fingerprint is a function of the DISTINCT token set — the
      // guarantee that makes it a near-dup signal: reordering a document
      // or repeating its phrases must not move it
      val base = graft.functions.Hashing.simhash60(ws.toArray)
      val rnd = new scala.util.Random(seed)
      val shuffledDup = rnd.shuffle(ws ++ ws.take(ws.length / 2)).toArray
      val again = graft.functions.Hashing.simhash60(shuffledDup)
      Prop(
        if (ws.isEmpty) base == null && again == null
        else base != null && base == again && (base.longValue() >>> 60) == 0L)
    }

  property("resizeStub: width-bounded, every byte drawn from the payload in order") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.chooseNum(1, 64)) { (bs, w) =>
      val p = bs.map(_.toByte).toArray
      val out = graft.multimodal.Multimodal.resizeStub(p, w)
      Prop(
        if (p.isEmpty) out.isEmpty
        else out.length == w && out.zipWithIndex.forall { case (b, j) =>
          b == p(((j.toLong * p.length) / w).toInt)
        })
    }

  property("frameSampleStub: frames tile the payload prefix without gaps or overlap when stride = frameLen") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.chooseNum(1, 8)) { (bs, k) =>
      val p = bs.map(_.toByte).toArray
      val stride = math.max(1, p.length / k)
      val frames = graft.multimodal.Multimodal.frameSampleStub(p, k, stride)
      // with frameLen == stride the windows are consecutive: concatenating
      // them reproduces the payload prefix they cover, and indexes are 0..k-1
      val whole = frames.sortBy(_._1).flatMap(_._2).toArray
      Prop(frames.map(_._1) == (0 until k) &&
        whole.sameElements(p.take(whole.length)) &&
        whole.length == math.min(p.length, k.toLong * stride).toInt)
    }
}
