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

  // ---- media fingerprint (X109, r15 skip-gram sketch) -------------------

  private val payload: Gen[Array[Byte]] =
    Gen.chooseNum(125, 600).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  property("fingerprintOf: a 1-byte substitution flips at most 8 bits (any payload, any position)") =
    forAll(payload, Gen.chooseNum(0, 1 << 20), Gen.chooseNum(0, 255)) {
      (p, posRaw, bRaw) =>
        val pos = posRaw % p.length
        val q = p.clone(); q(pos) = bRaw.toByte
        // a byte at position pos is sampled only by the skip-gram windows
        // starting at pos, pos−1, pos−3, pos−5 (≤ 4 windows; fewer at
        // the payload edges — the AuditSpec/SinkSpec position-0 fixtures
        // see exactly 1). Each changed window toggles TWO bucket
        // parities (its old gram removed, its new gram added), so the
        // tight universal bound is 8 — this property originally claimed
        // 4 and ScalaCheck falsified it (the corpus tests never edited
        // an interior byte). The verify radius stays a CONTRACT (near-
        // identity), not an edit-distance guarantee: q129's calibration
        // row prices the band recall of any wider radius directly.
        graft.multimodal.Multimodal.hammingOf(
          graft.multimodal.Multimodal.fingerprintOf(p),
          graft.multimodal.Multimodal.fingerprintOf(q)) <= 8
    }

  property("fingerprintOf: a contiguous k-byte edit flips at most 2(k+5) bits") =
    forAll(payload, Gen.chooseNum(0, 1 << 20), Gen.chooseNum(1, 16),
      Gen.chooseNum(0, 255)) { (p, posRaw, k, bRaw) =>
      val pos = posRaw % p.length
      val q = p.clone()
      var i = 0
      while (i < k && pos + i < q.length) { q(pos + i) = bRaw.toByte; i += 1 }
      // the edited span touches windows starting in [pos−5, pos+k−1]:
      // ≤ k+5 windows, each toggling ≤ 2 bucket parities
      graft.multimodal.Multimodal.hammingOf(
        graft.multimodal.Multimodal.fingerprintOf(p),
        graft.multimodal.Multimodal.fingerprintOf(q)) <= 2 * (k + 5)
    }

  property("fingerprintOf: position-invariant bag semantics — a rotation by a window-aligned prefix swap preserves most bits") =
    forAll(payload, Gen.chooseNum(6, 60)) { (p, cut0) =>
      // moving a prefix to the end preserves every window EXCEPT the ≤ 10
      // windows straddling the two seam points (the old start/cut and the
      // new join) — the bag-of-windows sketch moves ≤ 2·(seam windows)
      // bits while a positional sketch would be destroyed
      val cut = cut0 % (p.length - 6)
      val q = p.drop(cut) ++ p.take(cut)
      graft.multimodal.Multimodal.hammingOf(
        graft.multimodal.Multimodal.fingerprintOf(p),
        graft.multimodal.Multimodal.fingerprintOf(q)) <= 20
    }

  property("fingerprintOf: packed longs use exactly 60 bits each") =
    forAll(payload) { p =>
      val f = graft.multimodal.Multimodal.fingerprintOf(p)
      (f(0) >>> 60) == 0L && (f(1) >>> 60) == 0L
    }
}
