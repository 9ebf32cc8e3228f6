package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Winnowing

/** Rolling-hash winnowing fingerprints: the SIGMOD'03 guarantees, pinned.
  */
class WinnowingSpec extends AnyFunSuite {

  test("rolling hashes equal direct k-gram hashes (the rolling identity)") {
    val s = "the quick brown fox jumps over the lazy dog"
    val k = 8
    val rolled = Winnowing.rollingHashes(s, k)
    val direct = s.getBytes("UTF-8").sliding(k).map { gram =>
      gram.foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))
    }.toArray
    assert(rolled.sameElements(direct))
  }

  test("identical k-grams at different positions hash identically") {
    val hs = Winnowing.rollingHashes("abcdefgh--abcdefgh", 8)
    assert(hs(0) == hs(10))
  }

  test("winnowing guarantee: shared substrings of length >= w+k-1 share a fingerprint") {
    val common = "a very distinctive shared passage of text"
    val a = "prefix one " + common + " suffix alpha"
    val b = "totally different opening " + common + " other ending"
    val fa = Winnowing.fingerprints(a).map(_._2).toSet
    val fb = Winnowing.fingerprints(b).map(_._2).toSet
    assert((fa & fb).nonEmpty)
    // and unrelated texts share nothing
    val fc = Winnowing.fingerprints("completely unrelated material here entirely").map(_._2).toSet
    assert((fa & fc).isEmpty)
  }

  test("density: at most one fingerprint per window position, gaps <= w") {
    val fps = Winnowing.fingerprints("x" + ("abcdefghij" * 20), k = 8, w = 4)
    val pos = fps.map(_._1)
    assert(pos == pos.sorted && pos.distinct == pos)
    pos.sliding(2).foreach {
      case Seq(p1, p2) => assert(p2 - p1 <= 4)
      case _ =>
    }
  }

  test("digest is deterministic and input-sensitive") {
    val d1 = Winnowing.digest("some document text here")
    assert(d1 == Winnowing.digest("some document text here"))
    // winnowing is deliberately lossy (a trailing-char edit may not touch
    // any selected minimum), so sensitivity is asserted on substantively
    // different content, the guarantee the sketch actually makes
    assert(d1 != Winnowing.digest("entirely different wording throughout"))
    assert(d1.matches("[0-9a-f]{32}"))
  }

  test("short inputs yield empty fingerprints, not errors") {
    assert(Winnowing.rollingHashes("abc", 8).isEmpty)
    assert(Winnowing.fingerprints("abc").isEmpty)
  }
}
