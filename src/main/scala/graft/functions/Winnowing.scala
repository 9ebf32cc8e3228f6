package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Document fingerprinting by rolling hash + winnowing (Schleimer,
  * Wilkerson, Aiken: "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003).
  *
  * A Rabin–Karp polynomial rolling hash slides a k-byte window over the
  * UTF-8 text in O(n); winnowing then keeps the minimum hash of every
  * w-hash window (rightmost minimum on ties), guaranteeing any match of
  * length ≥ w+k−1 between two documents shares a fingerprint — the
  * standard local sketch for plagiarism/near-dup detection at corpus
  * scale. Pure function: runs map-side as a UDF, no shuffle until the
  * fingerprint join.
  */
object Winnowing {

  /** 64-bit Rabin–Karp rolling hashes of every k-gram (byte-level). */
  def rollingHashes(text: String, k: Int): Array[Long] = {
    if (text == null) return Array.empty
    val bytes = text.getBytes("UTF-8")
    if (bytes.length < k) return Array.empty
    val B = 1000003L // odd base, coprime with 2^64
    var pow = 1L // B^(k-1)
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    val out = new Array[Long](bytes.length - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    out(0) = h
    i = k
    while (i < bytes.length) {
      h = (h - (bytes(i - k) & 0xffL) * pow) * B + (bytes(i) & 0xffL)
      out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Winnowed fingerprint set: (position, hash) of each selected minimum,
    * window = w consecutive k-gram hashes, rightmost minimum on ties.
    */
  def fingerprints(text: String, k: Int = 8, w: Int = 4): Seq[(Int, Long)] = {
    val hs = rollingHashes(text, k)
    if (hs.isEmpty) return Seq.empty
    val out = ArrayBuffer.empty[(Int, Long)]
    var last = -1
    var start = 0
    val n = hs.length
    while (start + w <= n) {
      // rightmost minimum of hs[start, start+w)
      var mi = start
      var j = start + 1
      while (j < start + w) {
        if (java.lang.Long.compareUnsigned(hs(j), hs(mi)) <= 0) mi = j
        j += 1
      }
      if (mi != last) { out += ((mi, hs(mi))); last = mi }
      start += 1
    }
    out.toSeq
  }

  /** Compact digest of an already-computed fingerprint set. */
  def digestOf(fps: Seq[(Int, Long)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    fps.foreach { case (_, h) =>
      var i = 0
      while (i < 8) { md.update(((h >>> (8 * i)) & 0xff).toByte); i += 1 }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Compact digest of the fingerprint multiset (stable across runs). */
  def digest(text: String, k: Int = 8, w: Int = 4): String =
    digestOf(fingerprints(text, k, w))
}
