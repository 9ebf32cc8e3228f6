package graft.functions

/** Pure-Scala Keccak-256 (the pre-NIST-padding SHA-3 variant used by
  * Ethereum). Needed for ABI 4-byte function selectors — the reference gets
  * this from `alloy-json-abi` (`/root/reference/src/functions.rs:28-29`);
  * Spark has `sha2` but not keccak, so we implement Keccak-f[1600] directly.
  *
  * Parameters: rate 1088 bits (136 bytes), capacity 512, output 256 bits,
  * multi-rate padding `0x01 … 0x80` (NOT the SHA-3 `0x06` domain byte).
  *
  * Test vectors (KeccakSpec): keccak256("") =
  * c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470,
  * selector("transfer(address,uint256)") = 0xa9059cbb.
  */
object Keccak {
  private val RoundConstants: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r[x][y]
  private val RotOff: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private def keccakF(a: Array[Long]): Unit = {
    val b = new Array[Long](25)
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), RotOff(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RoundConstants(round)
      round += 1
    }
  }

  /** keccak-256 digest of the given bytes. */
  def hash256(input: Array[Byte]): Array[Byte] = {
    val rateBytes = 136
    val state = new Array[Long](25)
    // absorb full blocks
    var offset = 0
    while (input.length - offset >= rateBytes) {
      absorb(state, input, offset, rateBytes)
      keccakF(state)
      offset += rateBytes
    }
    // final block with multi-rate padding 0x01 ... 0x80
    val block = new Array[Byte](rateBytes)
    System.arraycopy(input, offset, block, 0, input.length - offset)
    block(input.length - offset) = 0x01
    block(rateBytes - 1) = (block(rateBytes - 1) | 0x80).toByte
    absorb(state, block, 0, rateBytes)
    keccakF(state)
    // squeeze 32 bytes (rate > 32, single squeeze)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) {
      out(i) = ((state(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  private def absorb(state: Array[Long], in: Array[Byte], off: Int, n: Int): Unit = {
    var i = 0
    while (i < n) {
      state(i / 8) ^= (in(off + i) & 0xffL) << (8 * (i % 8))
      i += 1
    }
  }

  private val HexChars = "0123456789abcdef".toCharArray
  def toHex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(HexChars((bytes(i) >> 4) & 0xf)).append(HexChars(bytes(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** keccak-256 of a UTF-8 string, lowercase hex. */
  def hash256Hex(s: String): String = toHex(hash256(s.getBytes("UTF-8")))

  /** Ethereum ABI 4-byte selector: "0x" + first 4 bytes of
    * keccak256(canonical signature) — `functions.rs:28-29`.
    */
  def selector(canonicalSignature: String): String =
    "0x" + hash256Hex(canonicalSignature).substring(0, 8)
}
