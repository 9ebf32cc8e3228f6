package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextBytes

/** F9 byte-offset slicing — Solidity AST `src` spans are byte offsets
  * (`plain_contract.rs:462-469`), so non-ASCII sources must slice on UTF-8
  * bytes, not chars.
  */
class ByteSliceSpec extends AnyFunSuite {

  test("ASCII slices match character semantics") {
    assert(TextBytes.byteSlice("hello world", 0, 5) == "hello")
    assert(TextBytes.byteSlice("hello world", 6, 5) == "world")
  }

  test("non-ASCII: offsets count UTF-8 bytes") {
    // "héllo": h=1 byte, é=2 bytes (0xC3 0xA9), l/l/o 1 byte each
    assert(TextBytes.byteSlice("héllo", 0, 3) == "hé")
    assert(TextBytes.byteSlice("héllo", 1, 2) == "é")
    assert(TextBytes.byteSlice("héllo", 3, 3) == "llo")
    // 3-byte CJK: "日本語" = 9 bytes
    assert(TextBytes.byteSlice("日本語", 3, 3) == "本")
    assert(TextBytes.byteSlice("日本語", 0, 6) == "日本")
  }

  test("split code point decodes to replacement char (from_utf8_lossy)") {
    // slicing é in half leaves a dangling 0xC3 lead byte
    assert(TextBytes.byteSlice("héllo", 0, 2) == "h�")
    assert(TextBytes.byteSlice("héllo", 2, 2) == "�l")
  }

  test("out-of-range is clamped, not thrown") {
    assert(TextBytes.byteSlice("abc", 10, 5) == "")
    // negative start clamps the *range* [start, start+len) to [0, n): the
    // window [-2, 0) is empty after clamping, it does not shift right
    assert(TextBytes.byteSlice("abc", -2, 2) == "")
    assert(TextBytes.byteSlice("abc", -1, 3) == "ab")
    assert(TextBytes.byteSlice("abc", 1, 100) == "bc")
    assert(TextBytes.byteSlice("abc", 2, 0) == "")
  }

  test("null passthrough") {
    assert(TextBytes.byteSlice(null, 0, 1) == null)
    assert(TextBytes.normalizeCrlf(null) == null)
  }

  test("CRLF normalization before offset math (F8)") {
    assert(TextBytes.normalizeCrlf("a\r\nb\r\n") == "a\nb\n")
    assert(TextBytes.normalizeCrlf("a\rb") == "a\rb") // bare CR untouched
    // post-normalization offsets line up with LF-only sources
    val src = TextBytes.normalizeCrlf("fn a()\r\n{ body }")
    assert(TextBytes.byteSlice(src, 7, 8) == "{ body }")
  }
}
