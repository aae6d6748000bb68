package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Utf8

/** Strict UTF-8 intake gate: valid text round-trips exactly; every
  * class of invalid sequence — truncation, stray continuation,
  * overlong encoding, surrogate code point, out-of-range value —
  * returns None instead of silently becoming U+FFFD. */
class Utf8Spec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("valid text round-trips: ASCII, 2/3/4-byte, emoji, CJK-extB") {
    for (s <- Seq("", "plain ascii", "café €", "日本語",
                  "emoji 😀 pair", new String(Character.toChars(0x2A6A5)),
                  "mixed ß水𐐷 tail")) {
      assert(Utf8.decodeStrict(s.getBytes("UTF-8")).contains(s), s"round-trip: $s")
    }
  }

  test("truncated multi-byte sequences return None") {
    assert(Utf8.decodeStrict(b(0xc3)).isEmpty) // 2-byte lead, no continuation
    assert(Utf8.decodeStrict(b(0xe2, 0x82)).isEmpty) // 3-byte, one missing
    assert(Utf8.decodeStrict(b(0xf0, 0x9f, 0x98)).isEmpty) // 4-byte, one missing
    assert(Utf8.decodeStrict(b(0x61, 0xc3)).isEmpty) // truncation after valid prefix
  }

  test("invalid continuation bytes return None") {
    assert(Utf8.decodeStrict(b(0xc3, 0x28)).isEmpty) // continuation not 10xxxxxx
    assert(Utf8.decodeStrict(b(0xe2, 0x28, 0xa1)).isEmpty)
    assert(Utf8.decodeStrict(b(0x80)).isEmpty) // stray continuation byte
    assert(Utf8.decodeStrict(b(0x61, 0xbf, 0x62)).isEmpty)
  }

  test("overlong encodings return None") {
    assert(Utf8.decodeStrict(b(0xc0, 0xaf)).isEmpty) // '/' as 2 bytes
    assert(Utf8.decodeStrict(b(0xe0, 0x80, 0xaf)).isEmpty) // '/' as 3 bytes
    assert(Utf8.decodeStrict(b(0xf0, 0x80, 0x80, 0xaf)).isEmpty) // 4 bytes
    assert(Utf8.decodeStrict(b(0xc1, 0xbf)).isEmpty) // U+007F overlong
  }

  test("surrogates and out-of-range values return None") {
    assert(Utf8.decodeStrict(b(0xed, 0xa0, 0x80)).isEmpty) // U+D800
    assert(Utf8.decodeStrict(b(0xed, 0xbf, 0xbf)).isEmpty) // U+DFFF
    assert(Utf8.decodeStrict(b(0xf4, 0x90, 0x80, 0x80)).isEmpty) // U+110000
    assert(Utf8.decodeStrict(b(0xf8, 0x88, 0x80, 0x80, 0x80)).isEmpty) // 5-byte form
    assert(Utf8.decodeStrict(b(0xfe)).isEmpty)
    assert(Utf8.decodeStrict(b(0xff)).isEmpty)
  }

  test("offset/length form decodes the slice strictly") {
    val arr = b(0xff, 'o', 'k', 0xff)
    assert(Utf8.decodeStrict(arr, 1, 2).contains("ok"))
    assert(Utf8.decodeStrict(arr, 0, 3).isEmpty)
    assert(Utf8.decodeStrict(arr, 3, 5).isEmpty) // out of bounds, not a throw
  }
}
