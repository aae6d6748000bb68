package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jsonl

/** Strict JSONL record codec: escape/parse must be exact inverses on
  * every string (the t26/e16 oracle identity depends on it), and every
  * malformation class must return None — never throw, never misread.
  * No Spark involved. */
class JsonlSpec extends AnyFunSuite {

  test("record/parseRecord round-trips hostile bodies exactly") {
    val bodies = Seq(
      "", "plain ascii", "with \"quotes\" and \\backslashes\\",
      "newline\nand\rreturn\tand tab",
      "control  chars", "trailing backslash risk \\",
      "unicode é ü 漢字 и", "non-BMP 😀 emoji pair",
      "{\"looks\":\"like json\"}", "comma, colon: brace} bracket]",
      " leading and trailing spaces ")
    for ((b, k) <- bodies.zipWithIndex) {
      val line = Jsonl.record(k.toLong * 7, k.toLong, b)
      assert(!line.contains('\n') && !line.contains('\r'),
        s"framing must stay newline-free: $line")
      val r = Jsonl.parseRecord(line).getOrElse(fail(s"parse None for body #$k"))
      assert(r == Jsonl.Rec(k.toLong * 7, k.toLong, b), s"round-trip drift #$k")
    }
  }

  test("key order is free; whitespace tolerated; \\u escapes decode") {
    assert(Jsonl.parseRecord("""{"body":"x","doc":3,"seq":1}""")
      .contains(Jsonl.Rec(3, 1, "x")))
    assert(Jsonl.parseRecord("""{ "doc" : 3 , "seq" : 1 , "body" : "x" }""")
      .contains(Jsonl.Rec(3, 1, "x")))
    assert(Jsonl.parseRecord("""{"doc":3,"seq":1,"body":"aAé"}""")
      .contains(Jsonl.Rec(3, 1, "aAé")))
    // surrogate pair via two \u escapes
    assert(Jsonl.parseRecord("""{"doc":3,"seq":1,"body":"😀"}""")
      .contains(Jsonl.Rec(3, 1, "😀")))
    assert(Jsonl.parseRecord("""{"doc":-5,"seq":0,"body":""}""")
      .contains(Jsonl.Rec(-5, 0, "")))
    // full Long range round-trips; "-0" and bare "0" are valid RFC
    // 8259 ints (the leading-zero ban is on MULTI-digit forms)
    assert(Jsonl.parseRecord(
      s"""{"doc":${Long.MaxValue},"seq":0,"body":""}""")
      .contains(Jsonl.Rec(Long.MaxValue, 0, "")))
    assert(Jsonl.parseRecord(
      s"""{"doc":${Long.MinValue},"seq":0,"body":""}""")
      .contains(Jsonl.Rec(Long.MinValue, 0, "")))
    assert(Jsonl.parseRecord("""{"doc":-0,"seq":0,"body":""}""")
      .contains(Jsonl.Rec(0, 0, "")))
    assert(Jsonl.parseRecord("""{"doc":0,"seq":0,"body":""}""")
      .contains(Jsonl.Rec(0, 0, "")))
  }

  test("every malformation class returns None, never throws") {
    val bad = Seq(
      "", "   ", "not json", "{", "}",
      """{"doc":1,"seq":2,"body":"x"""", // unterminated string
      """{"doc":1,"seq":2,"body":"x}""", // closing brace inside string
      """{"doc":1,"seq":2}""", // missing body
      """{"doc":1,"body":"x"}""", // missing seq
      """{"doc":1,"seq":2,"body":"x","doc":3}""", // duplicate key
      """{"doc":1,"seq":2,"body":"x","extra":1}""", // unknown key
      """{"doc":1,"seq":2,"body":"x"} tail""", // trailing garbage
      """{"doc":1,"seq":2,"body":"x"}{"doc":2}""", // second object
      """{"doc":1,"seq":2,"body":"bad \q escape"}""", // invalid escape
      """{"doc":1,"seq":2,"body":"short """ + "\\u00g1\"}", // bad hex digit
      """{"doc":1,"seq":2,"body":"trunc """ + "\\u00\"}", // truncated unicode escape
      "{\"doc\":1,\"seq\":2,\"body\":\"raw  ctl\"}", // raw control char
      """{"doc":99999999999999999999,"seq":2,"body":"x"}""", // long overflow
      // overflow forms that WRAP BACK POSITIVE under naive v*10+d —
      // a post-hoc sign test accepts 2^65+1 as 1 (round-13 advice)
      """{"doc":36893488147419103233,"seq":2,"body":"x"}""",
      """{"doc":40000000000000000000,"seq":2,"body":"x"}""",
      """{"doc":9223372036854775808,"seq":2,"body":"x"}""", // MaxValue+1
      """{"doc":-9223372036854775809,"seq":2,"body":"x"}""", // MinValue-1
      """{"doc":007,"seq":2,"body":"x"}""", // RFC 8259: no leading zeros
      """{"doc":01,"seq":2,"body":"x"}""",
      """{"doc":,"seq":2,"body":"x"}""", // no digits
      """{"doc":1 "seq":2,"body":"x"}""", // missing comma
      """{"doc":"1","seq":2,"body":"x"}""", // string where int expected
      """["doc",1]""") // array, not object
    bad.foreach { l =>
      assert(Jsonl.parseRecord(l).isEmpty, s"must reject: $l")
    }
    // the t26 corruption form: closing quote+brace dropped
    val line = Jsonl.record(1, 0, "any body at all")
    assert(Jsonl.parseRecord(line.dropRight(2)).isEmpty,
      "dropRight(2) corruption must always be malformed")
    assert(Jsonl.parseRecord(Jsonl.record(1, 0, "")
      .dropRight(2)).isEmpty, "empty-body corruption must be malformed too")
  }
}
