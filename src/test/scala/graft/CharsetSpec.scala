package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Charset

/** WHATWG-style encoding resolution (graft.sources.Charset): the
  * windows-1252 table is cross-validated entry-by-entry against the
  * JDK's cp1252 on the 27 assigned slots (the five unassigned slots
  * pin the WHATWG C1-control rule the JDK refuses), label resolution
  * pins the registry's superset rule, and the resolution ladder
  * (BOM > header > meta > fallback) is exercised arm by arm. */
class CharsetSpec extends AnyFunSuite {

  test("windows-1252: all 27 assigned high slots match the JDK charset") {
    val jdk = java.nio.charset.Charset.forName("windows-1252")
    val unassigned = Set(0x81, 0x8D, 0x8F, 0x90, 0x9D)
    for (b <- 0x80 to 0x9F if !unassigned(b)) {
      val dec = jdk.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val expect = dec.decode(java.nio.ByteBuffer.wrap(Array(b.toByte))).toString
      val got = Charset.decodeWindows1252(Array(b.toByte))
      assert(got == expect, f"0x$b%02X: got U+${got.head.toInt}%04X expect U+${expect.head.toInt}%04X")
    }
    // the WHATWG rule for the unassigned slots: C1 controls pass through
    for (b <- unassigned)
      assert(Charset.decodeWindows1252(Array(b.toByte)) == b.toChar.toString)
    // below 0x80 and at-or-above 0xA0: identity with latin-1
    for (b <- Seq(0x00, 0x41, 0x7F, 0xA0, 0xE9, 0xFF))
      assert(Charset.decodeWindows1252(Array(b.toByte)).head.toInt == b)
  }

  test("windows-1252 encode/decode round-trips; unmappable chars reject") {
    val s = "café «déjà-vu» — “smart” …€ŠŸžœ‰"
    val b = Charset.encodeWindows1252(s).getOrElse(fail("encode None"))
    assert(Charset.decodeWindows1252(b) == s)
    assert(Charset.encodeWindows1252("∀x").isEmpty) // outside the repertoire
    assert(Charset.encodeWindows1252("日本").isEmpty)
  }

  test("label resolution: the WHATWG superset rule and the bare utf-16 rule") {
    for (l <- Seq("ISO-8859-1", "latin1", "L1", "us-ascii", "ASCII",
                  "windows-1252", "cp1252", " Windows-1252 ", "\"iso-8859-1\""))
      assert(Charset.resolveLabel(l).contains("windows-1252"), l)
    for (l <- Seq("utf-8", "UTF8", "'utf-8'"))
      assert(Charset.resolveLabel(l).contains("utf-8"), l)
    assert(Charset.resolveLabel("utf-16").contains("utf-16le"))
    assert(Charset.resolveLabel("UTF-16BE").contains("utf-16be"))
    assert(Charset.resolveLabel("shift_jis").isEmpty) // outside the profile
  }

  test("charset parameter parses out of Content-Type values") {
    assert(Charset.charsetParam("text/html; charset=utf-8").contains("utf-8"))
    assert(Charset.charsetParam("text/html;charset=\"windows-1252\"")
      .contains("\"windows-1252\""))
    assert(Charset.charsetParam("text/plain; boundary=x; CHARSET=latin1")
      .contains("latin1"))
    assert(Charset.charsetParam("text/plain").isEmpty)
    assert(Charset.charsetParam("text/plain; charsetx=utf-8").isEmpty)
  }

  test("meta prescan finds charset attr and http-equiv forms in the first 1024 bytes") {
    def pre(s: String) = Charset.metaPrescan(s.getBytes("ISO-8859-1"))
    assert(pre("<html><META CHARSET=utf-8><body>").contains("utf-8"))
    assert(pre("<meta charset=\"iso-8859-1\">").contains("iso-8859-1"))
    assert(pre("<meta charset='windows-1252'>").contains("windows-1252"))
    assert(pre("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=latin1\">").contains("latin1"))
    // the tag name must be exactly `meta` + delimiter (WHATWG)
    assert(pre("<metal charset=x>").isEmpty)
    assert(pre("<meta/charset=utf-8>").contains("utf-8"))
    assert(pre("no meta here").isEmpty)
    // past the 1024-byte window: not found
    assert(pre(" " * 1200 + "<meta charset=utf-8>").isEmpty)
  }

  test("resolution ladder: BOM > header > meta > fallback, all accounted") {
    val text = "héllo — wörld"
    val u8 = text.getBytes("UTF-8")
    val cp = Charset.encodeWindows1252(text).get
    // BOM beats a contradicting header
    val bomU8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ u8
    val d1 = Charset.decode(bomU8, Some("text/html; charset=windows-1252"), htmlPrescan = true).get
    assert(d1.text == text && d1.encoding == "utf-8" && d1.source == "bom")
    // UTF-16LE BOM
    val bomLe = Array(0xFF.toByte, 0xFE.toByte) ++ text.getBytes("UTF-16LE")
    val d2 = Charset.decode(bomLe, None, htmlPrescan = false).get
    assert(d2.text == text && d2.encoding == "utf-16le" && d2.source == "bom")
    // header declaration
    val d3 = Charset.decode(cp, Some("text/plain; charset=iso-8859-1"), htmlPrescan = false).get
    assert(d3.text == text && d3.encoding == "windows-1252" && d3.source == "header")
    // meta prescan
    val page = ("<meta charset=windows-1252>\n" + text)
    val d4 = Charset.decode(Charset.encodeWindows1252(page).get, Some("text/html"), htmlPrescan = true).get
    assert(d4.text == page && d4.encoding == "windows-1252" && d4.source == "meta")
    // fallback: valid UTF-8 stays UTF-8
    val d5 = Charset.decode(u8, None, htmlPrescan = false).get
    assert(d5.text == text && d5.encoding == "utf-8" && d5.source == "fallback")
    // fallback: invalid UTF-8 decodes as windows-1252 (total)
    val d6 = Charset.decode(cp, None, htmlPrescan = false).get
    assert(d6.text == text && d6.encoding == "windows-1252" && d6.source == "fallback")
    // unknown declared label is ignored, sniffing continues (WHATWG)
    val d7 = Charset.decode(u8, Some("text/plain; charset=shift_jis"), htmlPrescan = false).get
    assert(d7.text == text && d7.source == "fallback")
  }

  test("declared unicode encodings that fail strict decode are counted undecodable") {
    val cp = Charset.encodeWindows1252("café — …").get // invalid as UTF-8
    assert(Charset.decode(cp, Some("text/plain; charset=utf-8"), htmlPrescan = false).isEmpty)
    // truncated UTF-16 (odd length) behind a BOM
    val odd = Array(0xFF.toByte, 0xFE.toByte, 0x41.toByte)
    assert(Charset.decode(odd, None, htmlPrescan = false).isEmpty)
    // unpaired surrogate behind a BE BOM
    val surr = Array(0xFE.toByte, 0xFF.toByte, 0xD8.toByte, 0x00.toByte)
    assert(Charset.decode(surr, None, htmlPrescan = false).isEmpty)
  }
}
