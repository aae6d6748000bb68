package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Html

/** Strict HTML → text extractor: deterministic extraction or None —
  * never throw, never half-extract (the t29 oracle identity depends
  * on it). No Spark involved. */
class HtmlSpec extends AnyFunSuite {

  test("tags strip, raw-text elements drop content, entities decode, whitespace normalizes") {
    val e = Html.extract(
      "<!DOCTYPE html>\n<html><head><title>T &amp; U</title>" +
        "<script>var x = \"<p>junk</p> & raw\";</script>" +
        "<style>.c { color: #fff }</style>" +
        "<!-- note <b>bold</b> &lt; -->" +
        "</head><body class=\"b\" data-x=\"a>b\">\n" +
        "<p id=\"p0\">alpha &amp; beta</p>\n" +
        "<p>&#65;bc &#x43;d</p>\n</body></html>")
      .getOrElse(fail("extract None"))
    assert(e.text == "alpha & beta Abc Cd", s"got '${e.text}'")
    // html head title /title script /script style /style /head body
    // p /p p /p /body /html = 16; DOCTYPE and comment not counted
    assert(e.nTags == 16, s"nTags ${e.nTags}")
    assert(e.nEntities == 3) // &amp; &#65; &#x43; in BODY text only
  }

  test("quoted attribute values may contain '>' and quotes of the other kind") {
    val e = Html.extract("""<p data-a="x>y" data-b='p>"q'>text</p>""")
      .getOrElse(fail("None"))
    assert(e.text == "text" && e.nTags == 2)
  }

  test("script/style/title close tags match case-insensitively") {
    val e = Html.extract("<SCRIPT>var a = 1 < 2;</Script><p>ok</p>")
      .getOrElse(fail("None"))
    assert(e.text == "ok" && e.nTags == 4)
  }

  test("whitespace collapse matches the RE2 class: U+000B survives") {
    val e = Html.extract("<p>a  \t\n bc </p>").getOrElse(fail("None"))
    assert(e.text == "a bc")
  }

  test("non-BMP entities and text pass through as code points") {
    val e = Html.extract("<p>&#x1F600; 😀 &#128512;</p>").getOrElse(fail("None"))
    assert(e.text == "😀 😀 😀" && e.nEntities == 2)
  }

  test("every malformation class returns None, never throws") {
    val bad = Seq(
      "<p>unterminated tag <div class=",
      "<p attr=\"unclosed quote>text</p>",
      "<!-- unterminated comment <p>x</p>",
      "<script>var a = 1;", // unterminated raw-text element
      "<style>.c{}", // unterminated style
      "<title>no close", // unterminated title
      "bare & ampersand", // & must start a valid entity
      "&unknown;", "&;", "&#;", "&#x;", "&#12z;", "&#xZZ;",
      "&#1114112;", // > U+10FFFF
      "&#55296;", // surrogate range (U+D800)
      "&toolongentitybody;", // no ';' within the cap
      "<p>&amp</p>") // entity without ';' before tag (indexOf ; fails in cap)
    bad.foreach { h =>
      assert(Html.extract(h).isEmpty, s"must reject: $h")
    }
    // the t29 corruption idioms
    assert(Html.extract("<p>x</p><div class=").isEmpty)
    assert(Html.extract("<style>.c{} no close\n<p>x</p>").isEmpty)
  }

  test("entities inside dropped content are not decoded or counted") {
    val e = Html.extract("<title>&amp;&bogus;</title><p>&lt;</p>")
      .getOrElse(fail("None"))
    assert(e.text == "<" && e.nEntities == 1)
  }
}
