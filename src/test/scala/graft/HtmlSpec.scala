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
      "<title>no close") // unterminated title
    bad.foreach { h =>
      assert(Html.extract(h).isEmpty, s"must reject: $h")
    }
    // the t29 corruption idioms
    assert(Html.extract("<p>x</p><div class=").isEmpty)
    assert(Html.extract("<style>.c{} no close\n<p>x</p>").isEmpty)
  }

  test("HTML5 ambiguous ampersand: '&' not forming an entity is literal text, not counted") {
    val cases = Seq(
      ("bare & ampersand", "bare & ampersand"),
      ("Q&A and R&D", "Q&A and R&D"),
      ("a=1&b=2&c=3", "a=1&b=2&c=3"),
      ("&unknown;", "&unknown;"),
      ("&;", "&;"),
      ("&#;", "&#;"),
      ("&#x;", "&#x;"),
      ("&#12z;", "&#12z;"),
      ("&#xZZ;", "&#xZZ;"),
      ("&toolongentitybody;", "&toolongentitybody;"), // no ';' within cap
      ("<p>&amp</p>", "&amp"), // semicolon-less named ref stays literal
      ("tail&", "tail&"))
    for ((in, want) <- cases) {
      val e = Html.extract(in).getOrElse(fail(s"None for: $in"))
      assert(e.text == want, s"got '${e.text}' for '$in'")
      assert(e.nEntities == 0, s"counted an entity in '$in'")
    }
    // literal '&' and decoded entities mix in one text run
    val e = Html.extract("<p>Q&A &amp; B&W</p>").getOrElse(fail("mix None"))
    assert(e.text == "Q&A & B&W" && e.nEntities == 1)
  }

  test("the common named-entity set decodes to the exact code points; others stay literal") {
    val expected = Seq(
      "nbsp" -> 0xA0, "copy" -> 0xA9, "reg" -> 0xAE, "trade" -> 0x2122,
      "mdash" -> 0x2014, "ndash" -> 0x2013, "hellip" -> 0x2026,
      "lsquo" -> 0x2018, "rsquo" -> 0x2019, "ldquo" -> 0x201C,
      "rdquo" -> 0x201D, "sect" -> 0xA7, "middot" -> 0xB7, "deg" -> 0xB0,
      "plusmn" -> 0xB1, "times" -> 0xD7, "divide" -> 0xF7,
      "euro" -> 0x20AC, "pound" -> 0xA3, "yen" -> 0xA5, "cent" -> 0xA2,
      "laquo" -> 0xAB, "raquo" -> 0xBB)
    for ((name, cp) <- expected) {
      val e = Html.extract(s"<p>x&$name;y</p>").getOrElse(fail(s"None for &$name;"))
      assert(e.text == "x" + new String(Character.toChars(cp)) + "y",
        s"&$name; decoded wrong")
      assert(e.nEntities == 1)
    }
    // NBSP is NOT in the whitespace-collapse class: it survives as text
    assert(Html.extract("<p>a&nbsp; &nbsp;b</p>").exists(_.text == "a   b"))
    // an uncommon named ref stays literal under the lenient contract
    assert(Html.extract("&aleph;").exists(e => e.text == "&aleph;" && e.nEntities == 0))
  }

  test("semantically invalid numeric references decode to U+FFFD and count (HTML5 rule)") {
    for (in <- Seq("&#1114112;", "&#x110000;", "&#55296;", "&#xD800;",
                   "&#xDFFF;", "&#0;", "&#x99999999;")) {
      val e = Html.extract(in).getOrElse(fail(s"None for: $in"))
      assert(e.text == "�", s"got '${e.text}' for '$in'")
      assert(e.nEntities == 1, s"not counted: $in")
    }
    // boundary values still decode normally
    assert(Html.extract("&#x10FFFF;").exists(_.text ==
      new String(Character.toChars(0x10FFFF))))
  }

  test("numeric references with leading zeros decode (HTML5: digits, no length cap below 64)") {
    assert(Html.extract("&#0000000000065;").exists(e =>
      e.text == "A" && e.nEntities == 1))
    assert(Html.extract("&#x0000000000041;").exists(e =>
      e.text == "A" && e.nEntities == 1))
    // zero-run then an overflowing value still saturates to U+FFFD
    assert(Html.extract("&#0001114112;").exists(e =>
      e.text == "�" && e.nEntities == 1))
    // the documented 64-char window: a longer body is literal text
    val long = "&#" + "0" * 70 + "65;"
    assert(Html.extract(long).exists(e => e.text == long && e.nEntities == 0))
    // named forms keep the 12-char window (longest decoded name is 6)
    assert(Html.extract("&notanentityname;").exists(_.nEntities == 0))
  }

  test("raw-text end tag needs a delimiter: </scripts> does not close <script>") {
    val e = Html.extract(
      "<script>var a = \"</scripts> not a close\";</script><p>ok</p>")
      .getOrElse(fail("None"))
    assert(e.text == "ok", s"got '${e.text}'")
    assert(e.nTags == 4)
    // whitespace and '/' delimit too (HTML5: </script >, </script/>)
    assert(Html.extract("<script>x</script ><p>a</p>").exists(_.text == "a"))
    assert(Html.extract("<script>x</script/><p>a</p>").exists(_.text == "a"))
    assert(Html.extract("<style>.c{content:'</styles>'}</style><p>s</p>")
      .exists(_.text == "s"))
    // a non-delimited lookalike with no real close is unterminated
    assert(Html.extract("<script>var a = '</scripts>';").isEmpty)
  }

  test("out-links: href capture across quote styles, entity-decoded, decoys excluded") {
    val e = Html.extract(
      "<a href=\"https://a.example/x?p=1&amp;q=2\">one</a>" +
        "<a rel='nofollow' href='https://b.example/y'>two</a>" +
        "<a href=https://c.example/z#frag>three</a>" +
        "<a data-href=\"https://no.example/decoy\">decoy</a>" +
        "<a name=\"anchor\">no href</a>" +
        "<a href=\"first\" href=\"second\">first wins</a>" +
        "<p href=\"https://no.example/not-an-a\">p</p>")
      .getOrElse(fail("None"))
    assert(e.links == Vector("https://a.example/x?p=1&q=2",
      "https://b.example/y", "https://c.example/z#frag", "first"))
    // links inside dropped content or comments do not exist
    val d = Html.extract(
      "<script>var a = '<a href=\"https://no.example/s\">x</a>';</script>" +
        "<!-- <a href=\"https://no.example/c\">c</a> -->" +
        "<a href=\"https://yes.example/\">ok</a>").getOrElse(fail("None"))
    assert(d.links == Vector("https://yes.example/"))
    // an END tag with an href is not a link; bare ampersands in hrefs
    // stay literal (the attribute-value ambiguous-ampersand rule)
    val f = Html.extract("<a href=\"u?a=1&b=2\">x</a href=\"no\">")
      .getOrElse(fail("None"))
    assert(f.links == Vector("u?a=1&b=2"))
    // unterminated quoted value is a malformation
    assert(Html.extract("<a href=\"unclosed>x</a>").isEmpty)
  }

  test("entities inside dropped content are not decoded or counted") {
    val e = Html.extract("<title>&amp;&bogus;</title><p>&lt;</p>")
      .getOrElse(fail("None"))
    assert(e.text == "<" && e.nEntities == 1)
  }
}
