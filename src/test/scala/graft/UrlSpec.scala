package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Url

/** RFC 3986 §5 resolution + normalization subset (graft.sources.Url):
  * reference forms, dot-segment removal (the RFC's own §5.4 examples),
  * normalization rules, and the non-http(s) exclusion. */
class UrlSpec extends AnyFunSuite {

  private val base = "http://a.example/b/c/d;p?q"

  test("RFC 3986 §5.4.1 normal examples resolve exactly") {
    val cases = Seq(
      "g" -> "http://a.example/b/c/g",
      "./g" -> "http://a.example/b/c/g",
      "g/" -> "http://a.example/b/c/g/",
      "/g" -> "http://a.example/g",
      "//g.example/x" -> "http://g.example/x",
      "?y" -> "http://a.example/b/c/d;p?y",
      "g?y" -> "http://a.example/b/c/g?y",
      "." -> "http://a.example/b/c/",
      "./" -> "http://a.example/b/c/",
      ".." -> "http://a.example/b/",
      "../" -> "http://a.example/b/",
      "../g" -> "http://a.example/b/g",
      "../.." -> "http://a.example/",
      "../../" -> "http://a.example/",
      "../../g" -> "http://a.example/g")
    for ((ref, want) <- cases)
      assert(Url.resolve(base, ref).contains(want), s"ref '$ref'")
  }

  test("§5.4.2 abnormal: extra .. segments clamp at root; dot mixes resolve") {
    val cases = Seq(
      "../../../g" -> "http://a.example/g",
      "../../../../g" -> "http://a.example/g",
      "/./g" -> "http://a.example/g",
      "/../g" -> "http://a.example/g",
      "./../g" -> "http://a.example/b/g",
      "./g/." -> "http://a.example/b/c/g/",
      "g/./h" -> "http://a.example/b/c/g/h",
      "g/../h" -> "http://a.example/b/c/h",
      "g;x=1/./y" -> "http://a.example/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a.example/b/c/y")
    for ((ref, want) <- cases)
      assert(Url.resolve(base, ref).contains(want), s"ref '$ref'")
  }

  test("normalization: case, default ports, fragments, empty path") {
    assert(Url.resolve(base, "HTTP://WWW.Example.COM:80/A/B#frag")
      .contains("http://www.example.com/A/B")) // path case is preserved
    assert(Url.resolve(base, "https://x.example:443/y")
      .contains("https://x.example/y"))
    assert(Url.resolve(base, "https://x.example:8443/y")
      .contains("https://x.example:8443/y")) // non-default port kept
    assert(Url.resolve(base, "http://x.example:443/y")
      .contains("http://x.example:443/y")) // 443 is NOT http's default
    assert(Url.resolve(base, "http://x.example")
      .contains("http://x.example/")) // empty path -> "/"
    assert(Url.resolve(base, "http://x.example?q=1#f")
      .contains("http://x.example/?q=1"))
    // query kept verbatim, including case and order
    assert(Url.resolve(base, "/p?B=2&a=1").contains("http://a.example/p?B=2&a=1"))
  }

  test("non-crawlable schemes and malformed authorities are None") {
    for (h <- Seq("mailto:x@example.com", "javascript:void(0)",
                  "data:text/plain,hi", "ftp://f.example/x", "tel:+1555",
                  "http://", "http://:80/x"))
      assert(Url.resolve(base, h).isEmpty, h)
    assert(Url.resolve(base, "http://h.example:9x/y").isEmpty) // bad port
    assert(Url.resolve("not a url", "/x").isEmpty) // unparseable base
    assert(Url.resolve(base, "").isEmpty)
  }

  test("hostOf extracts the host of a normalized url") {
    assert(Url.hostOf("http://a.example/x/y?q") == "a.example")
    assert(Url.hostOf("https://b.example:8443/x") == "b.example")
    assert(Url.hostOf("http://c.example") == "c.example")
  }
}
