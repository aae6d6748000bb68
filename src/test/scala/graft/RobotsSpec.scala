package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Robots
import graft.sources.Robots.{Rule, patternMatches => pm}

/** RFC 9309 robots.txt: the spec's own matching tables (the
  * wildcard/anchor examples RFC 9309 §2.2.2 and the deployed
  * Googlebot documentation both publish), group-merge semantics,
  * precedence, and parser tolerance. No Spark. */
class RobotsSpec extends AnyFunSuite {

  test("pattern matching: the published wildcard/anchor table") {
    assert(pm("/", "/anything"))
    assert(pm("/*", "/anything"))
    assert(pm("/fish", "/fish"))
    assert(pm("/fish", "/fishheads"))
    assert(pm("/fish", "/fish/salmon.html"))
    assert(!pm("/fish", "/Fish.asp")) // case-sensitive paths
    assert(!pm("/fish", "/catfish"))
    assert(pm("/fish*", "/fish.php"))
    assert(pm("/fish/", "/fish/"))
    assert(pm("/fish/", "/fish/salmon"))
    assert(!pm("/fish/", "/fish"))
    assert(pm("/*.php", "/index.php"))
    assert(pm("/*.php", "/folder/filename.php"))
    assert(pm("/*.php", "/folder/filename.php?parameters"))
    assert(!pm("/*.php", "/"))
    assert(!pm("/*.php", "/windows.PHP"))
    assert(pm("/*.php$", "/filename.php"))
    assert(pm("/*.php$", "/folder/filename.php"))
    assert(!pm("/*.php$", "/filename.php?parameters"))
    assert(!pm("/*.php$", "/filename.php/"))
    assert(pm("/fish*.php", "/fish.php"))
    assert(pm("/fish*.php", "/fishheads/catfish.php?parameters"))
    assert(!pm("/fish*.php", "/Fish.PHP"))
    // multiple wildcards and an anchored multi-segment pattern
    assert(pm("/a*/b*/c$", "/aX/bYY/c"))
    assert(!pm("/a*/b*/c$", "/aX/bYY/cd"))
  }

  test("precedence: most specific wins, allow wins ties") {
    // the published precedence examples
    assert(Robots.decide(Vector(Rule(true, "/p"), Rule(false, "/")), "/page")
      == (true, 2))
    assert(Robots.decide(Vector(Rule(true, "/folder"), Rule(false, "/folder")),
      "/folder/page") == (true, 7))
    assert(Robots.decide(Vector(Rule(true, "/page"), Rule(false, "/*.htm")),
      "/page.htm") == (false, 6))
    assert(Robots.decide(Vector(Rule(true, "/$"), Rule(false, "/")), "/")
      == (true, 2))
    assert(Robots.decide(Vector(Rule(true, "/$"), Rule(false, "/")), "/page.htm")
      == (false, 1))
    // no matching rule → allowed with specificity 0
    assert(Robots.decide(Vector(Rule(false, "/private/")), "/public/x")
      == (true, 0))
  }

  test("groups: merge same-agent groups, * fallback, non-group lines don't split") {
    val f = Robots.parse(
      """# fixture
        |User-agent: alpha
        |Disallow: /a/
        |Sitemap: http://x.example/s1.xml
        |Crawl-delay: 5
        |Allow: /a/ok
        |
        |User-agent: beta
        |User-agent: gamma
        |Disallow: /bg/
        |
        |User-agent: alpha
        |Disallow: /a2/
        |
        |User-agent: *
        |Disallow: /all/
        |""".stripMargin)
    assert(f.sitemaps == Vector("http://x.example/s1.xml"))
    // sitemap + crawl-delay did NOT split alpha's first group
    assert(Robots.selectGroup(f, "Alpha").get ==
      Vector(Rule(false, "/a/"), Rule(true, "/a/ok"), Rule(false, "/a2/")))
    // beta and gamma share one group
    assert(Robots.selectGroup(f, "beta").get == Vector(Rule(false, "/bg/")))
    assert(Robots.selectGroup(f, "gamma").get == Vector(Rule(false, "/bg/")))
    // unknown agent falls back to *
    assert(Robots.selectGroup(f, "delta").get == Vector(Rule(false, "/all/")))
    // no groups at all → None (fail open at the caller)
    assert(Robots.selectGroup(Robots.parse("Sitemap: http://x/s.xml"), "a").isEmpty)
  }

  test("parser tolerance: BOM, CRLF, comments, key case, empty Disallow") {
    val f = Robots.parse(
      "﻿# c\r\nUSER-AGENT: Bot\r\nDISALLOW: /x/ # trailing\r\nDisallow:\r\nALLOW: /x/y\r\n")
    val rs = Robots.selectGroup(f, "bot").get
    // the empty Disallow is rule-less; the comment is stripped
    assert(rs == Vector(Rule(false, "/x/"), Rule(true, "/x/y")))
    // a group whose agent token matched case-insensitively
    assert(Robots.selectGroup(f, "BOT").isDefined)
    // garbage lines don't derail the parse
    val g = Robots.parse("ha!\nUser-agent: z\nnot a line\nDisallow: /q\n:empty\n")
    assert(Robots.selectGroup(g, "z").get == Vector(Rule(false, "/q")))
  }
}
