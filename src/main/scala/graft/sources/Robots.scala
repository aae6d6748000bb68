package graft.sources

/** robots.txt parsing + matching — the crawl-politeness gate every
  * web-scale corpus pipeline runs between link discovery (t35) and
  * fetch. Implements the public RFC 9309 (Robots Exclusion Protocol)
  * the way deployed crawlers do:
  *
  *   - line-oriented parse: `key: value`, keys case-insensitive,
  *     `#` comments stripped, CRLF/LF line endings, a leading UTF-8
  *     BOM stripped;
  *   - GROUPS: consecutive `user-agent` lines open a group; allow/
  *     disallow rules that follow belong to every agent named above
  *     them; non-group lines (`sitemap`, `crawl-delay`, unknown keys)
  *     never break a group (RFC 9309 §2.2.2);
  *   - group selection: the group whose user-agent token is the
  *     LONGEST case-insensitive prefix of the crawler's product
  *     token; the `*` group is the fallback; a crawler obeys ONLY its
  *     selected group (RFC 9309 §2.2.1);
  *   - rule matching: a rule matches when its path pattern matches a
  *     PREFIX of the request path, with `*` matching any octet run
  *     and a trailing `$` anchoring the end; the MOST SPECIFIC match
  *     wins, specificity = pattern length in octets (the deployed
  *     Googlebot rule, which RFC 9309 §2.2.2 codifies), ALLOW wins a
  *     specificity tie; no matching rule → allowed (`Disallow:` with
  *     an empty value is rule-less by the same clause);
  *   - an unparseable body fails OPEN per RFC 9309 §2.3.1.2 ("MAY
  *     access any resources" on a 4xx-class absence) — but this
  *     parser never fails: unrecognized lines are skipped, which is
  *     §2.2.3's requirement that parsers be tolerant.
  *
  * RobotsSpec pins the RFC's own §2.2.2 longest-match example table
  * and §5.1 example-file group semantics.
  *
  * Scale: a robots body is ≤ 500 KiB by RFC 9309 §2.5 convention;
  * parse is one linear pass, used map-side (broadcast per-host rule
  * frames or mapPartitions) — never a shuffle participant.
  */
object Robots {

  /** One rule: allow flag + raw path pattern (specificity = pattern
    * octet length). */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parsed file: groups of (lowercased agent tokens, rules) in file
    * order, plus sitemap URLs. */
  final case class RobotsFile(groups: Vector[(Vector[String], Vector[Rule])],
                              sitemaps: Vector[String])

  def parse(body: String): RobotsFile = {
    val text =
      if (body.nonEmpty && body.charAt(0) == 0xFEFF.toChar) body.substring(1)
      else body
    val groups = Vector.newBuilder[(Vector[String], Vector[Rule])]
    val sitemaps = Vector.newBuilder[String]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var open = false    // true while user-agent lines accumulate
    var started = false // a group exists to attach rules to
    def flush(): Unit = {
      if (started) groups += ((agents, rules))
      agents = Vector.empty; rules = Vector.empty; started = false
    }
    text.split("\r\n|\n|\r", -1).foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!open) flush()
            open = true; started = true
            agents :+= value.toLowerCase
          case "allow" | "disallow" =>
            open = false
            // an empty pattern is rule-less (matches nothing) per RFC
            if (started && value.nonEmpty)
              rules :+= Rule(key == "allow", value)
          case "sitemap" =>
            // non-group line: recorded, does NOT break the group
            if (value.nonEmpty) sitemaps += value
          case _ =>
            // crawl-delay and unknown keys: tolerated, group intact
            ()
        }
      }
    }
    flush()
    RobotsFile(groups.result(), sitemaps.result())
  }

  /** Does `pattern` (with `*` wildcards and optional trailing `$`)
    * match a prefix of `path`? Greedy segment scan, no regex. */
  private[graft] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      if (i == 0) {
        if (!path.startsWith(s)) return false
        pos = s.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment must sit at the very end
        return path.length >= pos + s.length && path.endsWith(s)
      } else {
        val at = path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** Select the rule set for a crawler product token: all groups
    * whose user-agent equals the token case-insensitively, MERGED in
    * file order (RFC 9309 §2.2.1 requires combining same-agent
    * groups); else the merged `*` groups; None if neither. (Prefix
    * matching of versioned tokens is a crawler-side convention — the
    * RFC matches the product token itself, which is what a pipeline
    * presents here.) */
  def selectGroup(f: RobotsFile, product: String): Option[Vector[Rule]] = {
    val p = product.toLowerCase
    val exact = f.groups.collect { case (as, rs) if as.contains(p) => rs }.flatten
    if (exact.nonEmpty || f.groups.exists(_._1.contains(p))) return Some(exact)
    val star = f.groups.collect { case (as, rs) if as.contains("*") => rs }.flatten
    if (f.groups.exists(_._1.contains("*"))) Some(star) else None
  }

  /** The access decision: (allowed, winning-pattern octet length —
    * 0 when no rule matched). */
  def decide(rules: Vector[Rule], path: String): (Boolean, Int) = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (patternMatches(r.pattern, path)) {
        val l = r.pattern.length
        if (l > bestLen || (l == bestLen && r.allow && !bestAllow)) {
          bestLen = l; bestAllow = r.allow
        }
      }
    }
    if (bestLen < 0) (true, 0) else (bestAllow, bestLen)
  }
}
