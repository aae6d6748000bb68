package graft.sources

/** Minimal strict HTML → text extractor for the web-corpus read path
  * (t29): between WARC payloads (t28) and the text gates (t01–t24)
  * sits the extraction step every web pipeline runs — tag stripping,
  * script/style/title content removal, comment removal, entity
  * decoding, whitespace normalization. This is the replayable form:
  * a strict single-pass scanner that either extracts deterministically
  * or returns None (the Jsonl/Warc discipline), so a malformed
  * document is COUNTED at the document level, never thrown and never
  * silently half-extracted.
  *
  * Semantics (all certified by the t29 oracle):
  * - `<tag ...>` and `</tag>` are stripped; quoted attribute values
  *   may contain `>` (`data-x="a>b"`) — the scanner honors quotes.
  * - `<script>`, `<style>`, `<title>` drop their CONTENT up to the
  *   matching case-insensitive close tag, which per HTML5 must be
  *   followed by `>`, `/` or whitespace — `</scripts>` inside a
  *   script body does NOT end the element (script bodies contain `<`
  *   and quotes by construction — no tag parsing inside).
  * - `<!-- ... -->` comments and `<!DOCTYPE ...>` declarations drop.
  * - Entities decode: the named set real pages use (the XML five
  *   plus nbsp/copy/mdash/hellip/euro and the rest of the
  *   high-frequency HTML set — see `named`) and numeric decimal
  *   `&#NN;` / hex `&#xHH;` forms, all ';'-terminated. A numeric
  *   value that is 0, a surrogate, or past U+10FFFF decodes to
  *   U+FFFD (HTML5's numeric-reference rule) and still counts as an
  *   entity. A `&` that does not start a ';'-terminated valid form
  *   is LITERAL TEXT (HTML5's ambiguous-ampersand rule — unescaped
  *   '&' in href query strings and prose is ubiquitous in real
  *   corpora), not counted, not a malformation. Deliberate
  *   simplifications, pinned by spec: legacy semicolon-less named
  *   refs (`&amp` bare) stay literal, and C1-range numeric values
  *   pass through as code points (no windows-1252 remapping).
  * - Text whitespace runs ([ \t\n\f\r]) collapse to one space and the
  *   result is trimmed — the canonical form the downstream gates see.
  *
  * None on: unterminated tag / comment / script / style / title.
  * Never throws.
  */
object Html {

  /** Extraction result: normalized text, tags stripped (open+close,
    * raw-text elements' own tags included; comments and declarations
    * NOT counted), entities decoded, and the document's out-links —
    * `href` values of `<a>` START tags in document order (first href
    * per tag; entity-decoded like any attribute value; links inside
    * dropped script/style/title content or comments do not exist). */
  final case class Extract(text: String, nTags: Long, nEntities: Long,
                           links: Vector[String])

  private object Bad extends scala.util.control.ControlThrowable

  /** The ';'-terminated named entities the extractor decodes: the XML
    * five plus the high-frequency HTML set real pages actually use
    * (&nbsp; above all). Anything else stays literal text under the
    * ambiguous-ampersand rule — deterministic and replayable. */
  private val named: Map[String, Int] = Map(
    "amp" -> '&'.toInt, "lt" -> '<'.toInt, "gt" -> '>'.toInt,
    "quot" -> '"'.toInt, "apos" -> '\''.toInt,
    "nbsp" -> 0xA0, "copy" -> 0xA9, "reg" -> 0xAE, "trade" -> 0x2122,
    "mdash" -> 0x2014, "ndash" -> 0x2013, "hellip" -> 0x2026,
    "lsquo" -> 0x2018, "rsquo" -> 0x2019, "ldquo" -> 0x201C,
    "rdquo" -> 0x201D, "sect" -> 0xA7, "middot" -> 0xB7, "deg" -> 0xB0,
    "plusmn" -> 0xB1, "times" -> 0xD7, "divide" -> 0xF7, "euro" -> 0x20AC,
    "pound" -> 0xA3, "yen" -> 0xA5, "cent" -> 0xA2, "laquo" -> 0xAB,
    "raquo" -> 0xBB)

  def extract(html: String): Option[Extract] =
    try Some(extract0(html)) catch { case Bad => None }

  /** The entity candidate at s(i) == '&': returns (cp << 32) | next,
    * with cp = -1 when the ampersand is literal text (HTML5's
    * ambiguous-ampersand rule) and cp = 0xFFFD for syntactically
    * complete but semantically invalid numeric references. The ';'
    * window is 12 chars for named forms (the longest decoded name is
    * 6) and 64 for numeric forms — numeric references may carry
    * arbitrarily many leading zeros per HTML5 (`&#0000000000065;`
    * decodes; the digit parse saturates above U+10FFFF so zero-runs
    * cost nothing), and a reference body past 64 chars is literal
    * text by documented simplification. */
  private def entityAt(s: String, i: Int): Long = {
    def lit: Long = (-1L << 32) | (i + 1).toLong
    val isNum = i + 1 < s.length && s.charAt(i + 1) == '#'
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi > i + (if (isNum) 64 else 12)) return lit
    val body = s.substring(i + 1, semi)
    val cp: Int = named.get(body) match {
      case Some(c) => c
      case None =>
        if (body.length < 2 || body.charAt(0) != '#') return lit
        val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
        val digits = if (hex) body.substring(2) else body.substring(1)
        if (digits.isEmpty) return lit
        var v = 0
        var k = 0
        while (k < digits.length) {
          val c = digits.charAt(k)
          val d =
            if (c >= '0' && c <= '9') c - '0'
            else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
            else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
            else return lit // non-digit: not a numeric entity
          if (v <= 0x10FFFF) v = v * (if (hex) 16 else 10) + d
          k += 1
        }
        if (v == 0 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) 0xFFFD
        else v
    }
    (cp.toLong << 32) | (semi + 1).toLong
  }

  /** Entity-decode a whole string (attribute values — `&amp;` in href
    * query strings is ubiquitous): decoded references substituted,
    * ambiguous ampersands literal; nothing counted. */
  private def decodeRefs(v: String): String = {
    if (v.indexOf('&') < 0) return v
    val out = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '&') {
        val r = entityAt(v, i)
        val cp = (r >> 32).toInt
        if (cp < 0) { out.append('&'); i += 1 }
        else { out.appendCodePoint(cp); i = (r & 0xffffffffL).toInt }
      } else { out.append(v.charAt(i)); i += 1 }
    }
    out.toString
  }

  private def extract0(s: String): Extract = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    val links = Vector.newBuilder[String]
    var nTags = 0L
    var nEnt = 0L
    var i = 0
    def bad(): Nothing = throw Bad

    /** Case-insensitive match of `lit` at position p. */
    def matches(p: Int, lit: String): Boolean = {
      if (p + lit.length > n) return false
      var k = 0
      while (k < lit.length) {
        if (Character.toLowerCase(s.charAt(p + k)) != lit.charAt(k)) return false
        k += 1
      }
      true
    }

    /** Walk a tag from its '<' (s(i) == '<') through its ATTRIBUTE
      * LIST (names, '=', quoted values — which may contain '>' — or
      * unquoted values), advancing past '>'; returns the lower-cased
      * tag name. Captures the first `href` value of an `<a>` START
      * tag into `links`, entity-decoded. Unterminated tag or quoted
      * value → malformation. */
    def skipTag(): String = {
      var p = i + 1
      val isEnd = p < n && s.charAt(p) == '/'
      if (isEnd) p += 1
      val nameStart = p
      while (p < n && (s.charAt(p).isLetterOrDigit)) p += 1
      val name = s.substring(nameStart, p).toLowerCase
      @inline def ws(c: Char): Boolean =
        c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
      var href: String = null
      var done = false
      while (!done) {
        while (p < n && ws(s.charAt(p))) p += 1
        if (p >= n) bad() // unterminated tag
        val c = s.charAt(p)
        if (c == '>') { done = true; p += 1 }
        else if (c == '/') p += 1
        else {
          val aStart = p
          while (p < n && {
            val ch = s.charAt(p)
            ch != '=' && ch != '>' && ch != '/' && !ws(ch)
          }) p += 1
          if (p >= n) bad()
          val aName = s.substring(aStart, p).toLowerCase
          while (p < n && ws(s.charAt(p))) p += 1
          var value: String = null
          if (p < n && s.charAt(p) == '=') {
            p += 1
            while (p < n && ws(s.charAt(p))) p += 1
            if (p >= n) bad()
            val q = s.charAt(p)
            if (q == '"' || q == '\'') {
              p += 1
              val vStart = p
              while (p < n && s.charAt(p) != q) p += 1
              if (p >= n) bad() // unterminated quoted value
              value = s.substring(vStart, p)
              p += 1
            } else {
              val vStart = p
              while (p < n && { val ch = s.charAt(p); !ws(ch) && ch != '>' })
                p += 1
              value = s.substring(vStart, p)
            }
          }
          if (!isEnd && name == "a" && aName == "href" &&
              href == null && value != null)
            href = value
        }
      }
      i = p
      nTags += 1
      if (href != null) links += decodeRefs(href)
      name
    }

    /** Drop content up to (and past) `</name>`, case-insensitive; per
      * HTML5 the end-tag name must be followed by '>', '/' or
      * whitespace — `</scripts>` inside a script body is raw text. */
    def dropRawText(name: String): Unit = {
      val close = "</" + name
      while (i < n) {
        if (s.charAt(i) == '<' && matches(i, close)) {
          val p = i + close.length
          val delim = p < n && {
            val c = s.charAt(p)
            c == '>' || c == '/' || c == ' ' || c == '\t' || c == '\n' ||
              c == '\f' || c == '\r'
          }
          if (delim) {
            // the close tag itself parses as a normal tag (counted)
            skipTag()
            return
          }
        }
        i += 1
      }
      bad() // unterminated raw-text element
    }

    /** HTML5 ampersand: decode a ';'-terminated valid entity (counted),
      * or emit the '&' as literal text (the ambiguous-ampersand rule;
      * not counted). The parse itself is the shared [[entityAt]]. */
    def decodeEntity(): Unit = { // s(i) == '&'
      val r = entityAt(s, i)
      val cp = (r >> 32).toInt
      if (cp < 0) { out.append('&'); i += 1 }
      else {
        out.appendCodePoint(cp)
        nEnt += 1
        i = (r & 0xffffffffL).toInt
      }
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (matches(i, "<!--")) {
          val end = s.indexOf("-->", i + 4)
          if (end < 0) bad() // unterminated comment
          i = end + 3
        } else if (i + 1 < n && s.charAt(i + 1) == '!') {
          // declaration (<!DOCTYPE ...>) — dropped, not counted
          val end = s.indexOf('>', i + 2)
          if (end < 0) bad()
          i = end + 1
        } else {
          val name = skipTag()
          if (name == "script" || name == "style" || name == "title")
            dropRawText(name)
        }
      } else if (c == '&') decodeEntity()
      else { out.append(c); i += 1 }
    }

    // collapse [ \t\n\f\r]+ to one space, trim — one pass
    val raw = out
    val norm = new java.lang.StringBuilder(raw.length)
    var j = 0
    var pendingSpace = false
    while (j < raw.length) {
      val c = raw.charAt(j)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r') {
        if (norm.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { norm.append(' '); pendingSpace = false }
        norm.append(c)
      }
      j += 1
    }
    Extract(norm.toString, nTags, nEnt, links.result())
  }
}
