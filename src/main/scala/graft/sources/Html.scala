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
    * NOT counted), entities decoded. */
  final case class Extract(text: String, nTags: Long, nEntities: Long)

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

  private def extract0(s: String): Extract = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
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

    /** Skip a tag from its '<' (s(i) == '<'), honoring quoted
      * attribute values; returns the index past '>' and the
      * lower-cased tag name. */
    def skipTag(): String = {
      // tag name
      var p = i + 1
      if (p < n && s.charAt(p) == '/') p += 1
      val nameStart = p
      while (p < n && (s.charAt(p).isLetterOrDigit)) p += 1
      val name = s.substring(nameStart, p).toLowerCase
      var quote: Char = 0
      while (p < n) {
        val c = s.charAt(p)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') { i = p + 1; nTags += 1; return name }
        p += 1
      }
      bad() // unterminated tag
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

    /** HTML5 ampersand: decode a ';'-terminated valid entity, or emit
      * the '&' as literal text (the ambiguous-ampersand rule). */
    def decodeEntity(): Unit = { // s(i) == '&'
      def literal(): Unit = { out.append('&'); i += 1 }
      val semi = s.indexOf(';', i + 1)
      if (semi < 0 || semi > i + 12) return literal() // no entity form here
      val body = s.substring(i + 1, semi)
      val decoded: Int = named.get(body) match {
        case Some(cp) => cp
        case None =>
          if (body.length < 2 || body.charAt(0) != '#') return literal()
          val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
          val digits = if (hex) body.substring(2) else body.substring(1)
          if (digits.isEmpty) return literal()
          var v = 0
          var k = 0
          while (k < digits.length) {
            val c = digits.charAt(k)
            val d =
              if (c >= '0' && c <= '9') c - '0'
              else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
              else if (hex && c >= 'A' && c <= 'F') c - 'A' + 10
              else return literal() // non-digit: not a numeric entity
            if (v <= 0x10FFFF) v = v * (if (hex) 16 else 10) + d
            k += 1
          }
          // syntactically complete but semantically invalid numeric
          // reference: HTML5 says U+FFFD, counted as an entity
          if (v == 0 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) 0xFFFD
          else v
      }
      out.appendCodePoint(decoded)
      nEnt += 1
      i = semi + 1
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
    Extract(norm.toString, nTags, nEnt)
  }
}
