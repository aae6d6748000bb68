package graft.sources

/** WHATWG-style encoding resolution for legacy web content — the #1
  * silently-dropped-on-real-data class a strict-UTF-8-only intake
  * leaves: real crawls carry windows-1252 / ISO-8859-1 (and BOM'd
  * UTF-8/UTF-16) pages that are perfectly decodable. Feeds t33
  * (charset report) and the WARC response read path (t28/e17's decode
  * step resolves through here).
  *
  * Resolution order (the deterministic core of WHATWG encoding
  * sniffing):
  *  1. BOM — authoritative over any declaration (EF BB BF → UTF-8,
  *     FF FE → UTF-16LE, FE FF → UTF-16BE).
  *  2. The transport's `Content-Type` charset parameter.
  *  3. `<meta charset>` / http-equiv prescan of the first 1024 bytes
  *     (HTML payloads only).
  *  4. Fallback: strict UTF-8 if the bytes are valid UTF-8, else
  *     windows-1252 (total — every byte maps). Pure WHATWG falls back
  *     to a locale default directly; trying UTF-8 first is the
  *     curation-pipeline form (CCNet-class) and strictly reduces
  *     mojibake — deterministic either way, and ACCOUNTED: the result
  *     names the encoding used and the resolution source, so a
  *     transcoded page is counted as transcoded, never silently mixed
  *     with native UTF-8.
  *
  * Labels resolve per the WHATWG registry's relevant rows: the
  * iso-8859-1 / latin1 / us-ascii family maps to windows-1252 (the
  * registry's deliberate superset rule), bare `utf-16` means LE.
  * Unknown labels are IGNORED and sniffing continues (the WHATWG
  * rule). windows-1252 uses the WHATWG table: latin-1 except 0x80–0x9F
  * remapped, with the five unassigned slots (0x81 0x8D 0x8F 0x90 0x9D)
  * passing through as C1 controls — the JDK's cp1252 REPORTs them, so
  * the table is hand-held and the 27 assigned entries are
  * cross-validated against the JDK charset in CharsetSpec.
  *
  * `None` ONLY when a BOM or a declared unicode encoding fails its
  * strict decode (a genuinely undecodable page, counted); the
  * windows-1252 paths are total.
  */
object Charset {

  /** A decode with its provenance: `encoding` ∈ utf-8 / utf-16le /
    * utf-16be / windows-1252; `source` ∈ bom / header / meta /
    * fallback. */
  final case class Decoded(text: String, encoding: String, source: String)

  /** WHATWG windows-1252: the 0x80-0x9F code points (the five
    * unassigned slots 0x81 0x8D 0x8F 0x90 0x9D map to themselves as
    * C1 controls -- the JDK's cp1252 REPORTs those, hence the hand
    * table; the 27 assigned entries are cross-validated against the
    * JDK charset in CharsetSpec). */
  private val cp1252Hi: Array[Char] = Array(
    '\u20ac', '\u0081', '\u201a', '\u0192', '\u201e', '\u2026',
    '\u2020', '\u2021', '\u02c6', '\u2030', '\u0160', '\u2039',
    '\u0152', '\u008d', '\u017d', '\u008f', '\u0090', '\u2018',
    '\u2019', '\u201c', '\u201d', '\u2022', '\u2013', '\u2014',
    '\u02dc', '\u2122', '\u0161', '\u203a', '\u0153', '\u009d',
    '\u017e', '\u0178')

  /** Total: every byte maps (the WHATWG decoder never fails). */
  def decodeWindows1252(b: Array[Byte], off: Int, len: Int): String = {
    val sb = new java.lang.StringBuilder(len)
    var i = off
    while (i < off + len) {
      val v = b(i) & 0xff
      sb.append(
        if (v < 0x80 || v >= 0xA0) v.toChar else cp1252Hi(v - 0x80))
      i += 1
    }
    sb.toString
  }

  def decodeWindows1252(b: Array[Byte]): String =
    decodeWindows1252(b, 0, b.length)

  /** Fixture/test half: the inverse table; None on a char outside the
    * windows-1252 repertoire. */
  def encodeWindows1252(s: String): Option[Array[Byte]] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val v: Int =
        if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) c.toInt
        else {
          var k = 0
          var hit = -1
          while (k < 32 && hit < 0) {
            if (cp1252Hi(k) == c) hit = 0x80 + k
            k += 1
          }
          if (hit < 0) return None
          hit
        }
      out(i) = v.toByte
      i += 1
    }
    Some(out)
  }

  /** The canonical encoding for a charset label, or None for labels
    * outside the profile (→ sniffing continues). Labels are trimmed,
    * case-insensitive, optionally quoted. */
  def resolveLabel(label: String): Option[String] = {
    val l0 = label.trim.toLowerCase
    val l = if (l0.length >= 2 &&
      ((l0.head == '"' && l0.last == '"') ||
        (l0.head == '\'' && l0.last == '\'')))
      l0.substring(1, l0.length - 1).trim else l0
    l match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => Some("utf-8")
      case "windows-1252" | "cp1252" | "x-cp1252" | "iso-8859-1" |
           "iso8859-1" | "iso_8859-1" | "latin1" | "l1" | "ascii" |
           "us-ascii" | "ansi_x3.4-1968" => Some("windows-1252")
      case "utf-16" | "utf-16le" => Some("utf-16le") // WHATWG: bare = LE
      case "utf-16be" => Some("utf-16be")
      case _ => None
    }
  }

  /** The `charset` parameter of a Content-Type value (RFC 9110 §8.3
    * parameter syntax, first occurrence), unresolved. */
  def charsetParam(contentType: String): Option[String] = {
    val parts = contentType.split(';')
    var i = 1
    while (i < parts.length) {
      val p = parts(i)
      val eq = p.indexOf('=')
      if (eq > 0 && p.substring(0, eq).trim.equalsIgnoreCase("charset"))
        return Some(p.substring(eq + 1).trim)
      i += 1
    }
    None
  }

  /** WHATWG-shaped `<meta>` prescan of the first 1024 bytes: the first
    * `charset` attribute, or a `charset=` inside an http-equiv
    * `content` value, inside any `<meta ...>` tag. The scan is a
    * deterministic documented subset of the full prescan: bytes are
    * read as latin-1 (labels are ASCII), tags inside comments are NOT
    * excluded (real prescans don't parse comments either), and the
    * value ends at quote/whitespace/';'/'>' as appropriate. */
  def metaPrescan(b: Array[Byte]): Option[String] = {
    val n = math.min(b.length, 1024)
    val s = new String(b, 0, n, "ISO-8859-1").toLowerCase
    var from = 0
    while (true) {
      val m = s.indexOf("<meta", from)
      if (m < 0) return None
      // the tag name must be exactly `meta` followed by a delimiter
      val after = if (m + 5 < s.length) s.charAt(m + 5) else ' '
      if (after == ' ' || after == '\t' || after == '\n' || after == '\f' ||
          after == '\r' || after == '/') {
      val end0 = s.indexOf('>', m)
      val end = if (end0 < 0) s.length else end0
      val tag = s.substring(m, end)
      val c = tag.indexOf("charset")
      if (c >= 0) {
        var p = c + 7
        while (p < tag.length && tag.charAt(p) <= ' ') p += 1
        if (p < tag.length && tag.charAt(p) == '=') {
          p += 1
          while (p < tag.length && tag.charAt(p) <= ' ') p += 1
          if (p < tag.length) {
            val q = tag.charAt(p)
            val vEnd =
              if (q == '"' || q == '\'') {
                p += 1
                val e = tag.indexOf(q, p)
                if (e < 0) tag.length else e
              } else {
                var e = p
                while (e < tag.length && tag.charAt(e) > ' ' &&
                  tag.charAt(e) != ';' && tag.charAt(e) != '"' &&
                  tag.charAt(e) != '\'') e += 1
                e
              }
            val v = tag.substring(p, vEnd).trim
            if (v.nonEmpty) return Some(v)
          }
        }
      }
      }
      from = m + 5
    }
    None // unreachable
  }

  private def strict(name: java.nio.charset.Charset, b: Array[Byte],
                     off: Int): Option[String] = {
    val dec = name.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(b, off, b.length - off)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  private def decodeAs(enc: String, b: Array[Byte], off: Int,
                       source: String): Option[Decoded] = enc match {
    case "utf-8" =>
      Utf8.decodeStrict(b, off, b.length - off).map(Decoded(_, "utf-8", source))
    case "windows-1252" =>
      Some(Decoded(decodeWindows1252(b, off, b.length - off),
        "windows-1252", source))
    case "utf-16le" =>
      strict(java.nio.charset.StandardCharsets.UTF_16LE, b, off)
        .map(Decoded(_, "utf-16le", source))
    case "utf-16be" =>
      strict(java.nio.charset.StandardCharsets.UTF_16BE, b, off)
        .map(Decoded(_, "utf-16be", source))
    case _ => None
  }

  /** Full resolution (see object doc). `contentType` is the transport
    * header value if any; `htmlPrescan` enables step 3. None = the
    * page is genuinely undecodable under its authoritative encoding. */
  def decode(b: Array[Byte], contentType: Option[String],
             htmlPrescan: Boolean): Option[Decoded] = {
    // 1. BOM
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
        b(2) == 0xBF.toByte)
      return decodeAs("utf-8", b, 3, "bom")
    if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      return decodeAs("utf-16le", b, 2, "bom")
    if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      return decodeAs("utf-16be", b, 2, "bom")
    // 2. transport declaration
    contentType.flatMap(charsetParam).flatMap(resolveLabel) match {
      case Some(enc) => return decodeAs(enc, b, 0, "header")
      case None => ()
    }
    // 3. meta prescan
    if (htmlPrescan) metaPrescan(b).flatMap(resolveLabel) match {
      case Some(enc) => return decodeAs(enc, b, 0, "meta")
      case None => ()
    }
    // 4. fallback: valid UTF-8 wins, else the total windows-1252
    Utf8.decodeStrict(b) match {
      case Some(t) => Some(Decoded(t, "utf-8", "fallback"))
      case None =>
        Some(Decoded(decodeWindows1252(b), "windows-1252", "fallback"))
    }
  }
}
