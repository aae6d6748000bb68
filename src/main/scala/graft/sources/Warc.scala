package graft.sources

/** Minimal strict WARC (ISO 28500) record codec for the web-corpus
  * read path (t28 batch / e17 streaming): Common Crawl — the corpus
  * 100-TB text pipelines actually ingest — ships as `.warc.gz` shards
  * where EACH record is its own gzip member of a concatenated series
  * (exactly the framing [[graft.operators.Inflate.gunzipMemberList]]
  * walks), so the layer above the member walk is a per-record WARC
  * parse with malformed records COUNTED, never thrown and never
  * silently dropped (the Jsonl discipline one container out).
  *
  * Record shape (ISO 28500 §4): a version line `WARC/1.0` (or 1.1),
  * CRLF-terminated named header lines until an empty line, then
  * exactly `Content-Length` block octets, then CRLF CRLF. Header
  * names are case-insensitive; WARC-Type, WARC-Record-ID, WARC-Date
  * and Content-Length are mandatory. For `response` records the block
  * is an HTTP/1.x response message; [[httpBody]] extracts its body.
  *
  * [[render]] is the encoder half (the fixture generator writes
  * through it); [[parseMember]] is the decoder — `None` on ANY
  * malformation (bad version line, bare-LF line ends, header without
  * a colon, duplicate or missing mandatory headers, non-numeric /
  * overflowing Content-Length, truncated block, missing record
  * terminator, trailing garbage) and never throws.
  */
object Warc {

  /** One parsed record: the version token ("1.0"/"1.1"), headers
    * keyed by their LOWER-CASED names (values trimmed), and the raw
    * block octets. */
  final case class Rec(version: String, headers: Map[String, String],
                       block: Array[Byte]) {
    def warcType: Option[String] = headers.get("warc-type")
    def contentLength: Long = block.length.toLong
  }

  private val CR = '\r'.toByte
  private val LF = '\n'.toByte

  /** Encoder half: one record's bytes — version line, headers in the
    * given order, blank line, block, CRLF CRLF terminator. The
    * Content-Length header is appended automatically (last, so the
    * fixture's header order stays stable). */
  def render(warcType: String, recordId: String, date: String,
             extraHeaders: Seq[(String, String)],
             block: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    sb.append("WARC-Date: ").append(date).append("\r\n")
    extraHeaders.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new Array[Byte](head.length + block.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    out(out.length - 4) = CR; out(out.length - 3) = LF
    out(out.length - 2) = CR; out(out.length - 1) = LF
    out
  }

  /** Strict parse of ONE record that must exactly tile `b` (the
    * Common Crawl convention: one record per gzip member, terminator
    * included). None on any malformation; never throws. */
  def parseMember(b: Array[Byte]): Option[Rec] =
    parseRecord(b, 0) match {
      case Some((rec, next)) if next == b.length => Some(rec)
      case _ => None
    }

  /** Strict parse of one record starting at `off`; returns the record
    * and the offset just past its CRLF CRLF terminator. Usable for
    * walking an UNCOMPRESSED .warc file of concatenated records. */
  def parseRecord(b: Array[Byte], off: Int): Option[(Rec, Int)] = {
    // version line
    val vEnd = lineEnd(b, off)
    if (vEnd < 0) return None
    val vLine = ascii(b, off, vEnd)
    if (vLine != "WARC/1.0" && vLine != "WARC/1.1") return None
    val version = vLine.substring(5)
    // header lines until the empty line
    var i = vEnd + 2
    var headers = Map.empty[String, String]
    var done = false
    while (!done) {
      val e = lineEnd(b, i)
      if (e < 0) return None
      if (e == i) done = true // empty line: header section ends
      else {
        val line = Utf8.decodeStrict(b, i, e - i) match {
          case Some(l) => l
          case None => return None // invalid UTF-8 header: malformed
        }
        val c = line.indexOf(':')
        if (c <= 0) return None // no colon, or empty name
        val name = line.substring(0, c).trim.toLowerCase
        if (name.isEmpty || name.exists(ch => ch <= ' ')) return None
        val value = line.substring(c + 1).trim
        if (headers.contains(name)) return None // duplicate header
        headers += (name -> value)
        i = e // advance to the CRLF we just validated
      }
      i += 2
    }
    // mandatory headers (ISO 28500 §5.2–§5.5)
    for (m <- Seq("warc-type", "warc-record-id", "warc-date",
                  "content-length"))
      if (!headers.contains(m)) return None
    val len = parseLen(headers("content-length")) match {
      case Some(v) => v
      case None => return None
    }
    if (len > Int.MaxValue - 4 || i + len + 4 > b.length)
      return None // truncated block
    val blockEnd = i + len.toInt
    if (b(blockEnd) != CR || b(blockEnd + 1) != LF ||
        b(blockEnd + 2) != CR || b(blockEnd + 3) != LF)
      return None // missing record terminator
    val block = java.util.Arrays.copyOfRange(b, i, blockEnd)
    Some((Rec(version, headers, block), blockEnd + 4))
  }

  /** HTTP message body extraction for `application/http` blocks: a
    * status/request line starting the message, CRLF-terminated header
    * lines, an empty line, then the body, with REAL message semantics
    * — the body forms every Common Crawl shard actually contains:
    *
    * - identity: when the message carries a Content-Length header it
    *   must match the remaining octet count exactly; otherwise the
    *   raw remainder is the body.
    * - `Transfer-Encoding: chunked` (RFC 9112 §7.1): hex chunk-size
    *   lines (optional ;extensions skipped), chunk octets + CRLF, the
    *   0-size last chunk, optional trailer header lines, final CRLF —
    *   the framing must exactly tile the remainder. A message with
    *   BOTH Transfer-Encoding and Content-Length is the request-
    *   smuggling shape → None. Any other transfer-coding → None.
    * - `Content-Encoding: gzip|x-gzip|deflate|br|identity` applied
    *   AFTER de-chunking: gzip through
    *   [[graft.operators.Inflate.gunzip]], deflate through the RFC
    *   1950 zlib form ([[graft.operators.Inflate.zlibDecode]]), br
    *   through the RFC 7932 decoder ([[graft.operators.Brotli]] —
    *   see its profile boundary). Any other (or duplicate) coding →
    *   None, so an unknown coding is COUNTED malformed, never passed
    *   through as garbage bytes.
    *
    * None on any malformation. */
  def httpBody(block: Array[Byte]): Option[Array[Byte]] =
    httpMessage(block).map(_._1)

  /** [[httpBody]] plus the message's Content-Type header value (None
    * when absent) — the charset-resolution input (t33). */
  def httpMessage(block: Array[Byte]): Option[(Array[Byte], Option[String])] = {
    val sEnd = lineEnd(block, 0)
    if (sEnd < 0) return None
    val start = ascii(block, 0, sEnd)
    // response status line or request line — either way the message
    // must declare HTTP/ somewhere in its first line
    if (!start.contains("HTTP/")) return None
    var i = sEnd + 2
    var declared: Option[Long] = None
    var transferEnc: Option[String] = None
    var contentEnc: Option[String] = None
    var contentType: Option[String] = None
    var done = false
    while (!done) {
      val e = lineEnd(block, i)
      if (e < 0) return None
      if (e == i) done = true
      else {
        // HTTP field lines are latin-1 octets (RFC 9112 §5.5's historic
        // charset), NOT UTF-8 — a high-byte header octet is data, not a
        // malformation (unlike WARC record headers, UTF-8 per ISO 28500)
        val line = new String(block, i, e - i, "ISO-8859-1")
        val c = line.indexOf(':')
        if (c <= 0) return None
        val name = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        name match {
          case "content-length" =>
            if (declared.isDefined) return None // duplicate
            declared = parseLen(value)
            if (declared.isEmpty) return None
          case "transfer-encoding" =>
            if (transferEnc.isDefined) return None // duplicate
            transferEnc = Some(value.toLowerCase)
          case "content-encoding" =>
            if (contentEnc.isDefined) return None // duplicate
            contentEnc = Some(value.toLowerCase)
          case "content-type" =>
            if (contentType.isDefined) return None // duplicate
            contentType = Some(value)
          case _ => ()
        }
        i = e
      }
      i += 2
    }
    val encoded: Array[Byte] = transferEnc match {
      case Some("chunked") =>
        if (declared.isDefined) return None // TE + CL: smuggling shape
        dechunk(block, i) match {
          case Some(b) => b
          case None => return None
        }
      case Some(_) => return None // unknown transfer-coding
      case None =>
        val body = java.util.Arrays.copyOfRange(block, i, block.length)
        declared match {
          case Some(n) if n != body.length.toLong => return None
          case _ => body
        }
    }
    val body = contentEnc match {
      case None | Some("identity") => Some(encoded)
      case Some("gzip") | Some("x-gzip") =>
        graft.operators.Inflate.gunzip(encoded)
      case Some("deflate") => graft.operators.Inflate.zlibDecode(encoded)
      case Some("br") => graft.operators.Brotli.decompress(encoded)
      case Some(_) => None // unknown content-coding: counted, not garbage
    }
    body.map((_, contentType))
  }

  /** RFC 9112 §7.1 chunked framing from `off`: size line (hex, case-
    * insensitive, optional ;extension skipped), chunk data + CRLF,
    * 0-size last chunk, trailer header lines, final CRLF; must
    * exactly tile the buffer. None on any malformation. */
  private def dechunk(b: Array[Byte], off: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = off
    var last = false
    while (!last) {
      val e = lineEnd(b, i)
      if (e < 0) return None
      val line = ascii(b, i, e)
      val semi = line.indexOf(';')
      val szStr = (if (semi >= 0) line.substring(0, semi) else line).trim
      val sz = parseHex(szStr) match {
        case Some(v) => v
        case None => return None
      }
      i = e + 2
      if (sz == 0) last = true
      else {
        if (i + sz + 2 > b.length) return None // truncated chunk
        out.write(b, i, sz.toInt)
        i += sz.toInt
        if (b(i) != CR || b(i + 1) != LF) return None
        i += 2
      }
    }
    // trailer section: zero or more header lines, then the empty line
    var done = false
    while (!done) {
      val e = lineEnd(b, i)
      if (e < 0) return None
      if (e == i) done = true
      else {
        val line = ascii(b, i, e)
        if (line.indexOf(':') <= 0) return None
        i = e
      }
      i += 2
    }
    if (i != b.length) return None // framing must tile the body
    Some(out.toByteArray)
  }

  /** Non-negative hex chunk size, case-insensitive; RFC 9112's
    * 1*HEXDIG permits leading zeros, so they are skipped before the
    * 8-significant-digit overflow cap (a >4 GiB chunk is out of
    * profile); None on empty or non-hex. */
  private def parseHex(s0: String): Option[Long] = {
    if (s0.isEmpty) return None
    var z = 0
    while (z < s0.length - 1 && s0.charAt(z) == '0') z += 1
    val s = s0.substring(z)
    if (s.length > 8) return None
    var v = 0L
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      val d =
        if (ch >= '0' && ch <= '9') ch - '0'
        else if (ch >= 'a' && ch <= 'f') ch - 'a' + 10
        else if (ch >= 'A' && ch <= 'F') ch - 'A' + 10
        else return None
      v = v * 16 + d
      i += 1
    }
    Some(v)
  }

  /** Index of the CR of the next CRLF at-or-after `from`, or -1 if
    * none before the buffer ends or a bare LF / stray CR intervenes
    * (WARC headers are CRLF-terminated by spec; a bare-LF header
    * section is a malformation, not a tolerated variant). */
  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length) {
      if (b(i) == CR)
        return if (i + 1 < b.length && b(i + 1) == LF) i else -1
      if (b(i) == LF) return -1 // bare LF
      i += 1
    }
    -1
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, "UTF-8")

  /** Non-negative decimal Content-Length; None on empty, non-digit,
    * or overflow past Long.MaxValue (accumulates negative so the
    * pre-multiply guard is exact — the Jsonl.parseLong discipline). */
  private def parseLen(s: String): Option[Long] = {
    if (s.isEmpty) return None
    var v = 0L
    val multmin = -Long.MaxValue / 10
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch < '0' || ch > '9') return None
      val d = ch - '0'
      if (v < multmin) return None
      v *= 10
      if (v < -Long.MaxValue + d) return None
      v -= d
      i += 1
    }
    Some(-v)
  }
}
