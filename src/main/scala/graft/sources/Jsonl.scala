package graft.sources

/** Minimal strict JSONL record codec for the record-framed compressed
  * intake path (t26 batch / e16 streaming): real 100-TB text corpora
  * arrive as gzip members whose DECOMPRESSED payload is
  * newline-delimited JSON records, so the read path must parse a
  * record LAYER below t25's member layer — per record, with malformed
  * records COUNTED (a broken record must never take the job down, and
  * must never be silently dropped either).
  *
  * Record shape: one flat JSON object per line,
  * `{"doc": <long>, "seq": <long>, "body": "<string>"}` — keys in any
  * order, each exactly once, nothing else. [[escape]] is the encoder
  * half (the fixture generator writes through it); [[parseRecord]] is
  * the decoder — `None` on ANY malformation (bad syntax, wrong keys,
  * duplicate keys, missing keys, raw control chars inside a string,
  * invalid escapes, trailing garbage, integer overflow) and never
  * throws. Escape/unescape are exact inverses on every string, so the
  * decoded bodies re-derive from the source text in the oracle.
  */
object Jsonl {

  final case class Rec(doc: Long, seq: Long, body: String)

  /** JSON string escaping: backslash, quote, and all control chars
    * (<0x20; \n \r \t get their short forms). Everything else —
    * including non-ASCII and non-BMP — passes through raw, which is
    * valid JSON and keeps the framing newline-free. */
  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case _ if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case _ => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** One encoded record line (the fixture generator's emitter). */
  def record(doc: Long, seq: Long, body: String): String =
    s"""{"doc":$doc,"seq":$seq,"body":"${escape(body)}"}"""

  // internal control-flow signal for the strict parser; callers of
  // parseRecord never see it
  private object Bad extends scala.util.control.ControlThrowable

  /** Strict parse of one record line; None on any malformation. */
  def parseRecord(line: String): Option[Rec] =
    try Some(parse0(line)) catch { case Bad => None }

  private def parse0(line: String): Rec = {
    val n = line.length
    var i = 0
    def bad(): Nothing = throw Bad
    def ws(): Unit = {
      while (i < n && (line.charAt(i) == ' ' || line.charAt(i) == '\t')) i += 1
    }
    def expect(c: Char): Unit = {
      if (i >= n || line.charAt(i) != c) bad()
      i += 1
    }
    def parseString(): String = {
      expect('"')
      val b = new StringBuilder()
      while (true) {
        if (i >= n) bad()
        val c = line.charAt(i)
        if (c == '"') { i += 1; return b.toString }
        else if (c == '\\') {
          i += 1
          if (i >= n) bad()
          line.charAt(i) match {
            case '"' => b.append('"')
            case '\\' => b.append('\\')
            case '/' => b.append('/')
            case 'b' => b.append('\b')
            case 'f' => b.append('\f')
            case 'n' => b.append('\n')
            case 'r' => b.append('\r')
            case 't' => b.append('\t')
            case 'u' =>
              if (i + 4 >= n) bad()
              var v = 0
              var k = 1
              while (k <= 4) {
                val h = line.charAt(i + k)
                val d =
                  if (h >= '0' && h <= '9') h - '0'
                  else if (h >= 'a' && h <= 'f') h - 'a' + 10
                  else if (h >= 'A' && h <= 'F') h - 'A' + 10
                  else bad()
                v = (v << 4) | d
                k += 1
              }
              i += 4
              b.append(v.toChar) // surrogate halves append naturally
            case _ => bad()
          }
          i += 1
        } else if (c < ' ') bad() // raw control char: invalid JSON
        else { b.append(c); i += 1 }
      }
      bad() // unreachable; keeps the compiler's definite-return happy
    }
    def parseLong(): Long = {
      val neg = i < n && line.charAt(i) == '-'
      if (neg) i += 1
      val start = i
      // Accumulate NEGATIVE (java.lang.Long.parseLong's discipline) so
      // Long.MinValue round-trips and overflow is caught BEFORE the
      // multiply — v*10 can wrap past the sign bit back to positive,
      // so a post-hoc `v < 0` test lets e.g. 2^65+1 parse as 1. RFC
      // 8259 numbers are unbounded; our record contract is a Long, so
      // out-of-range = malformed.
      val limit = if (neg) Long.MinValue else -Long.MaxValue
      val multmin = limit / 10
      var v = 0L
      while (i < n && line.charAt(i) >= '0' && line.charAt(i) <= '9') {
        val d = line.charAt(i) - '0'
        if (v < multmin) bad()
        v *= 10
        if (v < limit + d) bad()
        v -= d
        i += 1
      }
      if (i == start) bad() // no digits
      // RFC 8259 forbids leading zeros ("007"): a conforming oracle
      // parser would count such a record malformed, so we must too
      // ("-0" stays accepted — the RFC's int grammar allows it)
      if (line.charAt(start) == '0' && i - start > 1) bad()
      if (neg) v else -v
    }
    ws(); expect('{')
    var doc: java.lang.Long = null
    var seq: java.lang.Long = null
    var body: String = null
    var more = true
    while (more) {
      ws()
      val key = parseString()
      ws(); expect(':'); ws()
      key match {
        case "doc" => if (doc != null) bad(); doc = parseLong()
        case "seq" => if (seq != null) bad(); seq = parseLong()
        case "body" => if (body != null) bad(); body = parseString()
        case _ => bad() // unknown key: outside the record shape
      }
      ws()
      if (i < n && line.charAt(i) == ',') i += 1
      else { expect('}'); more = false }
    }
    ws()
    if (i != n) bad() // trailing garbage after the object
    if (doc == null || seq == null || body == null) bad()
    Rec(doc, seq, body)
  }
}
