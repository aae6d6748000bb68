package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Inflate
import graft.sources.Warc

/** Strict WARC (ISO 28500) record codec: render/parseMember must be
  * exact inverses, every malformation class must return None — never
  * throw, never misread — and the member-boundary gzip walk must
  * keep boundaries (the t28/e17 oracle identity depends on all
  * three). No Spark involved. */
class WarcSpec extends AnyFunSuite {

  private val date = "2024-01-01T00:00:00Z"

  private def resp(body: String, id: String = "<urn:uuid:r1>"): Array[Byte] = {
    val b = body.getBytes("UTF-8")
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: ${b.length}\r\n\r\n").getBytes("UTF-8") ++ b
    Warc.render("response", id, date,
      Seq("WARC-Target-URI" -> "http://example.com/x",
        "Content-Type" -> "application/http; msgtype=response"), http)
  }

  test("render/parseMember round-trips; headers are case-insensitive and trimmed") {
    val bodies = Seq("", "plain", "with\r\nCRLFs and \"quotes\"",
      "unicode é 漢字 и", "non-BMP 😀 emoji", "WARC/1.0 lookalike\r\n\r\n")
    for (b <- bodies) {
      val rec = Warc.parseMember(resp(b)).getOrElse(fail(s"parse None for: $b"))
      assert(rec.version == "1.0")
      assert(rec.warcType.contains("response"))
      assert(rec.headers("warc-target-uri") == "http://example.com/x")
      val body = Warc.httpBody(rec.block).getOrElse(fail("httpBody None"))
      assert(new String(body, "UTF-8") == b, "body round-trip drift")
    }
    // mixed-case header names and extra value whitespace tolerated
    val raw = ("WARC/1.1\r\nwarc-TYPE:   metadata \r\n" +
      "WARC-Record-ID: <urn:uuid:x>\r\nWarc-Date: " + date + "\r\n" +
      "CONTENT-LENGTH: 2\r\n\r\nhi\r\n\r\n").getBytes("UTF-8")
    val rec = Warc.parseMember(raw).getOrElse(fail("mixed-case parse None"))
    assert(rec.version == "1.1" && rec.warcType.contains("metadata"))
    assert(new String(rec.block, "UTF-8") == "hi")
  }

  test("parseRecord walks concatenated uncompressed records") {
    val a = resp("first", "<urn:uuid:a>")
    val b = resp("second", "<urn:uuid:b>")
    val cat = a ++ b
    val (r1, n1) = Warc.parseRecord(cat, 0).getOrElse(fail("rec 1 None"))
    assert(n1 == a.length)
    val (r2, n2) = Warc.parseRecord(cat, n1).getOrElse(fail("rec 2 None"))
    assert(n2 == cat.length)
    assert(Warc.httpBody(r1.block).map(new String(_, "UTF-8")).contains("first"))
    assert(Warc.httpBody(r2.block).map(new String(_, "UTF-8")).contains("second"))
    // parseMember requires exact tiling: two records in one member fail
    assert(Warc.parseMember(cat).isEmpty)
  }

  test("every malformation class returns None, never throws") {
    val ok = resp("payload body")
    def s2b(s: String) = s.getBytes("UTF-8")
    val blockLen = "Content-Length: "
    val bad: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      s2b("WARC/1.0\r\n\r\n"), // no headers at all
      s2b("WARC/2.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n"), // unknown version
      s2b("warc/1.0" + new String(ok.drop(8), "ISO-8859-1")), // case-sensitive version
      // bare-LF line ends are a malformation, not a tolerated variant
      s2b(new String(ok, "ISO-8859-1").replaceFirst("\r\n", "\n")),
      s2b("WARC/1.0\r\nNoColonHeader\r\n\r\n\r\n\r\n"),
      s2b("WARC/1.0\r\n: value\r\n\r\n\r\n\r\n"), // empty header name
      // duplicate header (case-insensitive)
      s2b("WARC/1.0\r\nWARC-Type: a\r\nwarc-type: b\r\n" +
        "WARC-Record-ID: <u>\r\nWARC-Date: " + date +
        "\r\nContent-Length: 0\r\n\r\n\r\n\r\n"),
      // each mandatory header missing in turn
      s2b("WARC/1.0\r\nWARC-Record-ID: <u>\r\nWARC-Date: " + date +
        "\r\nContent-Length: 0\r\n\r\n\r\n\r\n"), // no type
      s2b("WARC/1.0\r\nWARC-Type: x\r\nWARC-Date: " + date +
        "\r\nContent-Length: 0\r\n\r\n\r\n\r\n"), // no id
      s2b("WARC/1.0\r\nWARC-Type: x\r\nWARC-Record-ID: <u>" +
        "\r\nContent-Length: 0\r\n\r\n\r\n\r\n"), // no date
      s2b("WARC/1.0\r\nWARC-Type: x\r\nWARC-Record-ID: <u>\r\nWARC-Date: " +
        date + "\r\n\r\n\r\n\r\n"), // no length
      // Content-Length malformations: sign, blank, non-digit, overflow
      s2b(new String(ok, "ISO-8859-1").replaceFirst(blockLen + "\\d+",
        blockLen + "-1")),
      s2b(new String(ok, "ISO-8859-1").replaceFirst(blockLen + "\\d+",
        blockLen.trim)),
      s2b(new String(ok, "ISO-8859-1").replaceFirst(blockLen + "\\d+",
        blockLen + "12x")),
      s2b(new String(ok, "ISO-8859-1").replaceFirst(blockLen + "\\d+",
        blockLen + "99999999999999999999")),
      // declared length larger than the remaining bytes (truncation)
      s2b(new String(ok, "ISO-8859-1").replaceFirst(blockLen + "(\\d+)",
        blockLen + "9999")),
      ok.dropRight(1), // terminator cut
      ok.dropRight(6), // the t28 corruption idiom: always malformed
      ok ++ s2b(" "), // trailing garbage after the final terminator
      { val c = ok.clone() // terminator bytes overwritten
        c(c.length - 2) = 'X'.toByte; c })
    bad.foreach { m =>
      assert(Warc.parseMember(m).isEmpty,
        s"must reject: ${new String(m.take(120), "ISO-8859-1")}")
    }
    // the corruption idiom stays malformed even for an empty body
    assert(Warc.parseMember(resp("").dropRight(6)).isEmpty)
  }

  test("httpBody: declared-length mismatch, missing blank line, non-HTTP start all None") {
    def b(s: String) = s.getBytes("UTF-8")
    assert(Warc.httpBody(b("HTTP/1.1 200 OK\r\n\r\nbody")).map(new String(_, "UTF-8"))
      .contains("body"))
    // request-line form works too (msgtype=request blocks)
    assert(Warc.httpBody(b("GET /x HTTP/1.1\r\nHost: h\r\n\r\n"))
      .map(_.length).contains(0))
    assert(Warc.httpBody(b("HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nbody"))
      .map(new String(_, "UTF-8")).contains("body"))
    assert(Warc.httpBody(b("HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nbody")).isEmpty)
    assert(Warc.httpBody(
      b("HTTP/1.1 200 OK\r\nContent-Length: 4\r\nContent-Length: 4\r\n\r\nbody")).isEmpty)
    assert(Warc.httpBody(b("HTTP/1.1 200 OK\r\nNo blank line")).isEmpty)
    assert(Warc.httpBody(b("not an http message\r\n\r\nbody")).isEmpty)
    assert(Warc.httpBody(b("HTTP/1.1 200 OK\nLF only\n\nbody")).isEmpty)
  }

  private def msg(headers: Seq[String], body: Array[Byte]): Array[Byte] =
    (Seq("HTTP/1.1 200 OK") ++ headers).mkString("", "\r\n", "\r\n\r\n")
      .getBytes("UTF-8") ++ body

  private def chunk(parts: Seq[String], trailer: Seq[String] = Nil,
                    ext: String = "", upper: Boolean = false): Array[Byte] = {
    val sb = new StringBuilder
    parts.zipWithIndex.foreach { case (p, k) =>
      val size = if (upper) p.getBytes("UTF-8").length.toHexString.toUpperCase
                 else p.getBytes("UTF-8").length.toHexString
      sb.append(size).append(if (k == 0) ext else "").append("\r\n")
        .append(p).append("\r\n")
    }
    sb.append("0\r\n")
    trailer.foreach(t => sb.append(t).append("\r\n"))
    sb.append("\r\n")
    sb.toString.getBytes("UTF-8")
  }

  test("httpBody: chunked transfer-coding — framing, extensions, mixed-case hex, trailers") {
    def get(b: Array[Byte]) = Warc.httpBody(b).map(new String(_, "UTF-8"))
    val te = Seq("Transfer-Encoding: chunked")
    assert(get(msg(te, chunk(Seq("hello ", "chunked", " world"))))
      .contains("hello chunked world"))
    // empty body: just the last chunk
    assert(get(msg(te, chunk(Nil))).contains(""))
    // chunk extension skipped, not data
    assert(get(msg(te, chunk(Seq("ab", "cd"), ext = ";graft=1"))).contains("abcd"))
    // uppercase hex sizes
    assert(get(msg(te, chunk(Seq("x" * 30, "y" * 11), upper = true)))
      .contains("x" * 30 + "y" * 11))
    // trailer header lines after the last chunk
    assert(get(msg(te, chunk(Seq("tail"), trailer = Seq("X-T: 1", "X-U: 2"))))
      .contains("tail"))
    // case-insensitive header value
    assert(get(msg(Seq("Transfer-Encoding: Chunked"), chunk(Seq("ok"))))
      .contains("ok"))
    // RFC 9112 1*HEXDIG: leading zeros are valid chunk sizes, and more
    // than 8 SIGNIFICANT digits still overflows
    assert(get(msg(te, "000000001a\r\n".getBytes("UTF-8") ++
      ("z" * 26 + "\r\n0\r\n\r\n").getBytes("UTF-8"))).contains("z" * 26))
    assert(Warc.httpBody(msg(te,
      "00123456789\r\nhi\r\n0\r\n\r\n".getBytes("UTF-8"))).isEmpty)
  }

  test("HTTP header lines are latin-1 octets (RFC 9112), not strict UTF-8") {
    // a high-byte (invalid-UTF-8) octet in an HTTP header value is
    // data, not a malformation — unlike WARC record headers
    val head = "HTTP/1.1 200 OK\r\nX-Legacy: café\r\nContent-Length: 2\r\n\r\n"
    val b = head.getBytes("ISO-8859-1") ++ "ok".getBytes("UTF-8")
    assert(Warc.httpBody(b).map(new String(_, "UTF-8")).contains("ok"))
  }

  test("httpMessage surfaces the Content-Type header; duplicates reject") {
    val b = msg(Seq("Content-Type: text/html; charset=windows-1252",
      "Content-Length: 2"), "hi".getBytes("UTF-8"))
    val (body, ct) = Warc.httpMessage(b).getOrElse(fail("message None"))
    assert(new String(body, "UTF-8") == "hi")
    assert(ct.contains("text/html; charset=windows-1252"))
    assert(Warc.httpMessage(msg(Seq("Content-Type: a", "Content-Type: b"),
      Array.emptyByteArray)).isEmpty)
    // absent Content-Type -> None field
    assert(Warc.httpMessage(msg(Nil, Array.emptyByteArray))
      .exists(_._2.isEmpty))
  }

  test("httpBody: chunked malformations all None — sizes, truncation, framing, smuggling shape") {
    def b(s: String) = s.getBytes("UTF-8")
    val te = Seq("Transfer-Encoding: chunked")
    // non-hex, empty, and oversized chunk-size lines
    assert(Warc.httpBody(msg(te, b("zz\r\nhi\r\n0\r\n\r\n"))).isEmpty)
    assert(Warc.httpBody(msg(te, b("\r\nhi\r\n0\r\n\r\n"))).isEmpty)
    assert(Warc.httpBody(msg(te, b("123456789\r\nhi\r\n0\r\n\r\n"))).isEmpty)
    // declared size overruns the remaining bytes (truncated chunk)
    assert(Warc.httpBody(msg(te, b("ff\r\nshort\r\n0\r\n\r\n"))).isEmpty)
    // chunk data not followed by CRLF
    assert(Warc.httpBody(msg(te, b("2\r\nhiX\r\n0\r\n\r\n"))).isEmpty)
    // missing last chunk / missing final CRLF / trailing garbage
    assert(Warc.httpBody(msg(te, b("2\r\nhi\r\n"))).isEmpty)
    assert(Warc.httpBody(msg(te, b("2\r\nhi\r\n0\r\n"))).isEmpty)
    assert(Warc.httpBody(msg(te, chunk(Seq("hi")) ++ b("junk"))).isEmpty)
    // malformed trailer line (no colon)
    assert(Warc.httpBody(msg(te, b("2\r\nhi\r\n0\r\nnocolon\r\n\r\n"))).isEmpty)
    // Transfer-Encoding + Content-Length: the request-smuggling shape
    assert(Warc.httpBody(msg(
      Seq("Transfer-Encoding: chunked", "Content-Length: 2"),
      chunk(Seq("hi")))).isEmpty)
    // unknown / duplicate transfer-coding
    assert(Warc.httpBody(msg(Seq("Transfer-Encoding: gzip"), b("x"))).isEmpty)
    assert(Warc.httpBody(msg(
      Seq("Transfer-Encoding: chunked", "Transfer-Encoding: chunked"),
      chunk(Seq("hi")))).isEmpty)
  }

  test("httpBody: Content-Encoding gzip / x-gzip / deflate decode; unknown and corrupt None") {
    def get(b: Array[Byte]) = Warc.httpBody(b).map(new String(_, "UTF-8"))
    val text = "compressed response body é 😀"
    val raw = text.getBytes("UTF-8")
    for (mode <- 0 to 2) {
      val gz = Inflate.gzipMember(raw, mode)
      assert(get(msg(Seq("Content-Encoding: gzip",
        s"Content-Length: ${gz.length}"), gz)).contains(text), s"gzip mode $mode")
      assert(get(msg(Seq("Content-Encoding: x-gzip",
        s"Content-Length: ${gz.length}"), gz)).contains(text))
      val zl = Inflate.zlibEncode(raw, mode)
      assert(get(msg(Seq("Content-Encoding: deflate",
        s"Content-Length: ${zl.length}"), zl)).contains(text), s"deflate mode $mode")
    }
    // chunked + gzip composes: de-chunk first, then decode
    val gz = Inflate.gzipMember(raw, 2)
    val chunkedGz = {
      val sb = new scala.collection.mutable.ArrayBuffer[Byte]()
      gz.grouped(13).foreach { g =>
        sb ++= (g.length.toHexString + "\r\n").getBytes("UTF-8")
        sb ++= g; sb ++= "\r\n".getBytes("UTF-8")
      }
      sb ++= "0\r\n\r\n".getBytes("UTF-8")
      sb.toArray
    }
    assert(get(msg(Seq("Transfer-Encoding: chunked", "Content-Encoding: gzip"),
      chunkedGz)).contains(text))
    // brotli (RFC 7932) completes the coding dispatch
    val br = graft.operators.Brotli.compress(raw, 0)
    assert(get(msg(Seq("Content-Encoding: br",
      s"Content-Length: ${br.length}"), br)).contains(text))
    // identity passes through; unknown/duplicate codings are None
    assert(get(msg(Seq("Content-Encoding: identity", "Content-Length: 2"),
      "hi".getBytes("UTF-8"))).contains("hi"))
    assert(Warc.httpBody(msg(Seq("Content-Encoding: compress", "Content-Length: 2"),
      "hi".getBytes("UTF-8"))).isEmpty)
    // a 'br' body that is not a valid brotli stream is None, not garbage
    assert(Warc.httpBody(msg(Seq("Content-Encoding: br", "Content-Length: 2"),
      "hi".getBytes("UTF-8"))).isEmpty)
    assert(Warc.httpBody(msg(Seq("Content-Encoding: gzip, deflate",
      s"Content-Length: ${gz.length}"), gz)).isEmpty)
    assert(Warc.httpBody(msg(
      Seq("Content-Encoding: gzip", "Content-Encoding: gzip",
        s"Content-Length: ${gz.length}"), gz)).isEmpty)
    // corrupt compressed bodies are None, not garbage text
    val bad = gz.clone(); bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x55).toByte
    assert(Warc.httpBody(msg(Seq("Content-Encoding: gzip",
      s"Content-Length: ${bad.length}"), bad)).isEmpty)
    val zl = Inflate.zlibEncode(raw, 1)
    val badZl = zl.clone(); badZl(badZl.length - 1) = (badZl(badZl.length - 1) ^ 0x1).toByte
    assert(Warc.httpBody(msg(Seq("Content-Encoding: deflate",
      s"Content-Length: ${badZl.length}"), badZl)).isEmpty)
  }

  test("zlibEncode/zlibDecode round-trip; header and trailer malformations None") {
    for (mode <- 0 to 2; s <- Seq("", "x", "zlib round trip " * 40)) {
      val raw = s.getBytes("UTF-8")
      val z = Inflate.zlibEncode(raw, mode)
      assert(Inflate.zlibDecode(z).exists(java.util.Arrays.equals(_, raw)),
        s"zlib mode $mode len ${raw.length}")
    }
    val z = Inflate.zlibEncode("content".getBytes("UTF-8"), 2)
    val wrongMethod = z.clone(); wrongMethod(0) = 0x79.toByte
    assert(Inflate.zlibDecode(wrongMethod).isEmpty)
    val badCheck = z.clone(); badCheck(1) = (badCheck(1) ^ 0x4).toByte
    assert(Inflate.zlibDecode(badCheck).isEmpty)
    val badAdler = z.clone()
    badAdler(badAdler.length - 1) = (badAdler(badAdler.length - 1) ^ 0x1).toByte
    assert(Inflate.zlibDecode(badAdler).isEmpty)
    assert(Inflate.zlibDecode(z.dropRight(1)).isEmpty)
    assert(Inflate.zlibDecode(z :+ 0x0.toByte).isEmpty)
    assert(Inflate.zlibDecode(Array.emptyByteArray).isEmpty)
  }

  test("invalid UTF-8 in a WARC header line is a malformation") {
    val ok = resp("body text")
    // splice an invalid byte into the WARC-Target-URI header value
    val s = new String(ok, "ISO-8859-1")
    val at = s.indexOf("example.com")
    val bad = ok.clone()
    bad(at) = 0xff.toByte
    assert(Warc.parseMember(bad).isEmpty)
  }

  test("gunzipMemberList keeps member boundaries; gunzipMembers equals its concatenation") {
    val pieces = Seq("alpha", "", "gamma delta", "Ω non-BMP 😀")
      .map(_.getBytes("UTF-8"))
    val payload = pieces.zipWithIndex.flatMap { case (p, k) =>
      Inflate.gzipMember(p, k % 3,
        fname = if (k % 2 == 0) Some(s"m$k") else None,
        hcrc = k % 2 == 1)
    }.toArray
    val members = Inflate.gunzipMemberList(payload).getOrElse(fail("walk None"))
    assert(members.length == pieces.length)
    members.zip(pieces).foreach { case (got, exp) =>
      assert(java.util.Arrays.equals(got, exp), "member boundary drift")
    }
    val (cat, n) = Inflate.gunzipMembers(payload).getOrElse(fail("members None"))
    assert(n == pieces.length)
    assert(java.util.Arrays.equals(cat, pieces.toArray.flatten))
    // corrupt SECOND member kills the walk (length unknowable, no resync)
    val corrupt = payload.clone()
    corrupt(pieces.head.length + 30) = (corrupt(pieces.head.length + 30) ^ 0x1).toByte
    assert(Inflate.gunzipMemberList(corrupt).isEmpty)
  }
}
