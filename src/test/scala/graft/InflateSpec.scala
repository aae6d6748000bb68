package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Inflate, Multimodal}

/** RFC 1951 inflate: round-trips against our own encoders AND against
  * java.util.zip (both directions — a decoder tested only against its
  * sibling encoder can share the same misreading of the spec), plus
  * hand-built malformed streams targeting each validation layer of
  * the Huffman path specifically. No Spark involved. */
class InflateSpec extends AnyFunSuite {

  private def payloads: Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(421) // deterministic
    Seq(
      Array.emptyByteArray,
      Array[Byte](0),
      "abcabcabcabcabcabc".getBytes("US-ASCII"), // overlapping matches
      Array.tabulate(300)(i => (i % 7).toByte), // long runs, dist < len
      Array.fill(2000)(0x42.toByte), // maximal matches, 258-length codes
      Array.tabulate(5000)(i => ((i * 31 + i / 13) % 256).toByte), // ramp
      { val a = new Array[Byte](3000); rnd.nextBytes(a); a }, // incompressible
      { // repetitive prefix then random tail: matcher must switch modes
        val a = new Array[Byte](1500); rnd.nextBytes(a)
        System.arraycopy(a, 0, a, 750, 750); a
      })
  }

  private def inflateAll(z: Array[Byte], n: Int): Option[Array[Byte]] =
    Inflate.inflate(z, 0, z.length, n).map(_._1)

  test("deflateFixed/deflateDynamic round-trip through our inflate, byte-exact") {
    for (p <- payloads; mode <- Seq(1, 2)) {
      val z = if (mode == 1) Inflate.deflateFixed(p) else Inflate.deflateDynamic(p)
      val back = inflateAll(z, p.length)
        .getOrElse(fail(s"inflate None, mode=$mode len=${p.length}"))
      assert(back.sameElements(p), s"drift, mode=$mode len=${p.length}")
      // exactOut is exact: one byte short or long must fail
      if (p.nonEmpty) assert(inflateAll(z, p.length - 1).isEmpty)
      assert(inflateAll(z, p.length + 1).isEmpty)
    }
  }

  test("java.util.zip.Inflater accepts our encoders' streams (independent decoder)") {
    for (p <- payloads; mode <- Seq(1, 2)) {
      val z = if (mode == 1) Inflate.deflateFixed(p) else Inflate.deflateDynamic(p)
      val inf = new java.util.zip.Inflater(true) // raw deflate
      inf.setInput(z)
      val out = new Array[Byte](p.length + 16)
      val n = inf.inflate(out)
      assert(inf.finished(), s"zlib did not reach final block, mode=$mode")
      inf.end()
      assert(n == p.length && out.take(n).sameElements(p),
        s"zlib disagrees, mode=$mode len=${p.length}")
    }
  }

  test("our inflate decodes java.util.zip.Deflater streams (independent encoder)") {
    for (p <- payloads; level <- Seq(1, 6, 9)) {
      val d = new java.util.zip.Deflater(level, true) // raw deflate
      d.setInput(p); d.finish()
      val buf = new Array[Byte](p.length + 1024)
      val n = d.deflate(buf)
      assert(d.finished(), "deflater buffer too small for fixture")
      d.end()
      val z = buf.take(n)
      val back = inflateAll(z, p.length)
        .getOrElse(fail(s"inflate None on Deflater level=$level len=${p.length}"))
      assert(back.sameElements(p), s"drift on Deflater level=$level")
    }
  }

  // LSB-first bit writer for hand-building malformed streams
  private class BW {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var buf = 0; private var cnt = 0
    def put(v: Int, n: Int): Unit = {
      buf |= (v & ((1 << n) - 1)) << cnt; cnt += n
      while (cnt >= 8) { out += (buf & 0xff).toByte; buf >>>= 8; cnt -= 8 }
    }
    def bytes: Array[Byte] = {
      (out ++ (if (cnt > 0) Seq((buf & 0xff).toByte) else Nil)).toArray
    }
  }

  test("malformed streams are rejected at the layer that breaks (never throw)") {
    // BTYPE=11 reserved
    val b1 = new BW; b1.put(1, 1); b1.put(3, 2)
    assert(inflateAll(b1.bytes, 0).isEmpty, "reserved BTYPE")

    // dynamic header: repeat-16 as the FIRST code length (no previous).
    // CL code over {0, 16}, both length 1 — canonical assignment sorts
    // by (len, symbol): code 0 → symbol 0, code 1 → symbol 16.
    val b2b = new BW
    b2b.put(1, 1); b2b.put(2, 2)
    b2b.put(0, 5); b2b.put(0, 5); b2b.put(0, 4)
    b2b.put(1, 3); b2b.put(0, 3); b2b.put(0, 3); b2b.put(1, 3)
    b2b.put(1, 1); b2b.put(0, 2) // symbol 16, repeat 3 — with n == 0
    assert(inflateAll(b2b.bytes ++ Array.fill(8)(0.toByte), 0).isEmpty,
      "repeat-16 with no previous length")

    // dynamic header: over-subscribed CL code (three lengths of 1)
    val b3 = new BW
    b3.put(1, 1); b3.put(2, 2)
    b3.put(0, 5); b3.put(0, 5); b3.put(1, 4) // HCLEN=5: order 16,17,18,0,8
    for (_ <- 0 until 5) b3.put(1, 3)        // five 1-bit codes: Kraft > 1
    assert(inflateAll(b3.bytes ++ Array.fill(8)(0.toByte), 0).isEmpty,
      "over-subscribed code-length code")

    // dynamic header: end-of-block code absent (lens(256) = 0)
    val b4 = new BW
    b4.put(1, 1); b4.put(2, 2)
    b4.put(0, 5); b4.put(0, 5); b4.put(14, 4) // HCLEN=18 (through '1')
    // order [16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1]: give 18 and 1
    // length 1, everything else 0 → symbols {1,18}, complete
    val clLens = Array(0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)
    clLens.foreach(l => b4.put(l, 3))
    // canonical: code 0 → symbol 1, code 1 → symbol 18
    // lens: symbol 1 (len 1) for index 0, then 18-runs of zeros for the
    // remaining 256 litlen + 1 dist = 257 entries: 138 + 119
    b4.put(0, 1)                 // lens(0) = 1
    b4.put(1, 1); b4.put(127, 7) // 18: 11+127 = 138 zeros
    b4.put(1, 1); b4.put(108, 7) // 18: 11+108 = 119 zeros
    assert(inflateAll(b4.bytes ++ Array.fill(8)(0.toByte), 0).isEmpty,
      "missing end-of-block code")

    // fixed block: back-reference with nothing in the window
    val b5 = new BW
    b5.put(1, 1); b5.put(1, 2)   // BFINAL, BTYPE=01
    // fixed code for symbol 257 (length 3): 7-bit code 0000001, MSB-first
    for (bit <- Seq(0, 0, 0, 0, 0, 0, 1)) b5.put(bit, 1)
    // distance symbol 0 (distance 1): 5-bit code 00000
    for (_ <- 0 until 5) b5.put(0, 1)
    assert(inflateAll(b5.bytes ++ Array.fill(4)(0.toByte), 3).isEmpty,
      "distance beyond output start")

    // stored block: LEN/NLEN mismatch
    val b6 = Array[Byte](0, 5, 0, 0, 0) // BFINAL=0+BTYPE=00, LEN=5, NLEN=0
    assert(inflateAll(b6 ++ Array.fill(8)(0.toByte), 5).isEmpty, "LEN/NLEN")

    // truncation inside a dynamic block body
    val good = Inflate.deflateDynamic("hello hello hello".getBytes)
    assert(inflateAll(good.dropRight(3), 17).isEmpty, "truncated stream")
  }

  test("gzip member round-trips all modes and header variants; java.util.zip agrees") {
    val variants = Seq[(Option[String], Option[String], Option[Array[Byte]], Boolean)](
      (None, None, None, false),
      (Some("doc.txt"), None, None, false),
      (None, Some("a comment"), None, true),
      (Some("n"), Some("c"), Some(Array[Byte](1, 2, 3, 0, -1)), true))
    for (p <- payloads; mode <- Seq(0, 1, 2)) {
      val (fn, fc, ex, hc) = variants((p.length + mode) % variants.length)
      val z = Inflate.gzipMember(p, mode, fn, fc, ex, hc)
      val back = Inflate.gunzip(z).getOrElse(fail(s"gunzip None, mode=$mode"))
      assert(back.sameElements(p), s"gzip drift, mode=$mode len=${p.length}")
      // independent decoder: GZIPInputStream accepts our member
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(z))
      val all = in.readAllBytes(); in.close()
      assert(all.sameElements(p), s"java.util.zip disagrees, mode=$mode")
    }
    // independent encoder: our gunzip decodes GZIPOutputStream members
    for (p <- payloads) {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(p); gz.close()
      val back = Inflate.gunzip(bos.toByteArray)
        .getOrElse(fail(s"gunzip None on GZIPOutputStream, len=${p.length}"))
      assert(back.sameElements(p), "drift on GZIPOutputStream member")
    }
    // corruption: flipped CRC byte, flipped ISIZE, bad header CRC16,
    // reserved FLG bit, truncation — all rejected
    val good = Inflate.gzipMember("gzip integrity layers".getBytes, 2,
      fname = Some("f"), hcrc = true)
    def flip(i: Int): Array[Byte] = {
      val b = good.clone(); b(i) = (b(i) ^ 0x1).toByte; b
    }
    assert(Inflate.gunzip(flip(good.length - 1)).isEmpty, "ISIZE corruption")
    assert(Inflate.gunzip(flip(good.length - 5)).isEmpty, "CRC-32 corruption")
    assert(Inflate.gunzip(flip(3)).isEmpty, "FLG corruption (reserved/feature bit)")
    assert(Inflate.gunzip(flip(11)).isEmpty, "FNAME/HCRC region corruption")
    assert(Inflate.gunzip(good.dropRight(4)).isEmpty, "truncation")
    val rsv = good.clone(); rsv(3) = (rsv(3) | 0x40).toByte
    assert(Inflate.gunzip(rsv).isEmpty, "reserved FLG bit must reject")
  }

  test("gunzipMembers walks concatenated members; java.util.zip agrees both ways") {
    val pieces = Seq("first member", "", "third — with ünïcode 😀",
      "a longer fourth member with enough text to leave the stored path " * 3)
      .map(_.getBytes("UTF-8"))
    val flat = pieces.foldLeft(Array.emptyByteArray)(_ ++ _)
    // our encoder, modes and headers rotating per member
    val ours = pieces.zipWithIndex.map { case (p, j) =>
      Inflate.gzipMember(p, j % 3,
        fname = if (j % 4 == 1) Some(s"m$j") else None,
        fcomment = if (j % 4 == 2) Some("multi") else None,
        hcrc = j % 4 >= 2)
    }.foldLeft(Array.emptyByteArray)(_ ++ _)
    val (raw, nm) = Inflate.gunzipMembers(ours)
      .getOrElse(fail("gunzipMembers None on our own members"))
    assert(nm == pieces.length)
    assert(raw.sameElements(flat), "concat drift")
    // java.util.zip reads multi-member streams natively: cross-check ours
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(ours))
    assert(in.readAllBytes().sameElements(flat),
      "java.util.zip disagrees on our multi-member stream")
    in.close()
    // and we read java's concatenated members (the `cat a.gz b.gz` case)
    val javas = pieces.map { p =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(p); gz.close(); bos.toByteArray
    }.foldLeft(Array.emptyByteArray)(_ ++ _)
    val (raw2, nm2) = Inflate.gunzipMembers(javas)
      .getOrElse(fail("gunzipMembers None on GZIPOutputStream members"))
    assert(nm2 == pieces.length && raw2.sameElements(flat))
    // a single member returns exactly gunzip's bytes
    val single = Inflate.gzipMember("just one".getBytes, 1)
    assert(Inflate.gunzipMembers(single).get._1
      .sameElements(Inflate.gunzip(single).get))
    assert(Inflate.gunzipMembers(single).get._2 == 1)
    // negative space: corruption in the SECOND member, garbage between
    // members, truncated final trailer, empty input — all rejected
    val two = Inflate.gzipMember("aaa".getBytes, 0) ++
      Inflate.gzipMember("bbb".getBytes, 2)
    assert(Inflate.gunzipMembers(two).exists(_._2 == 2))
    val badSecond = two.clone()
    badSecond(two.length - 5) = (badSecond(two.length - 5) ^ 0x1).toByte
    assert(Inflate.gunzipMembers(badSecond).isEmpty, "2nd-member CRC corruption")
    val gap = Inflate.gzipMember("aaa".getBytes, 0) ++ Array[Byte](0x55) ++
      Inflate.gzipMember("bbb".getBytes, 2)
    assert(Inflate.gunzipMembers(gap).isEmpty, "inter-member garbage must reject")
    assert(Inflate.gunzipMembers(two.dropRight(3)).isEmpty, "truncated trailer")
    assert(Inflate.gunzipMembers(Array.emptyByteArray).isEmpty, "empty input")
    // maxOut bounds total decoded size across members
    assert(Inflate.gunzipMembers(two, maxOut = 5).isEmpty, "maxOut must bound")
  }

  test("parsePng decodes all three deflate modes; Huffman-layer corruption rejected") {
    def px(x: Int, y: Int): (Int, Int, Int) =
      ((x * 7 + y) % 256, (y * 5) % 256, (x + 3 * y) % 256)
    for (mode <- Seq(0, 1, 2); (w, h) <- Seq((4, 3), (17, 11));
         filt <- Seq(false, true)) {
      val bytes = Multimodal.encodePng(w, h, gap = 4, px,
        deflateMode = mode, filtered = filt)
      val img = Multimodal.parsePng(bytes)
        .getOrElse(fail(s"parsePng None, mode=$mode filt=$filt $w x $h"))
      assert(img.width == w && img.height == h)
      for (x <- 0 until w; y <- 0 until h)
        assert(img.rgb(x, y) == px(x, y),
          s"pixel drift ($x,$y) mode=$mode filt=$filt")
    }
    // the filtered encoding actually uses ALL FIVE filter types: with
    // h = 11 ≥ 5 rows, row y gets type (y + w + h) % 5 — inflate the
    // zlib payload of a stored-mode image and read the filter bytes
    {
      val w = 17; val h = 11
      val bytes = Multimodal.encodePng(w, h, gap = 0, px,
        deflateMode = 0, filtered = true)
      val idat = {
        val t = "IDAT".getBytes("US-ASCII")
        (0 until bytes.length - 4).filter(i => bytes.slice(i, i + 4).sameElements(t))
      }
      val z = idat.flatMap { i =>
        val len = java.nio.ByteBuffer.wrap(bytes, i - 4, 4).getInt
        bytes.slice(i + 4, i + 4 + len)
      }.toArray
      val raw = Inflate.inflate(z, 2, z.length, h * (1 + 3 * w)).get._1
      val fts = (0 until h).map(y => raw(y * (1 + 3 * w)).toInt).toSet
      assert(fts == Set(0, 1, 2, 3, 4),
        s"filtered corpus must exercise all five filter types, got $fts")
    }
    // corrupt INSIDE the zlib body of a dynamic-mode PNG and re-CRC the
    // chunk, so the chunk layer can no longer catch it — rejection must
    // come from the inflate/Adler layer (the new validation surface)
    val png = Multimodal.encodePng(17, 11, gap = 0, px, deflateMode = 2)
    val idat = {
      val t = "IDAT".getBytes("US-ASCII")
      (0 until png.length - 4).find(i => png.slice(i, i + 4).sameElements(t)).get
    }
    val lenOff = idat - 4
    val len = java.nio.ByteBuffer.wrap(png, lenOff, 4).getInt
    for (delta <- Seq(5, 9, len / 2, len - 1)) {
      val bad = png.clone()
      bad(idat + 4 + delta) = (bad(idat + 4 + delta) ^ 0x55).toByte
      val crc = new java.util.zip.CRC32
      crc.update(bad, idat, 4 + len)
      val c = crc.getValue
      bad(idat + 4 + len) = ((c >> 24) & 0xff).toByte
      bad(idat + 4 + len + 1) = ((c >> 16) & 0xff).toByte
      bad(idat + 4 + len + 2) = ((c >> 8) & 0xff).toByte
      bad(idat + 4 + len + 3) = (c & 0xff).toByte
      assert(Multimodal.parsePng(bad).isEmpty,
        s"zlib-body corruption at +$delta must be rejected by inflate/Adler")
    }
  }
}
