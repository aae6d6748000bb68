package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Zstd

/** Hand-written RFC 8878 decoder vs the REAL zstd library (zstd-jni,
  * on the provided classpath because Spark ships it for shuffle
  * compression): every stream our decoder accepts must byte-match the
  * library's own decode of the same frame, across compression levels
  * (different literals/sequence mode mixes), content shapes (runs,
  * random, text-like, tiny, empty) and checksum settings — the
  * InflateSpec discipline with the reference implementation as the
  * second engine. Structural corruptions must return None, never
  * throw. No Spark involved. */
class ZstdSpec extends AnyFunSuite {

  private def jniCompress(raw: Array[Byte], level: Int): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(raw, level)

  private def jniCompressChecksum(raw: Array[Byte], level: Int): Array[Byte] = {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.setLevel(level)
      ctx.setChecksum(true)
      ctx.compress(raw)
    } finally ctx.close()
  }

  private val textLike: Array[Byte] = {
    val sb = new StringBuilder
    val words = Seq("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "pack", "my", "box", "with", "five", "dozen")
    val rnd = new scala.util.Random(0xD0C5)
    (0 until 4000).foreach { _ =>
      sb.append(words(rnd.nextInt(words.length))).append(' ')
      if (rnd.nextInt(12) == 0) sb.append('\n')
    }
    sb.toString.getBytes("UTF-8")
  }

  private def shapes: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(0x25D)
    Seq(
      ("empty", Array.emptyByteArray),
      ("one", Array[Byte](42)),
      ("tiny", "hello zstd".getBytes("UTF-8")),
      ("run", Array.fill[Byte](10000)(7)),
      ("almost-run", Array.tabulate[Byte](8192)(i => if (i % 997 == 0) 1 else 0)),
      ("random", Array.fill[Byte](6000)(rnd.nextInt(256).toByte)),
      ("byte-cycle", Array.tabulate[Byte](50000)(i => (i % 251).toByte)),
      ("text", textLike),
      ("text-x4", (textLike ++ textLike ++ textLike ++ textLike)),
      ("sparse-alpha", Array.tabulate[Byte](30000)(i => ('a' + (i * i) % 7).toByte)))
  }

  test("decodes genuine zstd-jni frames byte-exactly across levels and shapes") {
    for ((name, raw) <- shapes; level <- Seq(1, 3, 9, 19)) {
      val z = jniCompress(raw, level)
      val got = Zstd.decompress(z)
        .getOrElse(fail(s"decode None: $name level $level (${z.length} bytes)"))
      assert(java.util.Arrays.equals(got, raw),
        s"decode drift: $name level $level")
    }
  }

  test("verifies the XXH64 content checksum when the frame carries one") {
    for ((name, raw) <- shapes.take(8)) {
      val z = jniCompressChecksum(raw, 3)
      val got = Zstd.decompress(z).getOrElse(fail(s"checksum frame None: $name"))
      assert(java.util.Arrays.equals(got, raw), s"drift: $name")
      // flip one checksum byte: only the checksum layer can catch it
      val bad = z.clone()
      bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x1).toByte
      assert(Zstd.decompress(bad).isEmpty, s"corrupt checksum accepted: $name")
    }
  }

  test("xxh64 matches zstd-jni's checksum arithmetic on both branches") {
    // indirect but real: a frame's stored checksum is the reference
    // XXH64's low 32 bits — our decoder verifying it end-to-end above
    // proves the hash; this pins the <32-byte and >=32-byte branches
    // explicitly through accepted frames of both sizes
    for (n <- Seq(0, 1, 31, 32, 33, 1000)) {
      val raw = Array.tabulate[Byte](n)(i => (i * 37 + 11).toByte)
      val z = jniCompressChecksum(raw, 1)
      assert(Zstd.decompress(z).exists(java.util.Arrays.equals(_, raw)),
        s"xxh64 branch n=$n")
    }
  }

  test("structural corruptions return None, never throw") {
    val z = jniCompress(textLike, 3)
    assert(Zstd.decompress(z).isDefined)
    // magic
    val m = z.clone(); m(0) = 0x29.toByte
    assert(Zstd.decompress(m).isEmpty)
    // reserved frame-header bit
    val r = z.clone(); r(4) = (r(4) | 0x08).toByte
    assert(Zstd.decompress(r).isEmpty)
    // truncations at every structural layer
    for (cut <- Seq(1, 4, 5, 9, z.length / 2, z.length - 1))
      assert(Zstd.decompress(z.take(cut)).isEmpty, s"truncation at $cut")
    // trailing garbage (a frame must tile the payload)
    assert(Zstd.decompress(z :+ 0x00.toByte).isEmpty)
    // corrupt a mid-payload byte: entropy tables / streams / sizes
    // must catch it (a handful of positions, deterministic)
    var caught = 0
    for (i <- 10 until math.min(z.length - 1, 200) by 7) {
      val c = z.clone(); c(i) = (c(i) ^ 0x55).toByte
      Zstd.decompress(c) match {
        case None => caught += 1
        case Some(out) =>
          // an accepted mutation must still be a VALID frame whose
          // content simply differs (no integrity layer in-frame);
          // it must not equal the original decode by construction
          assert(out.length <= (1 << 26))
      }
    }
    assert(caught > 0, "no mid-payload corruption was caught at all")
    // empty / junk
    assert(Zstd.decompress(Array.emptyByteArray).isEmpty)
    assert(Zstd.decompress(Array.fill[Byte](64)(0x55)).isEmpty)
  }

  test("multi-block frames and cross-block state (tree/table reuse, rep offsets) decode") {
    // > 128 KiB forces multiple blocks; repetitive structure makes
    // level-19 reuse trees/tables and repeat offsets across blocks
    val big = {
      val unit = textLike
      val out = new java.io.ByteArrayOutputStream()
      while (out.size < 600 * 1024) out.write(unit)
      out.toByteArray
    }
    for (level <- Seq(1, 3, 19)) {
      val z = jniCompress(big, level)
      val got = Zstd.decompress(z, maxOut = 1 << 21)
        .getOrElse(fail(s"multi-block None at level $level"))
      assert(java.util.Arrays.equals(got, big), s"multi-block drift level $level")
    }
  }

  test("maxOut bounds allocation") {
    val z = jniCompress(Array.fill[Byte](100000)(9), 3)
    assert(Zstd.decompress(z, maxOut = 1024).isEmpty)
  }

  /** Minimal scan of a frame's FIRST block to its sequence count —
    * test-side instrumentation so the ≥32768-sequences fixture below
    * can't silently stop exercising the 3-byte nbSeq header form. */
  private def firstBlockNbSeq(z: Array[Byte]): Int = {
    @inline def u8(i: Int): Int = z(i) & 0xff
    assert(u8(0) == 0x28 && u8(1) == 0xb5 && u8(2) == 0x2f && u8(3) == 0xfd)
    val fhd = u8(4)
    val fcsFlag = fhd >> 6
    val singleSeg = (fhd & 0x20) != 0
    var pos = 5
    if (!singleSeg) pos += 1 // window descriptor
    pos += (fcsFlag match {
      case 0 => if (singleSeg) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    })
    val bh = u8(pos) | (u8(pos + 1) << 8) | (u8(pos + 2) << 16)
    pos += 3
    assert(((bh >> 1) & 3) == 2, "first block is not compressed")
    // literals-section header (§3.1.1.3.1): type, size format, sizes
    val b0 = u8(pos)
    val litType = b0 & 3
    val sizeFormat = (b0 >> 2) & 3
    if (litType <= 1) { // raw / RLE
      val (regen, hb) = sizeFormat match {
        case 0 | 2 => (b0 >> 3, 1)
        case 1 => ((b0 >> 4) | (u8(pos + 1) << 4), 2)
        case _ => ((b0 >> 4) | (u8(pos + 1) << 4) | (u8(pos + 2) << 12), 3)
      }
      pos += hb + (if (litType == 0) regen else 1)
    } else { // compressed / treeless: skip compSize (tree included)
      val (comp, hb) = sizeFormat match {
        case 0 | 1 =>
          (((b0 | (u8(pos + 1) << 8) | (u8(pos + 2) << 16)) >> 14) & 0x3ff, 3)
        case 2 =>
          ((((b0.toLong | (u8(pos + 1).toLong << 8) | (u8(pos + 2).toLong << 16) |
            (u8(pos + 3).toLong << 24)) >> 18) & 0x3fff).toInt, 4)
        case _ =>
          ((((b0.toLong | (u8(pos + 1).toLong << 8) | (u8(pos + 2).toLong << 16) |
            (u8(pos + 3).toLong << 24) | (u8(pos + 4).toLong << 32)) >> 22)
            & 0x3ffff).toInt, 5)
      }
      pos += hb + comp
    }
    val sb0 = u8(pos)
    if (sb0 < 128) sb0
    else if (sb0 < 255) ((sb0 - 128) << 8) | u8(pos + 1)
    else (u8(pos + 1) | (u8(pos + 2) << 8)) + 0x7f00
  }

  test("nbSeq >= 32768 in one block decodes (3-byte sequence-count header is ADD, not OR)") {
    // unique-adjacency 3-byte tokens over SMALL pools: within a
    // segment, pass s emits pool[(a*s)%31] — every token value recurs
    // one pass (~93 bytes) back (a cheap 3-byte match) but no
    // adjacent-token PAIR ever repeats (matches cannot extend, so no
    // two sequences merge); a fresh random pool per segment prevents
    // cross-segment structure. At level 19 the optimal parser emits
    // one sequence per token: ~42k in the first 128 KiB block.
    // RFC 8878: for byte0 == 255, nbSeq = byte1 + (byte2<<8) + 0x7f00;
    // an OR there decodes any block with nbSeq >= 32768 wrongly.
    val rnd = new scala.util.Random(0xCAFE + 31)
    val bb = new java.io.ByteArrayOutputStream()
    while (bb.size < 131000) {
      val pool = Array.fill(31)(Array[Byte](rnd.nextInt(256).toByte,
        rnd.nextInt(256).toByte, rnd.nextInt(256).toByte))
      var s = 1
      while (s < 31 && bb.size < 131000) {
        (0 until 31).foreach(a => bb.write(pool((a * s) % 31)))
        s += 1
      }
    }
    val raw = bb.toByteArray
    val z = jniCompress(raw, 19)
    val n = firstBlockNbSeq(z)
    assert(n >= 32768, s"fixture regressed: first block has only $n sequences")
    val got = Zstd.decompress(z).getOrElse(fail(s"nbSeq=$n frame returned None"))
    assert(java.util.Arrays.equals(got, raw), "nbSeq>=32768 decode drift")
  }

  test("frame series: concatenated zstd-jni frames decode with boundaries kept") {
    val parts = Seq(
      "first frame".getBytes("UTF-8"),
      textLike,
      Array.emptyByteArray,
      Array.fill[Byte](5000)(3),
      "last".getBytes("UTF-8"))
    val series = parts.zipWithIndex.map { case (part, i) =>
      if (i % 2 == 0) jniCompress(part, 1 + i * 4) else jniCompressChecksum(part, 3)
    }.reduce(_ ++ _)
    val (frames, nSkip) = Zstd.frameList(series).getOrElse(fail("series None"))
    assert(nSkip == 0)
    assert(frames.length == parts.length)
    frames.zip(parts).zipWithIndex.foreach { case ((got, want), i) =>
      assert(java.util.Arrays.equals(got, want), s"frame $i drift")
    }
    val whole = Zstd.decompressSeries(series).getOrElse(fail("concat None"))
    assert(java.util.Arrays.equals(whole, parts.reduce(_ ++ _)))
    // a single frame is a one-element series equal to decompress()
    val one = jniCompress(textLike, 3)
    assert(Zstd.decompressSeries(one).exists(java.util.Arrays.equals(_, textLike)))
  }

  private def skippable(magicLow: Int, content: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit =
      (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    le32(0x184d2a50L | (magicLow & 0xf))
    le32(content.length.toLong)
    out.write(content, 0, content.length)
    out.toByteArray
  }

  test("frame series: skippable frames (RFC 8878 §3.1.2) are walked, counted, not decoded") {
    val a = "payload a".getBytes("UTF-8")
    val b = "payload b".getBytes("UTF-8")
    val series = skippable(0, "seek table".getBytes("UTF-8")) ++
      jniCompress(a, 3) ++
      skippable(0xe, Array.emptyByteArray) ++ // empty content is legal
      jniCompress(b, 19) ++
      skippable(5, Array.fill[Byte](33)(0x7f))
    val (frames, nSkip) = Zstd.frameList(series).getOrElse(fail("skippable series None"))
    assert(nSkip == 3)
    assert(frames.length == 2)
    assert(java.util.Arrays.equals(frames(0), a))
    assert(java.util.Arrays.equals(frames(1), b))
    assert(Zstd.decompressSeries(series).exists(java.util.Arrays.equals(_, a ++ b)))
    // skippable-only payload: zero data frames, empty concatenation
    val only = skippable(1, "x".getBytes("UTF-8"))
    assert(Zstd.frameList(only).contains((Vector.empty[Array[Byte]], 1)))
  }

  test("frame series malformations return None, never throw") {
    val ok = jniCompress(textLike, 3)
    // truncated second frame
    assert(Zstd.frameList(ok ++ ok.dropRight(3)).isEmpty)
    // skippable length overruns the payload
    val sk = skippable(0, Array.fill[Byte](10)(1))
    assert(Zstd.frameList(ok ++ sk.dropRight(4)).isEmpty)
    // garbage magic between frames
    assert(Zstd.frameList(ok ++ Array.fill[Byte](8)(0x11)).isEmpty)
    // empty payload
    assert(Zstd.frameList(Array.emptyByteArray).isEmpty)
    // maxOut bounds the TOTAL across the series
    val run = jniCompress(Array.fill[Byte](40000)(9), 3)
    assert(Zstd.decompressSeries(run ++ run, maxOut = 60000).isEmpty)
    assert(Zstd.decompressSeries(run ++ run, maxOut = 80000).isDefined)
  }

  test("Repeat_Mode after an RLE table uses the RLE-built one-symbol table (set_rle semantics)") {
    // Hand-crafted two-block frame (no real encoder emits this shape):
    // block 1 loads RLE tables (LL=4, OF=2, ML=3), block 2 selects
    // Repeat_Mode for all three — per the reference decoder the RLE
    // tables ARE the repeat target. Single-segment header, fcs = 22.
    def block(last: Int, literals: String, scm: Int, syms: Array[Int],
              stream: Int): Array[Byte] = {
      val body = Array[Byte]((literals.length << 3).toByte) ++
        literals.getBytes("UTF-8") ++ Array[Byte](1, scm.toByte) ++
        syms.map(_.toByte) ++ Array[Byte](stream.toByte)
      Array[Byte]((((body.length << 3) | 4 | last) & 0xff).toByte,
        ((body.length << 3) >> 8).toByte, 0) ++ body
    }
    val frame = Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte, 0x20, 22) ++
      // RLE modes: 4 literals "abcd", then ml=6 at offset 2 ("cdcdcd"),
      // trailing "ef"; backward stream = sentinel + of-extra bits 01
      block(0, "abcdef", 0x54, Array(4, 2, 3), 0x05) ++
      // Repeat modes: same codes replay -> "WXYZ" + 6 x 'Z' at offset 1;
      // of-extra bits 00
      block(1, "WXYZ", 0xfc, Array.empty[Int], 0x04)
    val got = Zstd.decompress(frame)
      .getOrElse(fail("repeat-after-RLE frame returned None"))
    assert(new String(got, "UTF-8") == "abcdcdcdcdefWXYZZZZZZZ")
  }
}
