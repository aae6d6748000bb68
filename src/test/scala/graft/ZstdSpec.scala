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
}
