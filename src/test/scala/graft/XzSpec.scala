package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Xz

/** xz/LZMA2 decode: cross-validated against TWO independent real
  * implementations — org.tukaani.xz (in-JVM writer: presets 0–9, all
  * check types, multi-block, tiny-dictionary cross-chunk matches)
  * and the system xz(1) binary — plus a malformation per container
  * layer and a full byte-flip sweep. No Spark. */
class XzSpec extends AnyFunSuite {

  private def xzBytes(raw: Array[Byte], preset: Int,
                      check: Int = org.tukaani.xz.XZ.CHECK_CRC64,
                      dictSize: Int = 0,
                      blocks: Seq[Int] = Nil): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val opts = new org.tukaani.xz.LZMA2Options(preset)
    if (dictSize > 0) opts.setDictSize(dictSize)
    val z = new org.tukaani.xz.XZOutputStream(bos, opts, check)
    if (blocks.isEmpty) z.write(raw)
    else {
      var off = 0
      blocks.foreach { n =>
        z.write(raw, off, n)
        off += n
        z.endBlock()
      }
      z.write(raw, off, raw.length - off)
    }
    z.finish()
    bos.toByteArray
  }

  private def payloads: Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(2026)
    Seq(
      Array.emptyByteArray,
      "hello xz world".getBytes("UTF-8"),
      ("the quick brown fox jumps over the lazy dog " * 500).getBytes("UTF-8"),
      Array.tabulate(9000)(i => ((i * 31 + i / 13) % 256).toByte),
      { val a = new Array[Byte](3000); rnd.nextBytes(a); a })
  }

  test("tukaani streams decode byte-exactly, presets 0/3/6/9") {
    for (p <- payloads; preset <- Seq(0, 3, 6, 9)) {
      val z = xzBytes(p, preset)
      val back = Xz.decompress(z)
        .getOrElse(fail(s"None preset=$preset len=${p.length}"))
      assert(back.sameElements(p), s"drift preset=$preset len=${p.length}")
    }
  }

  test("all check types verify: CRC32, CRC64, SHA-256, none") {
    val raw = ("check coverage " * 200).getBytes("UTF-8")
    for (check <- Seq(org.tukaani.xz.XZ.CHECK_NONE, org.tukaani.xz.XZ.CHECK_CRC32,
      org.tukaani.xz.XZ.CHECK_CRC64, org.tukaani.xz.XZ.CHECK_SHA256)) {
      val z = xzBytes(raw, 4, check)
      assert(Xz.decompress(z).get.sameElements(raw), s"check=$check")
    }
  }

  test("multi-block stream: index records verified per block") {
    val raw = Array.tabulate(50000)(i => ((i * 7) % 251).toByte)
    val z = xzBytes(raw, 2, blocks = Seq(10000, 25000))
    val back = Xz.decompress(z).getOrElse(fail("multi-block None"))
    assert(back.sameElements(raw))
  }

  test("tiny dictionary + large inputs: multiple LZMA2 chunks, cross-chunk matches, uncompressed chunks") {
    // highly repetitive, 300 KiB, 4 KiB dict: matches cross chunk
    // boundaries and distances press against the dict horizon
    val rep = ("abcdefgh" * 40000).getBytes("UTF-8") // 320 KB
    val z1 = xzBytes(rep, 6, dictSize = 4096)
    assert(Xz.decompress(z1, maxOut = 1 << 22).get.sameElements(rep))
    // incompressible 300 KiB: the encoder falls back to uncompressed
    // chunks and the packed stream spans many 64 KiB chunk frames
    val rnd = new scala.util.Random(11)
    val big = new Array[Byte](300000); rnd.nextBytes(big)
    val z2 = xzBytes(big, 1)
    assert(Xz.decompress(z2, maxOut = 1 << 22).get.sameElements(big))
  }

  test("xz(1)-written stream decodes byte-exactly") {
    assume(new java.io.File("/usr/bin/xz").exists)
    val raw = ("independent binary check " * 400).getBytes("UTF-8")
    val tmp = java.nio.file.Files.createTempFile("graft-xz", ".txt")
    java.nio.file.Files.write(tmp, raw)
    val pb = new ProcessBuilder("/usr/bin/xz", "-kf", "-6", tmp.toString)
    assert(pb.start().waitFor() == 0)
    val z = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(tmp.toString + ".xz"))
    val back = Xz.decompress(z).getOrElse(fail("xz(1) stream None"))
    assert(back.sameElements(raw))
    java.nio.file.Files.delete(tmp)
    java.nio.file.Files.delete(java.nio.file.Paths.get(tmp.toString + ".xz"))
  }

  test("malformations return None, never throw") {
    val raw = "a stream to break in interesting ways".getBytes("UTF-8")
    val good = xzBytes(raw, 3)
    assert(Xz.decompress(good).isDefined)
    // magic / flags / truncations / trailing garbage / concatenation
    val m = good.clone(); m(0) = 0x11.toByte
    assert(Xz.decompress(m).isEmpty)
    val fl = good.clone(); fl(7) = 0x02.toByte // reserved check id
    assert(Xz.decompress(fl).isEmpty)
    for (cut <- Seq(0, 11, 20, good.length / 2, good.length - 1))
      assert(Xz.decompress(good.take(cut)).isEmpty, s"cut $cut")
    assert(Xz.decompress(good :+ 0x00.toByte).isEmpty)
    assert(Xz.decompress(good ++ good).isEmpty)
    // full byte-flip sweep: every flip caught by structure or a
    // check, never decoded silently to the wrong bytes, never thrown
    var silent = 0
    for (i <- good.indices) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      Xz.decompress(bad) match {
        case Some(b) if !b.sameElements(raw) => silent += 1
        case _ => ()
      }
    }
    assert(silent == 0, s"$silent silent corruptions")
  }
}
