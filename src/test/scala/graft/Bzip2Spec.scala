package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bzip2

/** bzip2 decode: cross-validated against TWO independent real
  * implementations — commons-compress (in-JVM writer) and the system
  * bzip2(1) binary — including a multi-block stream whose block
  * magics land mid-byte, plus a malformation per layer. No Spark. */
class Bzip2Spec extends AnyFunSuite {

  private def bz(raw: Array[Byte], level: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bos, level)
    z.write(raw); z.close()
    bos.toByteArray
  }

  private def payloads: Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(1117)
    Seq(
      Array.emptyByteArray,
      "hello bzip2 world".getBytes("UTF-8"),
      // RLE1 territory: runs of exactly 4, 5, 259, 260 equal bytes
      Array.fill(4)('a'.toByte) ++ Array.fill(5)('b'.toByte) ++
        Array.fill(259)('c'.toByte) ++ Array.fill(260)('d'.toByte),
      Array.tabulate(5000)(i => ((i * 31 + i / 13) % 256).toByte),
      { val a = new Array[Byte](3000); rnd.nextBytes(a); a },
      ("the quick brown fox " * 400).getBytes("UTF-8"))
  }

  test("commons-compress streams decode byte-exactly, levels 1..9") {
    for (p <- payloads; level <- Seq(1, 5, 9)) {
      val z = bz(p, level)
      val back = Bzip2.decompress(z)
        .getOrElse(fail(s"None at level $level len ${p.length}"))
      assert(back.sameElements(p), s"drift level=$level len=${p.length}")
    }
  }

  test("multi-block stream (level 1, >100k input): block magics land mid-byte") {
    val big = Array.tabulate(250000)(i =>
      (((i * 37) ^ (i / 251) * 17) % 256).toByte)
    val z = bz(big, 1) // 3 blocks of 100k
    val back = Bzip2.decompress(z).getOrElse(fail("multi-block None"))
    assert(back.sameElements(big))
  }

  test("bzip2(1)-written stream decodes byte-exactly") {
    assume(new java.io.File("/usr/bin/bzip2").exists)
    val raw = ("independent binary check " * 300).getBytes("UTF-8")
    val tmp = java.nio.file.Files.createTempFile("graft-bz", ".txt")
    java.nio.file.Files.write(tmp, raw)
    val pb = new ProcessBuilder("/usr/bin/bzip2", "-kf", "-3", tmp.toString)
    assert(pb.start().waitFor() == 0)
    val z = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(tmp.toString + ".bz2"))
    val back = Bzip2.decompress(z).getOrElse(fail("bzip2(1) stream None"))
    assert(back.sameElements(raw))
    java.nio.file.Files.delete(tmp)
    java.nio.file.Files.delete(java.nio.file.Paths.get(tmp.toString + ".bz2"))
  }

  test("malformations return None, never throw") {
    val good = bz("a stream to break in interesting ways".getBytes("UTF-8"), 1)
    assert(Bzip2.decompress(good).isDefined)
    // header corruptions
    val h = good.clone(); h(0) = 'X'.toByte
    assert(Bzip2.decompress(h).isEmpty)
    val lvl = good.clone(); lvl(3) = '0'.toByte
    assert(Bzip2.decompress(lvl).isEmpty)
    // truncations at every depth
    for (cut <- Seq(0, 3, 9, good.length / 2, good.length - 1))
      assert(Bzip2.decompress(good.take(cut)).isEmpty, s"cut $cut")
    // trailing garbage and stream concatenation are both rejected
    assert(Bzip2.decompress(good :+ 0x41.toByte).isEmpty)
    assert(Bzip2.decompress(good ++ good).isEmpty)
    // body corruption sweep: every flip must be caught (structure or
    // CRC), never decoded silently to the wrong bytes, never thrown
    val raw = "a stream to break in interesting ways".getBytes("UTF-8")
    var silent = 0
    for (i <- 4 until good.length) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      Bzip2.decompress(bad) match {
        case Some(b) if !b.sameElements(raw) => silent += 1
        case _ => ()
      }
    }
    assert(silent == 0, s"$silent silent corruptions")
  }
}
