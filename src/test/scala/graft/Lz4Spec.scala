package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lz4

/** LZ4 frame decode: xxHash32 vectors, cross-validation against
  * lz4-java (in-JVM writer) and the system lz4(1) binary — including
  * LINKED blocks whose matches cross block boundaries — plus a
  * malformation per layer and a byte-flip sweep. No Spark. */
class Lz4Spec extends AnyFunSuite {

  private def viaJava(raw: Array[Byte],
                      bs: net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE,
                      bits: Seq[net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits],
                      knownSize: Long = -1L): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new net.jpountz.lz4.LZ4FrameOutputStream(bos, bs, knownSize, bits: _*)
    z.write(raw); z.close()
    bos.toByteArray
  }

  private def payloads: Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(42)
    Seq(
      Array.emptyByteArray,
      "hello lz4 world".getBytes("UTF-8"),
      ("the quick brown fox " * 600).getBytes("UTF-8"),
      Array.tabulate(9000)(i => ((i * 31 + i / 13) % 256).toByte),
      { val a = new Array[Byte](3000); rnd.nextBytes(a); a })
  }

  test("xxHash32 matches the published vectors") {
    // reference vectors from the xxHash specification (seed 0)
    assert(Lz4.xxh32(Array.emptyByteArray, 0, 0) == 0x02CC5D05)
    val abc = "abc".getBytes("US-ASCII")
    assert(Lz4.xxh32(abc, 0, 3) == 0x32D153FF)
    val long = "Nobody inspects the spammish repetition".getBytes("US-ASCII")
    assert(Lz4.xxh32(long, 0, long.length) == 0xE2293B2F)
  }

  test("lz4-java frames decode byte-exactly: block sizes × flags × known size") {
    import net.jpountz.lz4.LZ4FrameOutputStream.{BLOCKSIZE, FLG}
    for (p <- payloads;
         bs <- Seq(BLOCKSIZE.SIZE_64KB, BLOCKSIZE.SIZE_4MB);
         flags <- Seq(
           Seq(FLG.Bits.BLOCK_INDEPENDENCE),
           Seq(FLG.Bits.BLOCK_INDEPENDENCE, FLG.Bits.CONTENT_CHECKSUM))) {
      val z = viaJava(p, bs, flags)
      val back = Lz4.decompress(z)
        .getOrElse(fail(s"None len=${p.length} bs=$bs flags=$flags"))
      assert(back.sameElements(p), s"drift len=${p.length} bs=$bs")
    }
    // declared content size is verified
    val raw = payloads(3)
    val z = viaJava(raw, BLOCKSIZE.SIZE_64KB,
      Seq(net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits.BLOCK_INDEPENDENCE),
      knownSize = raw.length.toLong)
    assert(Lz4.decompress(z).get.sameElements(raw))
  }

  test("lz4(1) linked-mode frame (matches across 64K block boundaries) decodes byte-exactly") {
    assume(new java.io.File("/usr/local/bin/lz4").exists ||
      new java.io.File("/root/miniconda/bin/lz4").exists)
    val bin = if (new java.io.File("/usr/local/bin/lz4").exists)
      "/usr/local/bin/lz4" else "/root/miniconda/bin/lz4"
    // repetitive 300 KB: with -B4 (64K blocks) + -BD (linked), matches
    // reach across block boundaries into the previous block's window
    val raw = ("abcdefgh12345678 " * 18000).getBytes("UTF-8")
    val tmp = java.nio.file.Files.createTempFile("graft-lz4", ".txt")
    java.nio.file.Files.write(tmp, raw)
    val outP = java.nio.file.Paths.get(tmp.toString + ".lz4")
    val pb = new ProcessBuilder(bin, "-f", "-9", "-B4", "-BD",
      tmp.toString, outP.toString)
    assert(pb.start().waitFor() == 0)
    val z = java.nio.file.Files.readAllBytes(outP)
    val back = Lz4.decompress(z, maxOut = 1 << 22)
      .getOrElse(fail("lz4(1) linked frame None"))
    assert(back.sameElements(raw))
    java.nio.file.Files.delete(tmp)
    java.nio.file.Files.delete(outP)
  }

  test("malformations return None, never throw") {
    import net.jpountz.lz4.LZ4FrameOutputStream.{BLOCKSIZE, FLG}
    val raw = "a stream to break in interesting ways".getBytes("UTF-8")
    val good = viaJava(raw, BLOCKSIZE.SIZE_64KB,
      Seq(FLG.Bits.BLOCK_INDEPENDENCE, FLG.Bits.CONTENT_CHECKSUM))
    assert(Lz4.decompress(good).isDefined)
    val m = good.clone(); m(0) = 0x11.toByte
    assert(Lz4.decompress(m).isEmpty) // magic
    for (cut <- Seq(0, 5, 8, good.length / 2, good.length - 1))
      assert(Lz4.decompress(good.take(cut)).isEmpty, s"cut $cut")
    assert(Lz4.decompress(good :+ 0x00.toByte).isEmpty) // trailing
    assert(Lz4.decompress(good ++ good).isEmpty) // concatenation
    // byte-flip sweep: with a content checksum every flip is caught
    var silent = 0
    for (i <- good.indices) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      Lz4.decompress(bad) match {
        case Some(b) if !b.sameElements(raw) => silent += 1
        case _ => ()
      }
    }
    assert(silent == 0, s"$silent silent corruptions")
  }
}
