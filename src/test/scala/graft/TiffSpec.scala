package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Tiff

/** Baseline TIFF: round-trips across both byte orders × all three
  * compressions × predictor, PackBits/LZW codec vectors, ImageIO
  * cross-validation BOTH directions, and a malformation sweep. No
  * Spark. */
class TiffSpec extends AnyFunSuite {

  private def px(seed: Int)(x: Int, y: Int): (Int, Int, Int) =
    ((11 * x + 5 * y + seed) % 256, (7 * x + 3 * y + 2 * seed) % 256,
      (5 * x + 13 * y + 3 * seed) % 256)

  test("encoder → our parser: orders × compressions × predictor × gray/rgb") {
    for (be <- Seq(false, true); comp <- Seq(1, 5, 32773);
         pred <- (if (comp == 5) Seq(1, 2) else Seq(1));
         gray <- Seq(false, true)) {
      val w = 21; val h = 13
      val f = px(if (be) 3 else 0) _
      val z = Tiff.encodeTiff(w, h, gray, f, bigEndian = be,
        compression = comp, predictor = pred, rowsPerStrip = 5)
      val pr = Tiff.parseTiff(z).getOrElse(
        fail(s"parse None be=$be comp=$comp pred=$pred gray=$gray"))
      assert(pr.bigEndian == be && pr.compression == comp &&
        pr.predictor == pred && pr.gray == gray && pr.nStrips == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = f(x, y)
        val want = if (gray) (r, r, r) else (r, g, b)
        assert(pr.raster.rgb(x, y) == want,
          s"drift be=$be comp=$comp pred=$pred gray=$gray ($x,$y)")
      }
    }
  }

  test("LZW crosses code-width boundaries; PackBits runs/literals/noop") {
    // enough distinct pairs to push the dictionary past 511 and 1023
    val big = Array.tabulate(9000)(i => ((i * 31 + i / 7) % 256).toByte)
    val z = Tiff.lzwEncode(big)
    val back = Tiff.lzwDecode(z, 0, z.length, big.length)
      .getOrElse(fail("lzw None"))
    assert(back.sameElements(big))
    // and a highly repetitive body (long matches, KwKwK cases)
    val rep = Array.tabulate(5000)(i => ((i / 97) % 5).toByte)
    val z2 = Tiff.lzwEncode(rep)
    assert(Tiff.lzwDecode(z2, 0, z2.length, rep.length).get.sameElements(rep))
    // wrong expected length must fail, not truncate
    assert(Tiff.lzwDecode(z2, 0, z2.length, rep.length - 1).isEmpty)
    // PackBits vectors: literal, run, noop byte
    val pb = Array[Byte](2, 'a', 'b', 'c', -2, 'x', -128, 0, 'q')
    assert(Tiff.unpackBits(pb, 0, pb.length, 7).get
      .sameElements("abcxxxq".getBytes("US-ASCII")))
    assert(Tiff.unpackBits(pb, 0, pb.length, 8).isEmpty)
    val enc = Tiff.packBits("aaaabcdddddde".getBytes("US-ASCII"))
    assert(Tiff.unpackBits(enc, 0, enc.length, 13).get
      .sameElements("aaaabcdddddde".getBytes("US-ASCII")))
  }

  test("our encoder's bytes read pixel-identically by ImageIO") {
    for (be <- Seq(false, true); comp <- Seq(1, 5, 32773);
         pred <- (if (comp == 5) Seq(1, 2) else Seq(1))) {
      val w = 19; val h = 11
      val f = px(comp) _
      val z = Tiff.encodeTiff(w, h, gray = false, f, bigEndian = be,
        compression = comp, predictor = pred, rowsPerStrip = 4)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(z))
      assert(ref != null, s"ImageIO rejected be=$be comp=$comp pred=$pred")
      assert(ref.getWidth == w && ref.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = f(x, y)
        val got = ref.getRGB(x, y)
        assert(((got >> 16) & 0xff, (got >> 8) & 0xff, got & 0xff) == ((r, g, b)),
          s"ImageIO drift be=$be comp=$comp pred=$pred ($x,$y)")
      }
    }
  }

  test("ImageIO-written TIFFs (none/LZW/PackBits) decode pixel-identically by ours") {
    for (comp <- Seq(None, Some("LZW"), Some("PackBits"))) {
      val w = 37; val h = 23
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(7)(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      comp.foreach { c =>
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(c)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val pr = Tiff.parseTiff(bos.toByteArray)
        .getOrElse(fail(s"our parser rejected ImageIO TIFF comp=$comp"))
      assert(pr.raster.width == w && pr.raster.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val want = img.getRGB(x, y) & 0xffffff
        val (r, g, b) = pr.raster.rgb(x, y)
        assert(((r << 16) | (g << 8) | b) == want,
          s"decode drift comp=$comp ($x,$y)")
      }
    }
  }

  test("malformations return None, never throw") {
    val good = Tiff.encodeTiff(16, 9, gray = false, px(1), compression = 5,
      predictor = 2, rowsPerStrip = 4)
    assert(Tiff.parseTiff(good).isDefined)
    // bad magic / bad 42 / truncations
    val m = good.clone(); m(0) = 'X'.toByte
    assert(Tiff.parseTiff(m).isEmpty)
    val fortytwo = good.clone(); fortytwo(2) = 7
    assert(Tiff.parseTiff(fortytwo).isEmpty)
    for (cut <- Seq(0, 4, 7, good.length / 2))
      assert(Tiff.parseTiff(good.take(cut)).isEmpty, s"cut $cut")
    // a corrupted strip body must fail decode (LZW integrity)
    val cs = Tiff.encodeTiff(16, 9, gray = false, px(1), compression = 5,
      rowsPerStrip = 4, corruptStrip = 1)
    assert(Tiff.parseTiff(cs).isEmpty)
    // uncompressed strip with a size lie
    val u = Tiff.encodeTiff(8, 4, gray = true, px(2), compression = 1,
      rowsPerStrip = 4)
    // StripByteCounts is the last LONG entry value before 284/317; easier:
    // shrink the file so the single strip overruns
    assert(Tiff.parseTiff(u.take(u.length - 1)).isEmpty)
  }
}
