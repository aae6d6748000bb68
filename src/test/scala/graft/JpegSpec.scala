package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Jpeg

/** Baseline JPEG codec: coefficient-level round-trips (JPEG carries
  * no integrity layer, so the lossless layer IS the contract),
  * structural rejection of out-of-profile streams, and proof that the
  * generated corpus exercises byte stuffing. No Spark involved. */
class JpegSpec extends AnyFunSuite {

  private val qOnes = Array.fill(8, 8)(1)
  private def qZig: Array[Array[Int]] = {
    val q = Array.ofDim[Int](8, 8)
    Jpeg.zigzag.zipWithIndex.foreach { case ((r, c), k) => q(r)(c) = 1 + (k % 4) }
    q
  }

  private def idctOf(blk: Array[Array[Int]], q: Array[Array[Int]]): Array[Array[Int]] =
    Jpeg.idctBlock(Array.tabulate(8, 8)((v, u) => blk(v)(u).toLong * q(v)(u)))

  test("encode/decode round-trips arbitrary coefficient blocks (ZRL, long runs, big categories)") {
    val rnd = new scala.util.Random(1207)
    for (trial <- 0 until 20) {
      val bw = 1 + rnd.nextInt(3); val bh = 1 + rnd.nextInt(2)
      val q = if (trial % 2 == 0) qOnes else qZig
      val blocks = Array.tabulate(bw * bh) { _ =>
        Array.tabulate(8, 8) { (v, u) =>
          val roll = rnd.nextInt(10)
          if (roll < 6) 0 // sparse: exercises runs, ZRL, EOB
          else if (roll < 9) rnd.nextInt(15) - 7
          else rnd.nextInt(511) - 255 // category up to 8
        }
      }
      val bytes = Jpeg.encodeJpeg(bw * 8, bh * 8, gap = trial % 5, q, blocks)
      val img = Jpeg.parseJpeg(bytes).getOrElse(fail(s"parse None, trial $trial"))
      assert(img.width == bw * 8 && img.height == bh * 8)
      for (bi <- 0 until bw * bh) {
        val expected = idctOf(blocks(bi), q)
        val by = bi / bw; val bx = bi % bw
        for (y <- 0 until 8; x <- 0 until 8) {
          val got = img.rgb(bx * 8 + x, by * 8 + y)._1
          assert(got == expected(y)(x),
            s"pixel drift trial=$trial block=$bi ($x,$y): $got != ${expected(y)(x)}")
        }
      }
    }
  }

  test("DC-only block decodes flat; extremes clamp to [0, 255]") {
    def dcBlock(dc: Int) = {
      val b = Array.fill(8, 8)(0); b(0)(0) = dc; b
    }
    // baseline 8-bit DC differential range is ±2047 (category ≤ 11)
    for (dc <- Seq(-2047, -16, 0, 16, 2047)) {
      val img = Jpeg.parseJpeg(
        Jpeg.encodeJpeg(8, 8, 0, qOnes, Array(dcBlock(dc)))).get
      val vals = for (y <- 0 until 8; x <- 0 until 8) yield img.rgb(x, y)._1
      assert(vals.distinct.size == 1, s"DC-only must be flat, dc=$dc")
      assert(vals.head >= 0 && vals.head <= 255)
      if (dc == -2047) assert(vals.head == 0, "deep negative must clamp to 0")
      if (dc == 2047) assert(vals.head == 255, "deep positive must clamp to 255")
    }
  }

  test("0xFF byte stuffing is produced, unstuffed, and decodes exactly") {
    // brute-force a DC-only stream whose entropy scan contains a
    // stuffed FF 00 pair (long 1-runs from high-category amplitudes
    // align into a full 0xFF byte for some values), then verify the
    // decoder unstuffs it to the exact pixels
    def scanOf(bytes: Array[Byte]): Array[Byte] = {
      val sos = (0 until bytes.length - 1).find(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xda).get
      bytes.slice(sos + 10, bytes.length - 2) // SOS segment: 2+2+6 bytes
    }
    def hasStuffing(bytes: Array[Byte]): Boolean =
      scanOf(bytes).sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0x00)
    val hit = (-2047 to 2047).find { dc =>
      val b = Array.fill(8, 8)(0); b(0)(0) = dc
      hasStuffing(Jpeg.encodeJpeg(8, 8, 0, qOnes, Array(b)))
    }
    assert(hit.isDefined, "no DC value produces a stuffed byte — encoder wrong?")
    val blk = { val b = Array.fill(8, 8)(0); b(0)(0) = hit.get; b }
    val img = Jpeg.parseJpeg(Jpeg.encodeJpeg(8, 8, 0, qOnes, Array(blk)))
      .getOrElse(fail("stuffed stream must decode"))
    val expected = idctOf(blk, qOnes)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(img.rgb(x, y)._1 == expected(y)(x), s"unstuffed pixel drift ($x,$y)")
  }

  test("color 4:4:4 round-trips: interleaved MCUs, per-component DC predictors, YCbCr->RGB") {
    val rnd = new scala.util.Random(444)
    def qcZig(shift: Int): Array[Array[Int]] = {
      val q = Array.ofDim[Int](8, 8)
      Jpeg.zigzag.zipWithIndex.foreach { case ((r, c), k) =>
        q(r)(c) = 1 + ((k + shift) % 3)
      }
      q
    }
    for (trial <- 0 until 10) {
      val bw = 1 + rnd.nextInt(2); val bh = 1 + rnd.nextInt(3)
      val qL = qcZig(0); val qC = qcZig(1)
      def comps() = Array.tabulate(bw * bh) { _ =>
        Array.tabulate(8, 8)((v, u) =>
          if (rnd.nextInt(10) < 6) 0 else rnd.nextInt(15) - 7)
      }
      val (cy, cb, cr) = (comps(), comps(), comps())
      val bytes = Jpeg.encodeJpegColor(bw * 8, bh * 8, trial % 4, qL, qC, cy, cb, cr)
      val img = Jpeg.parseJpeg(bytes).getOrElse(fail(s"color parse None, trial $trial"))
      assert(img.isInstanceOf[Jpeg.ColorJpegImage], "3 components must decode to color")
      def cl(v: Long) = math.max(0L, math.min(255L, v)).toInt
      for (bi <- 0 until bw * bh) {
        val py = idctOf(cy(bi), qL); val pb = idctOf(cb(bi), qC); val pc = idctOf(cr(bi), qC)
        val by = bi / bw; val bx = bi % bw
        for (y <- 0 until 8; x <- 0 until 8) {
          val yy = py(y)(x).toLong
          val cbv = pb(y)(x) - 128L; val crv = pc(y)(x) - 128L
          val exp = (
            cl(yy + ((Jpeg.CrR * crv + 32768L) >> 16)),
            cl(yy - ((Jpeg.CbG * cbv + Jpeg.CrG * crv + 32768L) >> 16)),
            cl(yy + ((Jpeg.CbB * cbv + 32768L) >> 16)))
          assert(img.rgb(bx * 8 + x, by * 8 + y) == exp,
            s"color drift trial=$trial block=$bi ($x,$y)")
        }
      }
    }
    // a 2-component SOF is outside the profile
    val ok = Jpeg.encodeJpegColor(8, 8, 0, qcZig(0), qcZig(1),
      Array(Array.fill(8, 8)(0)), Array(Array.fill(8, 8)(0)), Array(Array.fill(8, 8)(0)))
    val sof = (0 until ok.length - 1).find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xc0).get
    val bad = ok.clone(); bad(sof + 9) = 2 // Nf: 3 -> 2
    assert(Jpeg.parseJpeg(bad).isEmpty, "Nf=2 must be rejected")
  }

  test("4:2:0 round-trips: four-Y MCU interleave, half-res chroma, replication upsample") {
    val rnd = new scala.util.Random(420)
    def qcZig(shift: Int): Array[Array[Int]] = {
      val q = Array.ofDim[Int](8, 8)
      Jpeg.zigzag.zipWithIndex.foreach { case ((r, c), k) =>
        q(r)(c) = 1 + ((k + shift) % 3)
      }
      q
    }
    for (trial <- 0 until 8) {
      val mcx = 1 + rnd.nextInt(2); val mcy = 1 + rnd.nextInt(3)
      val w = mcx * 16; val h = mcy * 16
      val bw = w / 8; val bh = h / 8
      val qL = qcZig(0); val qC = qcZig(1)
      def comps(n: Int) = Array.tabulate(n) { _ =>
        Array.tabulate(8, 8)((v, u) =>
          if (rnd.nextInt(10) < 6) 0 else rnd.nextInt(15) - 7)
      }
      val cy = comps(bw * bh)
      val cb = comps((bw / 2) * (bh / 2)); val cr = comps((bw / 2) * (bh / 2))
      val bytes = Jpeg.encodeJpeg420(w, h, trial % 4, qL, qC, cy, cb, cr)
      val img = Jpeg.parseJpeg(bytes).getOrElse(fail(s"420 parse None, trial $trial"))
      assert(img.isInstanceOf[Jpeg.ColorJpegImage])
      assert(img.width == w && img.height == h)
      def cl(v: Long) = math.max(0L, math.min(255L, v)).toInt
      // reference rasters straight from the coefficient planes
      val yPix = Array.tabulate(bw * bh)(bi => idctOf(cy(bi), qL))
      val bPix = Array.tabulate((bw / 2) * (bh / 2))(bi => idctOf(cb(bi), qC))
      val rPix = Array.tabulate((bw / 2) * (bh / 2))(bi => idctOf(cr(bi), qC))
      for (y <- 0 until h; x <- 0 until w) {
        val yy = yPix((y / 8) * bw + x / 8)(y % 8)(x % 8).toLong
        val cxh = x / 2; val cyh = y / 2 // replication upsample
        val cbv = bPix((cyh / 8) * (bw / 2) + cxh / 8)(cyh % 8)(cxh % 8) - 128L
        val crv = rPix((cyh / 8) * (bw / 2) + cxh / 8)(cyh % 8)(cxh % 8) - 128L
        val exp = (
          cl(yy + ((Jpeg.CrR * crv + 32768L) >> 16)),
          cl(yy - ((Jpeg.CbG * cbv + Jpeg.CrG * crv + 32768L) >> 16)),
          cl(yy + ((Jpeg.CbB * cbv + 32768L) >> 16)))
        assert(img.rgb(x, y) == exp, s"420 drift trial=$trial ($x,$y)")
      }
    }
  }

  test("out-of-profile sampling layouts are rejected explicitly") {
    def flat = Array(Array.fill(8, 8)(0))
    def flat4 = Array.fill(4)(Array.fill(8, 8)(0))
    val good420 = Jpeg.encodeJpeg420(16, 16, 0, qOnes, qOnes, flat4, flat, flat)
    assert(Jpeg.parseJpeg(good420).isDefined)
    val sof = (0 until good420.length - 1).find(i =>
      (good420(i) & 0xff) == 0xff && (good420(i + 1) & 0xff) == 0xc0).get
    // Y sampling byte lives at SOF+11 (len 2 + P 1 + H 2 + W 2 + Nf 1,
    // then C1 id); rewrite it to each out-of-profile layout
    for ((hv, name) <- Seq(0x21 -> "4:2:2", 0x12 -> "4:4:0",
                           0x41 -> "4:1:1", 0x33 -> "3x3")) {
      val bad = good420.clone(); bad(sof + 12) = hv.toByte
      assert(Jpeg.parseJpeg(bad).isEmpty, s"$name must be rejected, not misread")
    }
    // chroma at 2x1 under Y 2x2 is equally outside the profile
    val badC = good420.clone(); badC(sof + 15) = 0x21.toByte
    assert(Jpeg.parseJpeg(badC).isEmpty, "chroma 2x1 must be rejected")
    // 4:2:0 with dims that are not whole MCUs: encoder refuses...
    intercept[IllegalArgumentException] {
      Jpeg.encodeJpeg420(8, 16, 0, qOnes, qOnes, flat4, flat, flat)
    }
    // ...and the decoder refuses the header form of the same claim
    val badW = good420.clone()
    badW(sof + 9) = 0x00; badW(sof + 10) = 0x08 // w = 8 under Y 2x2
    assert(Jpeg.parseJpeg(badW).isEmpty, "4:2:0 with w % 16 != 0 must be rejected")
  }

  test("restart markers: pixel-identical reframing; missing/out-of-cycle RST rejected") {
    val rnd = new scala.util.Random(0xD0)
    def qcZig(shift: Int): Array[Array[Int]] = {
      val q = Array.ofDim[Int](8, 8)
      Jpeg.zigzag.zipWithIndex.foreach { case ((r, c), k) =>
        q(r)(c) = 1 + ((k + shift) % 3)
      }
      q
    }
    val qL = qcZig(0); val qC = qcZig(1)
    def comps(n: Int) = Array.tabulate(n) { _ =>
      Array.tabulate(8, 8)((v, u) =>
        if (rnd.nextInt(10) < 6) 0 else rnd.nextInt(15) - 7)
    }
    // 4:4:4 with 12 MCUs and ri=1: m must CYCLE through 0..7 and wrap
    val (bw, bh) = (4, 3)
    val (cy, cb, cr) = (comps(bw * bh), comps(bw * bh), comps(bw * bh))
    val plain = Jpeg.encodeJpegColor(bw * 8, bh * 8, 0, qL, qC, cy, cb, cr)
    for (ri <- Seq(1, 2, 5)) {
      val restarted = Jpeg.encodeJpegColor(bw * 8, bh * 8, 0, qL, qC, cy, cb, cr,
        restartInterval = ri)
      assert(restarted.length > plain.length, s"ri=$ri must add RST bytes")
      val a = Jpeg.parseJpeg(plain).get; val b = Jpeg.parseJpeg(restarted).get
      for (y <- 0 until bh * 8; x <- 0 until bw * 8)
        assert(a.rgb(x, y) == b.rgb(x, y),
          s"restart reframing changed a pixel at ($x,$y), ri=$ri")
    }
    // 4:2:0 restarts too
    val cy4 = comps(4 * 4); val cbc = comps(2 * 2); val crc = comps(2 * 2)
    val p420 = Jpeg.parseJpeg(
      Jpeg.encodeJpeg420(32, 32, 0, qL, qC, cy4, cbc, crc)).get
    val r420 = Jpeg.parseJpeg(
      Jpeg.encodeJpeg420(32, 32, 0, qL, qC, cy4, cbc, crc, restartInterval = 1)).get
    for (y <- 0 until 32; x <- 0 until 32)
      assert(p420.rgb(x, y) == r420.rgb(x, y), s"4:2:0 restart drift at ($x,$y)")
    // negative space: break the FIRST RST marker's index (RST0→RST3)
    val restarted = Jpeg.encodeJpegColor(bw * 8, bh * 8, 0, qL, qC, cy, cb, cr,
      restartInterval = 1)
    val sos = (0 until restarted.length - 1).find(i =>
      (restarted(i) & 0xff) == 0xff && (restarted(i + 1) & 0xff) == 0xda).get
    val rst0 = (sos until restarted.length - 1).find(i =>
      (restarted(i) & 0xff) == 0xff && (restarted(i + 1) & 0xff) == 0xd0).get
    val badCycle = restarted.clone(); badCycle(rst0 + 1) = 0xd3.toByte
    assert(Jpeg.parseJpeg(badCycle).isEmpty, "out-of-cycle RST must be rejected")
    // remove the RST pair entirely: the decoder must not resync silently
    val missing = restarted.take(rst0) ++ restarted.drop(rst0 + 2)
    assert(Jpeg.parseJpeg(missing).isEmpty, "missing RST must be rejected")
    // a DRI with the wrong segment length is malformed
    val dri = (0 until restarted.length - 1).find(i =>
      (restarted(i) & 0xff) == 0xff && (restarted(i + 1) & 0xff) == 0xdd).get
    val badDri = restarted.clone(); badDri(dri + 3) = 5
    assert(Jpeg.parseJpeg(badDri).isEmpty, "DRI with len != 4 must be rejected")
  }

  test("out-of-profile and malformed streams are rejected, never thrown") {
    val good = Jpeg.encodeJpeg(16, 8, 3, qZig,
      Array.tabulate(2)(bi => Array.tabulate(8, 8)((v, u) =>
        if (u + v <= 1) bi * 3 + u + v + 1 else 0)))
    assert(Jpeg.parseJpeg(good).isDefined)
    // truncations at every structural layer
    for (cut <- Seq(1, 4, 30, good.length / 2, good.length - 1))
      assert(Jpeg.parseJpeg(good.take(cut)).isEmpty, s"truncation at $cut")
    // missing EOI
    assert(Jpeg.parseJpeg(good.dropRight(2)).isEmpty)
    // SOF2 (progressive) instead of SOF0: outside the baseline profile
    val sof = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    val prog = good.clone(); prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.parseJpeg(prog).isEmpty, "SOF2 must be rejected")
    // dims not multiples of 8
    val badDim = good.clone()
    badDim(sof + 6) = 0x00; badDim(sof + 7) = 0x09 // h = 9
    assert(Jpeg.parseJpeg(badDim).isEmpty, "h % 8 != 0 must be rejected")
    // not a JPEG at all / cross-format bytes
    assert(Jpeg.parseJpeg(Array.fill(64)(0x55.toByte)).isEmpty)
    assert(Jpeg.parseJpeg(
      graft.operators.Multimodal.encodeBmp(8, 8, 0, (_, _) => (1, 2, 3))).isEmpty)
  }

  test("progressive == baseline pixels: progression is pure framing (gray + color)") {
    val rnd = new scala.util.Random(1406)
    for (trial <- 0 until 12) {
      val bw = 1 + rnd.nextInt(3); val bh = 1 + rnd.nextInt(3)
      val w = bw * 8; val h = bh * 8
      def blocks() = Array.tabulate(bw * bh) { _ =>
        Array.tabulate(8, 8) { (_, _) =>
          val roll = rnd.nextInt(10)
          if (roll < 6) 0
          else if (roll < 9) rnd.nextInt(15) - 7 // exercises ±1 (newly-nonzero)
          else rnd.nextInt(511) - 255
        }
      }
      // multi-step successive approximation: depths 1..3 mixed, the
      // libjpeg-default-script shape (several refinement scans per
      // band, DC refinement sequences) — still exact framing
      val dcAl = 1 + trial % 3
      val acAl = 1 + (trial / 2) % 3
      if (trial % 2 == 0) { // grayscale
        val coef = blocks()
        val base = Jpeg.parseJpegAuto(Jpeg.encodeJpeg(w, h, trial % 5, qZig, coef))
          .getOrElse(fail(s"baseline None, trial $trial"))
        val prog = Jpeg.parseJpegAuto(
          Jpeg.encodeJpegProgressive(w, h, trial % 5, qZig, qOnes, Array(coef),
            dcAl, acAl))
          .getOrElse(fail(s"progressive None, trial $trial (dc $dcAl ac $acAl)"))
        assert(base.width == prog.width && base.height == prog.height)
        for (x <- 0 until w; y <- 0 until h)
          assert(base.rgb(x, y) == prog.rgb(x, y),
            s"pixel drift trial $trial ($x,$y) dc $dcAl ac $acAl")
      } else { // color 4:4:4
        val cy = blocks(); val cb = blocks(); val cr = blocks()
        val base = Jpeg.parseJpegAuto(
          Jpeg.encodeJpegColor(w, h, trial % 5, qZig, qOnes, cy, cb, cr))
          .getOrElse(fail(s"baseline color None, trial $trial"))
        val prog = Jpeg.parseJpegAuto(
          Jpeg.encodeJpegProgressive(w, h, trial % 5, qZig, qOnes,
            Array(cy, cb, cr), dcAl, acAl))
          .getOrElse(fail(s"progressive color None, trial $trial"))
        for (x <- 0 until w; y <- 0 until h)
          assert(base.rgb(x, y) == prog.rgb(x, y),
            s"color drift trial $trial ($x,$y) dc $dcAl ac $acAl")
      }
    }
  }

  test("multi-step scan script: expected SOS count, deep chains reconstruct exactly") {
    val coef = Array.tabulate(4)(bi => Array.tabulate(8, 8)((v, u) =>
      if (u + v <= 3) ((bi * 37 + u * 11 + v * 5) % 23) - 11 else 0))
    for ((dcAl, acAl) <- Seq((2, 2), (1, 3), (3, 1), (4, 4))) {
      val bytes = Jpeg.encodeJpegProgressive(16, 16, 1, qZig, qOnes,
        Array(coef), dcAl, acAl)
      val sosCount = (0 until bytes.length - 1).count(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xda)
      // 1 DC-first + 2 AC-first bands + acAl AC refines + dcAl DC refines
      assert(sosCount == 3 + acAl + dcAl, s"scan count dc $dcAl ac $acAl")
      val base = Jpeg.parseJpegAuto(Jpeg.encodeJpeg(16, 16, 1, qZig, coef))
        .getOrElse(fail("baseline None"))
      val prog = Jpeg.parseJpegAuto(bytes)
        .getOrElse(fail(s"deep-chain None dc $dcAl ac $acAl"))
      for (x <- 0 until 16; y <- 0 until 16)
        assert(base.rgb(x, y) == prog.rgb(x, y), s"drift dc $dcAl ac $acAl ($x,$y)")
    }
  }

  test("progressive decode cross-validates against the JDK ImageIO codec") {
    // ImageIO's IDCT is a different conforming implementation, so
    // pixels may differ by a small rounding slack — a scan-protocol
    // bug produces drifts orders of magnitude larger
    val rnd = new scala.util.Random(2024)
    for (trial <- 0 until 4) {
      val bw = 1 + rnd.nextInt(2); val bh = 1 + rnd.nextInt(2)
      val w = bw * 8; val h = bh * 8
      def blocks() = Array.tabulate(bw * bh) { _ =>
        Array.tabulate(8, 8) { (_, _) =>
          val roll = rnd.nextInt(10)
          if (roll < 6) 0 else rnd.nextInt(31) - 15
        }
      }
      val comps =
        if (trial % 2 == 0) Array(blocks())
        else Array(blocks(), blocks(), blocks())
      // one-step and multi-step scripts both go through ImageIO
      val bytes = Jpeg.encodeJpegProgressive(w, h, 2, qZig, qOnes, comps,
        1 + trial % 2, 1 + trial % 3)
      val ours = Jpeg.parseJpegProgressive(bytes).getOrElse(fail("our parse None"))
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, "ImageIO rejected our progressive stream")
      assert(ref.getWidth == w && ref.getHeight == h)
      // grayscale JPEGs land in a linear-gray color space where
      // getRGB applies the sRGB transfer curve (the PNG ImageIO
      // lesson) — compare RAW raster samples there
      val grayCs = ref.getColorModel.getColorSpace.getType ==
        java.awt.color.ColorSpace.TYPE_GRAY
      for (x <- 0 until w; y <- 0 until h) {
        val (r, g, b) = ours.rgb(x, y)
        val (er, eg, eb) =
          if (grayCs) {
            val v = ref.getRaster.getSample(x, y, 0); (v, v, v)
          } else {
            val argb = ref.getRGB(x, y)
            ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
          }
        val dr = math.abs(er - r); val dg = math.abs(eg - g)
        val db = math.abs(eb - b)
        assert(dr <= 3 && dg <= 3 && db <= 3,
          s"trial $trial ($x,$y): ours ($r,$g,$b) vs ImageIO ($er,$eg,$eb)")
      }
    }
  }

  test("progressive profile rejections: DRI, baseline-in-progressive, bad scan headers") {
    val coef = Array.tabulate(2)(bi => Array.tabulate(8, 8)((v, u) =>
      if (u + v <= 1) bi * 3 + u + v + 1 else 0))
    val good = Jpeg.encodeJpegProgressive(16, 8, 3, qZig, qOnes, Array(coef))
    assert(Jpeg.parseJpegProgressive(good).isDefined)
    assert(Jpeg.parseJpegAuto(good).isDefined)
    // a baseline stream is not a progressive one and vice versa
    val baseline = Jpeg.encodeJpeg(16, 8, 3, qZig, coef)
    assert(Jpeg.parseJpegProgressive(baseline).isEmpty)
    assert(Jpeg.parseJpeg(good).isEmpty)
    // truncation at every layer
    for (cut <- Seq(4, 40, good.length / 2, good.length - 1))
      assert(Jpeg.parseJpegProgressive(good.take(cut)).isEmpty, s"cut $cut")
    // corrupt a scan-header byte: Se > 63 in the first AC scan
    val sosPositions = (0 until good.length - 1).filter(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)
    assert(sosPositions.length == 5, "the 5-scan script")
    val badSe = good.clone()
    // second SOS (first AC scan): Se byte sits at sos + 2 + 2 + 1 + 2*1 + 1
    badSe(sosPositions(1) + 8) = 77.toByte
    assert(Jpeg.parseJpegProgressive(badSe).isEmpty, "Se > 63 must reject")
  }
}
