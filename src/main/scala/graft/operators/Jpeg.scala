package graft.operators

/** Baseline JPEG (ITU-T T.81), restricted profile — the THIRD real
  * raster container and the first TRANSFORM-coded one: after BMP
  * (byte arithmetic) and PNG (entropy-coded deflate), this adds the
  * block-DCT layer every camera/web image actually uses. Profile:
  * 8-bit GRAYSCALE, one component, no subsampling, dims multiples of
  * 8, baseline sequential scan, the spec's EXAMPLE Huffman tables
  * (T.81 Annex K.3 — the tables virtually every encoder ships), no
  * restart markers.
  *
  * Replayability design: JPEG is lossy pixel-to-pixel, but the
  * entropy layer is LOSSLESS at the quantized-coefficient level — so
  * the fixture generator emits quantized COEFFICIENTS from integer
  * formulas (not pixels), the encoder Huffman-codes them into a real
  * scan (DC differentials, AC run-length with ZRL/EOB, byte
  * stuffing), and the decoder recovers the exact integers, then
  * dequantizes and runs a FIXED-POINT integer IDCT (the scaled-cosine
  * basis below, 64 integer multiply-adds per pixel, one floor-shift)
  * — every step exact integer arithmetic both engines reproduce
  * bit-for-bit, so the decoded raster is oracle-replayable end to
  * end. Public sources only: ITU-T T.81 (the JPEG spec itself);
  * cross-checked in the spec against handcrafted streams.
  */
object Jpeg {

  // ---- zigzag scan order: index k -> (row, col), T.81 Figure 5 ----------
  private[graft] val zigzag: Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](64)
    var r = 0; var c = 0
    var k = 0
    while (k < 64) {
      out(k) = (r, c)
      if ((r + c) % 2 == 0) {
        if (c == 7) r += 1 else if (r == 0) c += 1 else { r -= 1; c += 1 }
      } else {
        if (r == 7) c += 1 else if (c == 0) r += 1 else { r += 1; c -= 1 }
      }
      k += 1
    }
    out
  }

  // ---- spec example Huffman tables (T.81 Annex K.3.1/K.3.2) -------------
  // BITS[i] = number of codes of length i+1; HUFFVAL in code order.
  private val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // chroma example tables (T.81 Annex K.3.1/K.3.2)
  private val dcBitsC = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcValsC = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acBitsC = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acValsC = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // fixed-point (×2^16) YCbCr→RGB constants — the libjpeg/JFIF values
  // (round(1.402·65536) etc.), shared verbatim with the m13 oracle
  private[graft] val CrR = 91881
  private[graft] val CbG = 22554
  private[graft] val CrG = 46802
  private[graft] val CbB = 116130

  /** canonical code assignment per T.81 Annex C: (value -> (code, len))
    * for encoding; (bits -> counts/symbols) structure for decoding. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val codeOf = new Array[Int](256)
    val lenOf = new Array[Int](256)
    // decode structure: per length, first code + index into vals
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes at this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        var i = 0
        while (i < bits(l - 1)) {
          codeOf(vals(k)) = code
          lenOf(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: => Int): Int = { // br reads one bit, -1 on error
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = br
        if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return vals(valPtr(l) + (code - minCode(l)))
        l += 1
      }
      -1
    }
  }
  private lazy val dcTable = new HuffTable(dcBits, dcVals)
  private lazy val acTable = new HuffTable(acBits, acVals)
  private lazy val dcTableC = new HuffTable(dcBitsC, dcValsC)
  private lazy val acTableC = new HuffTable(acBitsC, acValsC)

  // progressive AC table: the Annex K baseline AC alphabets have no
  // EOBn symbols (run > 0, size = 0) — those exist only in Annex G
  // scans, where encoders ship custom tables. This fixed full-byte
  // alphabet (255 codes of length 8 + 0xFF at length 9, the all-ones
  // 9-bit slot left unused per C.2's reserved-prefix convention)
  // covers every symbol a progressive scan can emit.
  private val acBitsP = Array(0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0)
  private val acValsP = (0 until 256).toArray
  private lazy val acTableP = new HuffTable(acBitsP, acValsP)

  // ---- fixed-point IDCT basis: M(u)(x) = round(2048·C(u)·cos((2x+1)uπ/16))
  // with C(0)=1/√2, C(u>0)=1. pixel = ((Σ_{u,v} coef·q·M(u)(x)·M(v)(y)
  // + 2^23) >> 24) + 128, clamped — 2048² · 4 = 2^24 (the 1/4 of the
  // orthonormal IDCT). Constants are literals on BOTH engines (the
  // oracle embeds them as a VALUES table), so the decode replays
  // bit-for-bit.
  private[graft] val idctBasis: Array[Array[Long]] =
    Array.tabulate(8, 8) { (u, x) =>
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      math.round(2048.0 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0))
    }

  /** The fixed-point inverse DCT + level shift + clamp over one 8×8
    * DEQUANTIZED coefficient block (row = vertical frequency v,
    * col = horizontal u) — shared by the decoder and the spec's
    * direct checks. */
  private[graft] def idctBlock(deq: Array[Array[Long]]): Array[Array[Int]] =
    Array.tabulate(8, 8) { (y, x) =>
      var sum = 0L
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          sum += deq(v)(u) * idctBasis(u)(x) * idctBasis(v)(y)
          u += 1
        }
        v += 1
      }
      val p = ((sum + (1L << 23)) >> 24) + 128L
      math.max(0L, math.min(255L, p)).toInt
    }

  /** size/category of a coefficient amplitude (T.81 F.1.2.1). */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  // ======================= encoder (fixture generator half) ===============

  /** Encode quantized coefficient blocks into a REAL baseline JFIF
    * stream. `coef(blockIndex)(v)(u)` are the QUANTIZED integers
    * (block index row-major over (by, bx)); `qtable(v)(u)` the
    * quantization table. Emits SOI, APP0(JFIF), COM of `gap` junk
    * bytes when gap > 0 (segment layout must be walked), DQT (zigzag
    * order, per spec), SOF0 (8-bit, 1 component, 1×1 sampling), two
    * DHTs (the Annex K example tables), SOS, the entropy-coded scan
    * with 0xFF byte stuffing, EOI. */
  def encodeJpeg(w: Int, h: Int, gap: Int,
                 qtable: Array[Array[Int]],
                 coef: Array[Array[Array[Int]]]): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "profile: dims multiples of 8")
    require(coef.length == (w / 8) * (h / 8), "one block per 8x8 tile")
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def b(v: Int): Unit = out += (v & 0xff).toByte
    def be16(v: Int): Unit = { b(v >> 8); b(v) }
    def marker(m: Int): Unit = { b(0xff); b(m) }
    marker(0xd8) // SOI
    marker(0xe0); be16(16) // APP0 JFIF
    "JFIF".foreach(ch => b(ch)); b(0)
    b(1); b(1); b(0); be16(1); be16(1); b(0); b(0)
    if (gap > 0) { // COM segment: variable layout, must be walked
      marker(0xfe); be16(2 + gap)
      (0 until gap).foreach(i => b(0x41 + (i % 16)))
    }
    marker(0xdb); be16(2 + 1 + 64) // DQT, Pq=0 Tq=0, zigzag order
    b(0)
    zigzag.foreach { case (r, c) => b(qtable(r)(c)) }
    marker(0xc0); be16(2 + 6 + 3) // SOF0: 8-bit, 1 component, 1x1
    b(8); be16(h); be16(w); b(1)
    b(1); b(0x11); b(0)
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length)
      b((tc << 4) | 0)
      bits.foreach(b(_)); vals.foreach(b(_))
    }
    dht(0, dcBits, dcVals)
    dht(1, acBits, acVals)
    marker(0xda); be16(2 + 1 + 2 + 3) // SOS
    b(1); b(1); b(0x00) // component 1: DC table 0, AC table 0
    b(0); b(63); b(0)
    // entropy-coded scan: MSB-first bit writer with byte stuffing
    var bitBuf = 0; var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          b(bitBuf)
          if (bitBuf == 0xff) b(0x00) // byte stuffing (B.1.1.5)
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def putHuff(t: HuffTable, sym: Int): Unit = putBits(t.codeOf(sym), t.lenOf(sym))
    def putAmp(v: Int, size: Int): Unit =
      if (size > 0) putBits(if (v >= 0) v else v + (1 << size) - 1, size)
    var prevDc = 0
    coef.foreach { blk =>
      val dc = blk(0)(0)
      val diff = dc - prevDc
      prevDc = dc
      val dsz = category(diff)
      putHuff(dcTable, dsz); putAmp(diff, dsz)
      var k = 1
      var run = 0
      while (k < 64) {
        val (r, c) = zigzag(k)
        val v = blk(r)(c)
        if (v == 0) run += 1
        else {
          while (run > 15) { putHuff(acTable, 0xf0); run -= 16 } // ZRL
          val sz = category(v)
          putHuff(acTable, (run << 4) | sz); putAmp(v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) putHuff(acTable, 0x00) // EOB
    }
    if (bitCnt > 0) { // pad final byte with 1s (B.1.1.5.1)
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      b(bitBuf)
      if ((bitBuf & 0xff) == 0xff) b(0x00)
    }
    marker(0xd9) // EOI
    out.toArray
  }

  /** COLOR encode (round 12): 3-component YCbCr baseline, 4:4:4 (no
    * subsampling — every MCU is one block per component, interleaved
    * Y Cb Cr with separate DC predictors), TWO quantization tables
    * (luma Tq=0, chroma Tq=1) and FOUR Huffman tables (the Annex K
    * luma AND chroma example pairs). coefX(blockIndex)(v)(u),
    * row-major over (by, bx). */
  def encodeJpegColor(w: Int, h: Int, gap: Int,
                      qLuma: Array[Array[Int]], qChroma: Array[Array[Int]],
                      coefY: Array[Array[Array[Int]]],
                      coefCb: Array[Array[Array[Int]]],
                      coefCr: Array[Array[Array[Int]]],
                      restartInterval: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "profile: dims multiples of 8")
    val nb = (w / 8) * (h / 8)
    require(coefY.length == nb && coefCb.length == nb && coefCr.length == nb)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def b(v: Int): Unit = out += (v & 0xff).toByte
    def be16(v: Int): Unit = { b(v >> 8); b(v) }
    def marker(m: Int): Unit = { b(0xff); b(m) }
    marker(0xd8)
    marker(0xe0); be16(16)
    "JFIF".foreach(ch => b(ch)); b(0)
    b(1); b(1); b(0); be16(1); be16(1); b(0); b(0)
    if (gap > 0) { marker(0xfe); be16(2 + gap)
      (0 until gap).foreach(i => b(0x41 + (i % 16))) }
    def dqt(tq: Int, q: Array[Array[Int]]): Unit = {
      marker(0xdb); be16(2 + 1 + 64); b(tq)
      zigzag.foreach { case (r, c) => b(q(r)(c)) }
    }
    dqt(0, qLuma); dqt(1, qChroma)
    marker(0xc0); be16(2 + 6 + 3 * 3) // SOF0: 8-bit, 3 components, 1x1
    b(8); be16(h); be16(w); b(3)
    b(1); b(0x11); b(0) // Y  -> quant 0
    b(2); b(0x11); b(1) // Cb -> quant 1
    b(3); b(0x11); b(1) // Cr -> quant 1
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length)
      b((tc << 4) | th); bits.foreach(b(_)); vals.foreach(b(_))
    }
    dht(0, 0, dcBits, dcVals); dht(1, 0, acBits, acVals)
    dht(0, 1, dcBitsC, dcValsC); dht(1, 1, acBitsC, acValsC)
    if (restartInterval > 0) { // DRI (B.2.4.4): restart every Ri MCUs
      marker(0xdd); be16(4); be16(restartInterval)
    }
    marker(0xda); be16(2 + 1 + 2 * 3 + 3) // SOS: 3 components
    b(3)
    b(1); b(0x00) // Y:  DC 0, AC 0
    b(2); b(0x11) // Cb: DC 1, AC 1
    b(3); b(0x11) // Cr: DC 1, AC 1
    b(0); b(63); b(0)
    var bitBuf = 0; var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          b(bitBuf)
          if (bitBuf == 0xff) b(0x00)
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def putHuff(t: HuffTable, sym: Int): Unit = putBits(t.codeOf(sym), t.lenOf(sym))
    def putAmp(v: Int, size: Int): Unit =
      if (size > 0) putBits(if (v >= 0) v else v + (1 << size) - 1, size)
    def putBlock(blk: Array[Array[Int]], prevDc: Int,
                 dct: HuffTable, act: HuffTable): Int = {
      val dc = blk(0)(0)
      val dsz = category(dc - prevDc)
      putHuff(dct, dsz); putAmp(dc - prevDc, dsz)
      var k = 1; var run = 0
      while (k < 64) {
        val (r, c) = zigzag(k)
        val v = blk(r)(c)
        if (v == 0) run += 1
        else {
          while (run > 15) { putHuff(act, 0xf0); run -= 16 }
          val sz = category(v)
          putHuff(act, (run << 4) | sz); putAmp(v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) putHuff(act, 0x00)
      dc
    }
    var dcY = 0; var dcCb = 0; var dcCr = 0
    // restart boundary (E.1.4): byte-align with 1-pad (stuffed if the
    // pad byte lands on 0xFF), emit RSTm with m cycling 0..7, and
    // reset every DC predictor — shared by the 4:4:4 and 4:2:0 scans
    def restart(m: Int): Unit = {
      if (bitCnt > 0) {
        bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
        b(bitBuf)
        if ((bitBuf & 0xff) == 0xff) b(0x00)
        bitBuf = 0; bitCnt = 0
      }
      marker(0xd0 + m)
      dcY = 0; dcCb = 0; dcCr = 0
    }
    var bi = 0
    var rstM = 0
    while (bi < nb) { // interleaved MCUs: Y, Cb, Cr per 8x8 tile
      dcY = putBlock(coefY(bi), dcY, dcTable, acTable)
      dcCb = putBlock(coefCb(bi), dcCb, dcTableC, acTableC)
      dcCr = putBlock(coefCr(bi), dcCr, dcTableC, acTableC)
      bi += 1
      if (restartInterval > 0 && bi < nb && bi % restartInterval == 0) {
        restart(rstM); rstM = (rstM + 1) % 8
      }
    }
    if (bitCnt > 0) {
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      b(bitBuf)
      if ((bitBuf & 0xff) == 0xff) b(0x00)
    }
    marker(0xd9)
    out.toArray
  }

  /** 4:2:0 color encode (round 13): the subsampled layout a crawl's
    * JPEGs actually use. Y samples at 2×2, Cb/Cr at 1×1 — each MCU
    * covers a 16×16 pixel tile and interleaves FOUR Y blocks (the
    * component's 2×2 sampling grid, left-to-right then top-to-bottom
    * per T.81 A.2.3) followed by one Cb and one Cr block, all under
    * per-component DC predictors. `coefY` is row-major over the FULL
    * (w/8)×(h/8) luma block grid; `coefCb`/`coefCr` are row-major
    * over the HALF-resolution (w/16)×(h/16) chroma block grid. Dims
    * must be multiples of 16 (whole MCUs — this profile does not pad
    * partial blocks). */
  def encodeJpeg420(w: Int, h: Int, gap: Int,
                    qLuma: Array[Array[Int]], qChroma: Array[Array[Int]],
                    coefY: Array[Array[Array[Int]]],
                    coefCb: Array[Array[Array[Int]]],
                    coefCr: Array[Array[Array[Int]]],
                    restartInterval: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "profile: dims multiples of 16")
    val bw = w / 8; val bh = h / 8
    require(coefY.length == bw * bh, "one Y block per 8x8 luma tile")
    require(coefCb.length == (bw / 2) * (bh / 2) &&
      coefCr.length == (bw / 2) * (bh / 2), "one chroma block per 16x16 tile")
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def b(v: Int): Unit = out += (v & 0xff).toByte
    def be16(v: Int): Unit = { b(v >> 8); b(v) }
    def marker(m: Int): Unit = { b(0xff); b(m) }
    marker(0xd8)
    marker(0xe0); be16(16)
    "JFIF".foreach(ch => b(ch)); b(0)
    b(1); b(1); b(0); be16(1); be16(1); b(0); b(0)
    if (gap > 0) { marker(0xfe); be16(2 + gap)
      (0 until gap).foreach(i => b(0x41 + (i % 16))) }
    def dqt(tq: Int, q: Array[Array[Int]]): Unit = {
      marker(0xdb); be16(2 + 1 + 64); b(tq)
      zigzag.foreach { case (r, c) => b(q(r)(c)) }
    }
    dqt(0, qLuma); dqt(1, qChroma)
    marker(0xc0); be16(2 + 6 + 3 * 3) // SOF0: 8-bit, 3 components, 4:2:0
    b(8); be16(h); be16(w); b(3)
    b(1); b(0x22); b(0) // Y  2x2 -> quant 0
    b(2); b(0x11); b(1) // Cb 1x1 -> quant 1
    b(3); b(0x11); b(1) // Cr 1x1 -> quant 1
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length)
      b((tc << 4) | th); bits.foreach(b(_)); vals.foreach(b(_))
    }
    dht(0, 0, dcBits, dcVals); dht(1, 0, acBits, acVals)
    dht(0, 1, dcBitsC, dcValsC); dht(1, 1, acBitsC, acValsC)
    if (restartInterval > 0) { // DRI: restart every Ri MCUs
      marker(0xdd); be16(4); be16(restartInterval)
    }
    marker(0xda); be16(2 + 1 + 2 * 3 + 3)
    b(3)
    b(1); b(0x00)
    b(2); b(0x11)
    b(3); b(0x11)
    b(0); b(63); b(0)
    var bitBuf = 0; var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          b(bitBuf)
          if (bitBuf == 0xff) b(0x00)
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def putHuff(t: HuffTable, sym: Int): Unit = putBits(t.codeOf(sym), t.lenOf(sym))
    def putAmp(v: Int, size: Int): Unit =
      if (size > 0) putBits(if (v >= 0) v else v + (1 << size) - 1, size)
    def putBlock(blk: Array[Array[Int]], prevDc: Int,
                 dct: HuffTable, act: HuffTable): Int = {
      val dc = blk(0)(0)
      val dsz = category(dc - prevDc)
      putHuff(dct, dsz); putAmp(dc - prevDc, dsz)
      var k = 1; var run = 0
      while (k < 64) {
        val (r, c) = zigzag(k)
        val v = blk(r)(c)
        if (v == 0) run += 1
        else {
          while (run > 15) { putHuff(act, 0xf0); run -= 16 }
          val sz = category(v)
          putHuff(act, (run << 4) | sz); putAmp(v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) putHuff(act, 0x00)
      dc
    }
    var dcY = 0; var dcCb = 0; var dcCr = 0
    def restart(m: Int): Unit = { // E.1.4, as in encodeJpegColor
      if (bitCnt > 0) {
        bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
        b(bitBuf)
        if ((bitBuf & 0xff) == 0xff) b(0x00)
        bitBuf = 0; bitCnt = 0
      }
      marker(0xd0 + m)
      dcY = 0; dcCb = 0; dcCr = 0
    }
    val mcx = w / 16; val mcy = h / 16
    var mi = 0
    var rstM = 0
    while (mi < mcx * mcy) {
      val my = mi / mcx; val mx = mi % mcx
      var bv = 0
      while (bv < 2) { // the four Y blocks of the 2x2 sampling grid
        var bhh = 0
        while (bhh < 2) {
          dcY = putBlock(coefY((my * 2 + bv) * bw + mx * 2 + bhh),
            dcY, dcTable, acTable)
          bhh += 1
        }
        bv += 1
      }
      dcCb = putBlock(coefCb(my * (bw / 2) + mx), dcCb, dcTableC, acTableC)
      dcCr = putBlock(coefCr(my * (bw / 2) + mx), dcCr, dcTableC, acTableC)
      mi += 1
      if (restartInterval > 0 && mi < mcx * mcy && mi % restartInterval == 0) {
        restart(rstM); rstM = (rstM + 1) % 8
      }
    }
    if (bitCnt > 0) {
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      b(bitBuf)
      if ((bitBuf & 0xff) == 0xff) b(0x00)
    }
    marker(0xd9)
    out.toArray
  }

  // ================ progressive encoder (SOF2, round 14) ==================

  /** PROGRESSIVE encode (SOF2, T.81 Annex G): grayscale (1 component)
    * or YCbCr 4:4:4 (3 components, all 1×1), spectral selection +
    * one successive-approximation step. ~10% of web-crawl JPEGs are
    * progressive; this is the generator half of the m18 decode proof.
    *
    * Scan script (generalized to MULTI-STEP successive approximation,
    * the libjpeg-default-script shape — every protocol arm of Annex G
    * is exercised; `dcAl`/`acAl` set the approximation depth, 1 gives
    * the classic two-level progression):
    *   1. DC first, interleaved:     Ss=0 Se=0  Ah=0     Al=dcAl
    *   2. AC first, per component:   Ss=1 Se=5  Ah=0     Al=acAl
    *   3. AC first, per component:   Ss=6 Se=63 Ah=0     Al=acAl
    *   4. AC refine, per component:  Ss=1 Se=63 Ah=al+1  Al=al
    *      for al = acAl-1 … 0 (multiple refinement scans per band)
    *   5. DC refine, interleaved:    Ss=0 Se=0  Ah=al+1  Al=al
    *      for al = dcAl-1 … 0 (a DC refinement SEQUENCE)
    * DC uses the arithmetic-shift point transform, AC the
    * sign-magnitude one (A.4); EOB runs span blocks in the AC-first
    * scans, and the AC-refinement scans carry libjpeg-ordered
    * correction bits (buffered bits emitted after the next coded
    * symbol — G.1.2.3). Because every Al chain steps down to 0, the
    * decoded coefficients equal the input EXACTLY: progression is
    * pure framing, so m18's oracle is the baseline pixel derivation.
    *
    * `comps(c)(blockIndex)(v)(u)` are the quantized coefficients,
    * row-major blocks; components all 1×1 so every component has the
    * same block count. */
  def encodeJpegProgressive(w: Int, h: Int, gap: Int,
                            qLuma: Array[Array[Int]],
                            qChroma: Array[Array[Int]],
                            comps: Array[Array[Array[Array[Int]]]],
                            dcAl: Int = 1, acAl: Int = 1): Array[Byte] = {
    require(dcAl >= 1 && dcAl <= 13 && acAl >= 1 && acAl <= 13,
      "approximation depth out of range")
    val nf = comps.length
    require(nf == 1 || nf == 3, "profile: 1 or 3 components")
    require(w % 8 == 0 && h % 8 == 0, "profile: dims multiples of 8")
    val nBlocks = (w / 8) * (h / 8)
    require(comps.forall(_.length == nBlocks), "one block per 8x8 tile")
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def b(v: Int): Unit = out += (v & 0xff).toByte
    def be16(v: Int): Unit = { b(v >> 8); b(v) }
    def marker(m: Int): Unit = { b(0xff); b(m) }
    marker(0xd8) // SOI
    marker(0xe0); be16(16) // APP0 JFIF
    "JFIF".foreach(ch => b(ch)); b(0)
    b(1); b(1); b(0); be16(1); be16(1); b(0); b(0)
    if (gap > 0) { // COM segment: variable layout, must be walked
      marker(0xfe); be16(2 + gap)
      (0 until gap).foreach(i => b(0x41 + (i % 16)))
    }
    def dqt(tq: Int, q: Array[Array[Int]]): Unit = {
      marker(0xdb); be16(2 + 1 + 64); b(tq)
      zigzag.foreach { case (r, c) => b(q(r)(c)) }
    }
    dqt(0, qLuma)
    if (nf == 3) dqt(1, qChroma)
    marker(0xc2); be16(2 + 6 + 3 * nf) // SOF2: progressive DCT
    b(8); be16(h); be16(w); b(nf)
    (0 until nf).foreach { c =>
      b(c + 1); b(0x11); b(if (c == 0) 0 else 1)
    }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length)
      b((tc << 4) | th)
      bits.foreach(b(_)); vals.foreach(b(_))
    }
    // DC tables: the Annex K pairs; AC table: the progressive
    // full-alphabet table (slot 0) — Annex K's AC alphabets lack EOBn
    dht(0, 0, dcBits, dcVals); dht(1, 0, acBitsP, acValsP)
    if (nf == 3) dht(0, 1, dcBitsC, dcValsC)

    // per-scan bit writer (fresh buffer per scan, 1-padded at end)
    var bitBuf = 0; var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          b(bitBuf)
          if (bitBuf == 0xff) b(0x00)
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def padScan(): Unit = {
      if (bitCnt > 0) {
        bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
        b(bitBuf)
        if ((bitBuf & 0xff) == 0xff) b(0x00)
        bitBuf = 0; bitCnt = 0
      }
    }
    def putHuff(t: HuffTable, sym: Int): Unit = putBits(t.codeOf(sym), t.lenOf(sym))
    def putAmp(v: Int, size: Int): Unit =
      if (size > 0) putBits(if (v >= 0) v else v + (1 << size) - 1, size)
    def sos(comps0: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); be16(2 + 1 + 2 * comps0.length + 3)
      b(comps0.length)
      comps0.foreach { c =>
        val td = if (c == 0) 0 else 1
        b(c + 1); b((td << 4) | 0) // every AC scan reads table 0
      }
      b(ss); b(se); b((ah << 4) | al)
    }
    def dcT(c: Int) = if (c == 0) dcTable else dcTableC
    def acT(c: Int) = acTableP

    // --- scan 1: DC first (interleaved), arithmetic-shift transform
    val alDc = dcAl
    sos(0 until nf, 0, 0, 0, alDc)
    val prevDc = new Array[Int](nf)
    var bi = 0
    while (bi < nBlocks) {
      var c = 0
      while (c < nf) {
        val dc = comps(c)(bi)(0)(0) >> alDc // arithmetic shift (G.1.2.1)
        val diff = dc - prevDc(c)
        prevDc(c) = dc
        val sz = category(diff)
        putHuff(dcT(c), sz); putAmp(diff, sz)
        c += 1
      }
      bi += 1
    }
    padScan()

    // --- AC first scans: sign-magnitude transform, EOB runs
    def acFirst(c: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(c), ss, se, 0, al)
      val ac = acT(c)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(eobrun)
        putHuff(ac, n << 4)
        putBits(eobrun - (1 << n), n)
        eobrun = 0
      }
      var blk = 0
      while (blk < nBlocks) {
        val cf = comps(c)(blk)
        @inline def tv(k: Int): Int = {
          val (r, cc) = zigzag(k)
          val v = cf(r)(cc)
          if (v >= 0) v >> al else -((-v) >> al) // sign-magnitude (A.4)
        }
        var any = false
        var k = ss
        while (k <= se) { if (tv(k) != 0) any = true; k += 1 }
        if (!any) {
          eobrun += 1
          if (eobrun == 0x7fff) flushEob()
        } else {
          flushEob()
          var run = 0
          k = ss
          while (k <= se) {
            val v = tv(k)
            if (v == 0) run += 1
            else {
              while (run > 15) { putHuff(ac, 0xf0); run -= 16 }
              val sz = category(v)
              putHuff(ac, (run << 4) | sz); putAmp(v, sz)
              run = 0
            }
            k += 1
          }
          if (run > 0) eobrun += 1 // trailing zeros join the EOB run
        }
        blk += 1
      }
      flushEob()
      padScan()
    }
    (0 until nf).foreach(c => acFirst(c, 1, 5, acAl))
    (0 until nf).foreach(c => acFirst(c, 6, 63, acAl))

    // --- AC refinement scans (G.1.2.3, libjpeg bit-buffer ordering)
    def acRefine(c: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(c), ss, se, al + 1, al)
      val ac = acT(c)
      var eobrun = 0
      val corr = new scala.collection.mutable.ArrayBuffer[Int]()
      def emitCorr(): Unit = { corr.foreach(putBits(_, 1)); corr.clear() }
      def flushEob(): Unit = if (eobrun > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(eobrun)
        putHuff(ac, n << 4)
        putBits(eobrun - (1 << n), n)
        emitCorr()
        eobrun = 0
      }
      var blk = 0
      while (blk < nBlocks) {
        val cf = comps(c)(blk)
        @inline def absAl(k: Int): Int = {
          val (r, cc) = zigzag(k); math.abs(cf(r)(cc)) >> al
        }
        @inline def isNeg(k: Int): Boolean = {
          val (r, cc) = zigzag(k); cf(r)(cc) < 0
        }
        // previously nonzero = visible at the coarser Al+1 precision
        @inline def prevNz(k: Int): Boolean = (absAl(k) >> 1) != 0
        // last NEWLY-nonzero position (|v|>>al == 1, invisible before)
        var kEnd = ss - 1
        var k = ss
        while (k <= se) {
          if (!prevNz(k) && absAl(k) != 0) kEnd = k
          k += 1
        }
        if (kEnd < ss) {
          // no new coefficients: whole block joins the EOB run; its
          // correction bits ride the run's buffer
          eobrun += 1
          k = ss
          while (k <= se) {
            if (prevNz(k)) corr += (absAl(k) & 1)
            k += 1
          }
          if (eobrun == 0x7fff) flushEob()
        } else {
          flushEob()
          var run = 0
          k = ss
          while (k <= kEnd) {
            if (prevNz(k)) corr += (absAl(k) & 1)
            else if (absAl(k) == 0) {
              run += 1
              if (run == 16) { putHuff(ac, 0xf0); emitCorr(); run = 0 }
            } else {
              // newly nonzero: magnitude is exactly 1 at this step
              putHuff(ac, (run << 4) | 1)
              putBits(if (isNeg(k)) 0 else 1, 1)
              emitCorr()
              run = 0
            }
            k += 1
          }
          if (kEnd < se) {
            // the block's tail joins the EOB run
            eobrun += 1
            k = kEnd + 1
            while (k <= se) {
              if (prevNz(k)) corr += (absAl(k) & 1)
              k += 1
            }
          }
        }
        blk += 1
      }
      flushEob()
      padScan()
    }
    // multiple AC refinement scans per band: al walks acAl-1 … 0
    var alAc = acAl - 1
    while (alAc >= 0) {
      (0 until nf).foreach(c => acRefine(c, 1, 63, alAc))
      alAc -= 1
    }

    // --- DC refinement SEQUENCE (interleaved) — one raw bit per
    // block per step, al walks dcAl-1 … 0
    var alD = alDc - 1
    while (alD >= 0) {
      sos(0 until nf, 0, 0, alD + 1, alD)
      bi = 0
      while (bi < nBlocks) {
        var c = 0
        while (c < nf) {
          putBits((comps(c)(bi)(0)(0) >> alD) & 1, 1)
          c += 1
        }
        bi += 1
      }
      padScan()
      alD -= 1
    }

    marker(0xd9) // EOI
    out.toArray
  }

  // ======================= decoder ========================================

  /** Grayscale raster decoded from a baseline JPEG; satisfies the
    * shared Raster contract (rgb = the gray value ×3) so blockLum /
    * embed / p05 consume it container-blind. */
  final case class JpegImage(width: Int, height: Int, gray: Array[Byte])
      extends Multimodal.Raster {
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val g = gray(y * width + x) & 0xff
      (g, g, g)
    }
  }

  /** Color raster decoded from a 3-component baseline JPEG: one
    * packed 0xRRGGBB int per pixel (already YCbCr→RGB converted). */
  final case class ColorJpegImage(width: Int, height: Int, pix: Array[Int])
      extends Multimodal.Raster {
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val p = pix(y * width + x)
      ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    }
  }

  /** Decode a baseline JPEG within this object's profile: walks
    * segments by length, parses DQTs (un-zigzagged, Tq ≤ 3), SOF0
    * (8-bit; 1 component grayscale, 3-component 4:4:4 at 1×1, or
    * 3-component 4:2:0 at Y 2×2 / chroma 1×1 with dims multiples of
    * 16 — any other sampling layout is explicitly rejected), every
    * DHT, SOS (tables per component); entropy-decodes interleaved
    * MCUs (Hi×Vi blocks per component per MCU, per-component DC
    * predictors, AC run-length, byte unstuffing), dequantizes,
    * integer-IDCTs, level-shifts, clamps, and for 3 components
    * upsamples subsampled chroma by integer replication and converts
    * YCbCr→RGB in the fixed-point integer arithmetic above. None for
    * anything malformed or outside the profile — never throws. */
  def parseJpeg(p: Array[Byte]): Option[Multimodal.Raster] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var pos = 2
    var w = -1; var h = -1
    var nf = 0
    val qts = new Array[Array[Array[Int]]](4)
    val dcTs = new Array[HuffTable](4)
    val acTs = new Array[HuffTable](4)
    var compQ: Array[Int] = null // component -> quant table id
    var compH: Array[Int] = null // component -> horizontal sampling factor
    var compV: Array[Int] = null // component -> vertical sampling factor
    var compDc: Array[Int] = null // component -> DC table id (from SOS)
    var compAc: Array[Int] = null
    var restartInterval = 0 // DRI: 0 = no restarts
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 4 > p.length) return None
      if (u8(pos) != 0xff) return None
      val m = u8(pos + 1)
      if (m == 0xd9) return None // EOI before SOS
      val len = be16(pos + 2)
      if (len < 2 || pos + 2 + len > p.length) return None
      val seg = pos + 4
      m match {
        case 0xdb => // DQT: Pq=0 (8-bit), one table per segment, zigzag
          if (len != 2 + 1 + 64 || (u8(seg) >> 4) != 0 || (u8(seg) & 0x0f) > 3)
            return None
          val qt = Array.ofDim[Int](8, 8)
          var k = 0
          while (k < 64) {
            val (r, c) = zigzag(k); qt(r)(c) = u8(seg + 1 + k); k += 1
          }
          qts(u8(seg) & 0x0f) = qt
        case 0xc0 => // SOF0: 8-bit, 1 or 3 components, 1x1 or 4:2:0
          if (len < 2 + 6 || u8(seg) != 8) return None
          h = be16(seg + 1); w = be16(seg + 3)
          nf = u8(seg + 5)
          if ((nf != 1 && nf != 3) || len != 2 + 6 + 3 * nf) return None
          if (w <= 0 || h <= 0 || w % 8 != 0 || h % 8 != 0) return None
          compQ = new Array[Int](nf)
          compH = new Array[Int](nf); compV = new Array[Int](nf)
          var ci = 0
          while (ci < nf) {
            val hv = u8(seg + 7 + 3 * ci)
            compH(ci) = hv >> 4; compV(ci) = hv & 0x0f
            val tq = u8(seg + 8 + 3 * ci)
            if (tq > 3) return None
            compQ(ci) = tq
            ci += 1
          }
          // profile: every component 1x1 (grayscale / 4:4:4), or the
          // 4:2:0 layout (Y 2x2, Cb/Cr 1x1) with whole 16x16 MCUs.
          // Anything else (4:2:2, 4:1:1, ...) is explicitly rejected.
          val all11 = (0 until nf).forall(c => compH(c) == 1 && compV(c) == 1)
          val is420 = nf == 3 && compH(0) == 2 && compV(0) == 2 &&
            compH(1) == 1 && compV(1) == 1 && compH(2) == 1 && compV(2) == 1
          if (!all11 && !is420) return None
          if (is420 && (w % 16 != 0 || h % 16 != 0)) return None
        case 0xc4 => // DHT (one or more tables per segment)
          var q = seg
          while (q < pos + 2 + len) {
            val tcth = u8(q)
            if ((tcth >> 4) > 1 || (tcth & 0x0f) > 3) return None
            val bits = Array.tabulate(16)(i => u8(q + 1 + i))
            val n = bits.sum
            if (q + 17 + n > pos + 2 + len || n > 256) return None
            val vals = Array.tabulate(n)(i => u8(q + 17 + i))
            val t = new HuffTable(bits, vals)
            if ((tcth >> 4) == 0) dcTs(tcth & 0x0f) = t
            else acTs(tcth & 0x0f) = t
            q += 17 + n
          }
        case 0xda => // SOS: Ns == Nf, full spectral range
          if (nf == 0 || len != 2 + 1 + 2 * nf + 3 || u8(seg) != nf) return None
          compDc = new Array[Int](nf); compAc = new Array[Int](nf)
          var ci = 0
          while (ci < nf) {
            val tdta = u8(seg + 2 + 2 * ci)
            compDc(ci) = tdta >> 4; compAc(ci) = tdta & 0x0f
            if (compDc(ci) > 3 || compAc(ci) > 3) return None
            ci += 1
          }
          if (u8(seg + 1 + 2 * nf) != 0 || u8(seg + 2 + 2 * nf) != 63 ||
            u8(seg + 3 + 2 * nf) != 0) return None
          scanStart = pos + 2 + len
        case 0xdd => // DRI (B.2.4.4): fixed 4-byte segment
          if (len != 4) return None
          restartInterval = be16(seg)
        case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 =>
          return None // any other SOF: outside the baseline profile
        case _ => () // APPn / COM / other: skipped BY LENGTH
      }
      if (scanStart < 0) pos += 2 + len
    }
    if (w < 0 || compQ == null) return None
    var ci = 0
    while (ci < nf) {
      if (qts(compQ(ci)) == null || dcTs(compDc(ci)) == null ||
        acTs(compAc(ci)) == null) return None
      ci += 1
    }
    // entropy-coded scan: MSB-first reader with byte unstuffing
    var sp = scanStart
    var bitBuf = 0; var bitCnt = 0
    var err = false
    def bit(): Int = {
      if (bitCnt == 0) {
        if (sp >= p.length) { err = true; return -1 }
        var byte = u8(sp); sp += 1
        if (byte == 0xff) {
          if (sp >= p.length) { err = true; return -1 }
          val nxt = u8(sp)
          if (nxt == 0x00) sp += 1 // stuffed
          else { err = true; return -1 } // a marker inside the scan
          byte = 0xff
        }
        bitBuf = byte; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def extend(v: Int, sz: Int): Int = // T.81 F.2.2.1 EXTEND
      if (sz == 0) 0 else if (v < (1 << (sz - 1))) v - (1 << sz) + 1 else v
    def recv(sz: Int): Int = {
      var v = 0
      var i = 0
      while (i < sz) { val b0 = bit(); if (err) return 0; v = (v << 1) | b0; i += 1 }
      v
    }
    // MCU geometry from the sampling factors: each MCU covers an
    // (8·Hmax)×(8·Vmax) pixel tile and carries Hi×Vi blocks per
    // component (T.81 A.2.3), left-to-right then top-to-bottom within
    // the component's sampling grid. For all-1x1 this degenerates to
    // exactly the one-block-per-component walk; for 4:2:0 each MCU is
    // four Y blocks + one Cb + one Cr, and the chroma planes are
    // half-resolution.
    val hMax = compH.max; val vMax = compV.max
    val mcx = w / (8 * hMax); val mcy = h / (8 * vMax)
    val cw = Array.tabulate(nf)(c => w * compH(c) / hMax)
    val chh = Array.tabulate(nf)(c => h * compV(c) / vMax)
    val planes = Array.tabulate(nf)(c => new Array[Int](cw(c) * chh(c)))
    val prevDc = new Array[Int](nf)
    var mi = 0
    while (mi < mcx * mcy) {
      val my = mi / mcx; val mx = mi % mcx
      var comp = 0
      while (comp < nf) {
        val qt = qts(compQ(comp))
        var sv = 0
        while (sv < compV(comp)) {
          var sh = 0
          while (sh < compH(comp)) {
            val coef = Array.ofDim[Long](8, 8)
            val dsz = huffDecode(dcTs(compDc(comp)), bit _)
            if (err || dsz < 0 || dsz > 11) return None
            val diff = extend(recv(dsz), dsz)
            if (err) return None
            prevDc(comp) += diff
            coef(0)(0) = prevDc(comp).toLong * qt(0)(0)
            var k = 1
            while (k < 64) {
              val sym = huffDecode(acTs(compAc(comp)), bit _)
              if (err || sym < 0) return None
              if (sym == 0x00) k = 64 // EOB
              // ZRL = 16 zero coefficients; landing exactly at k == 64
              // completes the block (a conforming stream libjpeg-class
              // decoders accept), so only k > 64 is malformed
              else if (sym == 0xf0) { k += 16; if (k > 64) return None }
              else {
                val run = sym >> 4; val sz = sym & 0x0f
                k += run
                if (k > 63 || sz == 0) return None
                val v = extend(recv(sz), sz)
                if (err) return None
                val (r, c) = zigzag(k)
                coef(r)(c) = v.toLong * qt(r)(c)
                k += 1
              }
            }
            val px = idctBlock(coef)
            val by = my * compV(comp) + sv; val bx = mx * compH(comp) + sh
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                planes(comp)((by * 8 + y) * cw(comp) + bx * 8 + x) = px(y)(x)
                x += 1
              }
              y += 1
            }
            sh += 1
          }
          sv += 1
        }
        comp += 1
      }
      mi += 1
      // restart boundary (E.2.4): discard the pad bits of the current
      // byte, expect RSTm with m cycling 0..7 (a stuffed 00 after an
      // 0xFF pad byte was already consumed by the bit reader), reset
      // every DC predictor. A missing or out-of-cycle RST is
      // malformed; an unexpected RST mid-scan errors in bit().
      if (restartInterval > 0 && mi < mcx * mcy &&
        mi % restartInterval == 0) {
        bitCnt = 0 // byte-align: the rest of the buffered byte is pad
        if (sp + 2 > p.length) return None
        if (u8(sp) != 0xff || u8(sp + 1) != 0xd0 + (mi / restartInterval - 1) % 8)
          return None
        sp += 2
        java.util.Arrays.fill(prevDc, 0)
      }
    }
    // after the last block: byte-align, then expect EOI (possibly after
    // pad bits already consumed within the final byte)
    if (sp + 2 > p.length) return None
    if (u8(sp) != 0xff || u8(sp + 1) != 0xd9) return None
    if (nf == 1) {
      val gray = new Array[Byte](w * h)
      var i = 0
      while (i < gray.length) { gray(i) = planes(0)(i).toByte; i += 1 }
      Some(JpegImage(w, h, gray))
    } else {
      // YCbCr → RGB, fixed-point ×2^16 with the shared constants; >>
      // floors, exactly what the oracle's floor(x/65536.0) replays.
      // Subsampled chroma upsamples by integer REPLICATION: the
      // chroma sample for full-res (x, y) is plane(y·Vi/Vmax,
      // x·Hi/Hmax) — for 4:2:0 that is (y/2, x/2), the box upsample,
      // which the oracle replays as gy//2 / gx//2 index joins.
      @inline def cl(v: Long): Int = math.max(0L, math.min(255L, v)).toInt
      val pix = new Array[Int](w * h)
      var py = 0
      while (py < h) {
        var px2 = 0
        while (px2 < w) {
          val yy = planes(0)(
            (py * compV(0) / vMax) * cw(0) + px2 * compH(0) / hMax).toLong
          val cb = planes(1)(
            (py * compV(1) / vMax) * cw(1) + px2 * compH(1) / hMax) - 128L
          val cr = planes(2)(
            (py * compV(2) / vMax) * cw(2) + px2 * compH(2) / hMax) - 128L
          val r = cl(yy + ((CrR * cr + 32768L) >> 16))
          val g = cl(yy - ((CbG * cb + CrG * cr + 32768L) >> 16))
          val b = cl(yy + ((CbB * cb + 32768L) >> 16))
          pix(py * w + px2) = (r << 16) | (g << 8) | b
          px2 += 1
        }
        py += 1
      }
      Some(ColorJpegImage(w, h, pix))
    }
  }

  // decode helper shared by DC and AC reads (method, not closure, so
  // the hot loop stays allocation-free)
  private def huffDecode(t: HuffTable, br: () => Int): Int = t.decode(br())

  /** Decode a PROGRESSIVE JPEG (SOF2, T.81 Annex G) within this
    * object's profile: 8-bit, 1 or 3 components all at 1×1 sampling,
    * dims multiples of 8, no DRI. Walks segments by length (DQT/DHT
    * may appear between scans), then decodes EVERY scan against the
    * per-component coefficient store: DC-first scans accumulate
    * shifted diffs (arithmetic-shift point transform), DC-refinement
    * scans OR one raw bit per block, AC-first scans run-length decode
    * a spectral band with cross-block EOB runs, and AC-refinement
    * scans replay Annex G.2's correction-bit protocol (libjpeg
    * ordering: bits follow the symbol that crossed their
    * coefficients). Scan-header constraints are enforced (Ss=0 ⇒
    * Se=0; Ss>0 ⇒ single-component scan; Ah>0 ⇒ Al=Ah−1; bands in
    * range). After EOI: dequantize, integer-IDCT, level-shift, clamp
    * — the SAME tail as [[parseJpeg]] — and YCbCr→RGB for color. None
    * for anything malformed or outside the profile — never throws. */
  def parseJpegProgressive(p: Array[Byte]): Option[Multimodal.Raster] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var pos = 2
    var w = -1; var h = -1
    var nf = 0
    val qts = new Array[Array[Array[Int]]](4)
    val dcTs = new Array[HuffTable](4)
    val acTs = new Array[HuffTable](4)
    var compQ: Array[Int] = null
    var compDcT: Array[Int] = null // from each scan header
    var compAcT: Array[Int] = null
    var nBlocks = 0
    // coefficient store: per component, per block, 64 zigzag-indexed
    var coef: Array[Array[Array[Int]]] = null
    val prevDc = new Array[Int](4)
    var sawEoi = false
    while (!sawEoi) {
      if (pos + 2 > p.length) return None
      if (u8(pos) != 0xff) return None
      val m = u8(pos + 1)
      if (m == 0xd9) { sawEoi = true; pos += 2 }
      else {
        if (pos + 4 > p.length) return None
        val len = be16(pos + 2)
        if (len < 2 || pos + 2 + len > p.length) return None
        val seg = pos + 4
        m match {
          case 0xdb =>
            if (len != 2 + 1 + 64 || (u8(seg) >> 4) != 0 || (u8(seg) & 0x0f) > 3)
              return None
            val qt = Array.ofDim[Int](8, 8)
            var k = 0
            while (k < 64) {
              val (r, c) = zigzag(k); qt(r)(c) = u8(seg + 1 + k); k += 1
            }
            qts(u8(seg) & 0x0f) = qt
          case 0xc2 => // SOF2
            if (coef != null) return None // one frame only
            if (len < 2 + 6 || u8(seg) != 8) return None
            h = be16(seg + 1); w = be16(seg + 3)
            nf = u8(seg + 5)
            if ((nf != 1 && nf != 3) || len != 2 + 6 + 3 * nf) return None
            if (w <= 0 || h <= 0 || w % 8 != 0 || h % 8 != 0) return None
            compQ = new Array[Int](nf)
            var ci = 0
            while (ci < nf) {
              if (u8(seg + 7 + 3 * ci) != 0x11) return None // 1×1 only
              val tq = u8(seg + 8 + 3 * ci)
              if (tq > 3) return None
              compQ(ci) = tq
              ci += 1
            }
            nBlocks = (w / 8) * (h / 8)
            coef = Array.fill(nf)(Array.ofDim[Int](nBlocks, 64))
          case 0xc4 =>
            var q = seg
            while (q < pos + 2 + len) {
              val tcth = u8(q)
              if ((tcth >> 4) > 1 || (tcth & 0x0f) > 3) return None
              val bits = Array.tabulate(16)(i => u8(q + 1 + i))
              val n = bits.sum
              if (q + 17 + n > pos + 2 + len || n > 256) return None
              val vals = Array.tabulate(n)(i => u8(q + 17 + i))
              val t = new HuffTable(bits, vals)
              if ((tcth >> 4) == 0) dcTs(tcth & 0x0f) = t
              else acTs(tcth & 0x0f) = t
              q += 17 + n
            }
          case 0xda => // one SCAN: header + entropy data
            if (coef == null) return None // SOS before SOF2
            val ns = u8(seg)
            if (ns < 1 || ns > nf || len != 2 + 1 + 2 * ns + 3) return None
            val scanComp = new Array[Int](ns)
            compDcT = new Array[Int](nf); compAcT = new Array[Int](nf)
            var si = 0
            while (si < ns) {
              val cs = u8(seg + 1 + 2 * si) - 1
              if (cs < 0 || cs >= nf) return None
              scanComp(si) = cs
              val tdta = u8(seg + 2 + 2 * si)
              compDcT(cs) = tdta >> 4; compAcT(cs) = tdta & 0x0f
              if (compDcT(cs) > 3 || compAcT(cs) > 3) return None
              si += 1
            }
            val ss = u8(seg + 1 + 2 * ns)
            val se = u8(seg + 2 + 2 * ns)
            val ahal = u8(seg + 3 + 2 * ns)
            val ah = ahal >> 4; val al = ahal & 0x0f
            // B.2.3 / G.1: DC scans cover exactly [0,0]; AC scans are
            // single-component; a refinement steps Al by one
            if (ss == 0 && se != 0) return None
            if (ss > 0 && (ns != 1 || se < ss || se > 63)) return None
            if (ah != 0 && al != ah - 1) return None
            if (al > 13) return None
            // entropy reader for this scan
            var sp = pos + 2 + len
            var bitBuf = 0; var bitCnt = 0
            var err = false
            def bit(): Int = {
              if (bitCnt == 0) {
                if (sp >= p.length) { err = true; return -1 }
                var byte = u8(sp); sp += 1
                if (byte == 0xff) {
                  if (sp >= p.length) { err = true; return -1 }
                  if (u8(sp) == 0x00) sp += 1
                  else { err = true; return -1 }
                  byte = 0xff
                }
                bitBuf = byte; bitCnt = 8
              }
              bitCnt -= 1
              (bitBuf >> bitCnt) & 1
            }
            def extend(v: Int, sz: Int): Int =
              if (sz == 0) 0 else if (v < (1 << (sz - 1))) v - (1 << sz) + 1 else v
            def recv(sz: Int): Int = {
              var v = 0
              var i = 0
              while (i < sz) { val b0 = bit(); if (err) return 0; v = (v << 1) | b0; i += 1 }
              v
            }
            if (ss == 0) {
              // DC scan over all scan components, interleaved in MCU
              // (= block, all-1×1) order
              if (ah == 0) java.util.Arrays.fill(prevDc, 0)
              var blk = 0
              while (blk < nBlocks) {
                var si2 = 0
                while (si2 < ns) {
                  val c = scanComp(si2)
                  if (ah == 0) {
                    val t = dcTs(compDcT(c))
                    if (t == null) return None
                    val sz = huffDecode(t, bit _)
                    if (err || sz < 0 || sz > 11) return None
                    val diff = extend(recv(sz), sz)
                    if (err) return None
                    prevDc(c) += diff
                    coef(c)(blk)(0) = prevDc(c) << al
                  } else {
                    val b0 = bit()
                    if (err) return None
                    coef(c)(blk)(0) |= b0 << al
                  }
                  si2 += 1
                }
                blk += 1
              }
            } else {
              // AC scan: single component, spectral band [ss, se]
              val c = scanComp(0)
              val cf = coef(c)
              val ac = acTs(compAcT(c))
              if (ac == null) return None
              var eobrun = 0
              if (ah == 0) { // first pass over this band
                var blk = 0
                while (blk < nBlocks) {
                  if (eobrun > 0) eobrun -= 1
                  else {
                    var k = ss
                    var done = false
                    while (!done && k <= se) {
                      val sym = huffDecode(ac, bit _)
                      if (err || sym < 0) return None
                      val run = sym >> 4; val sz = sym & 0x0f
                      if (sz == 0) {
                        if (run == 15) k += 16 // ZRL
                        else {
                          eobrun = (1 << run) + recv(run) - 1
                          if (err) return None
                          done = true
                        }
                      } else {
                        k += run
                        if (k > se) return None
                        val v = extend(recv(sz), sz)
                        if (err) return None
                        cf(blk)(k) = v << al
                        k += 1
                      }
                    }
                    if (k > se + 1) return None // ZRL overran the band
                  }
                  blk += 1
                }
              } else { // refinement pass (G.2, libjpeg ordering)
                val p1 = 1 << al
                val m1 = -1 << al
                @inline def correct(blk: Int, k: Int): Boolean = {
                  val b0 = bit()
                  if (err) return false
                  if (b0 == 1 && (cf(blk)(k) & p1) == 0)
                    cf(blk)(k) += (if (cf(blk)(k) >= 0) p1 else m1)
                  true
                }
                var blk = 0
                while (blk < nBlocks) {
                  if (eobrun > 0) {
                    var k = ss
                    while (k <= se) {
                      if (cf(blk)(k) != 0 && !correct(blk, k)) return None
                      k += 1
                    }
                    eobrun -= 1
                  } else {
                    var k = ss
                    while (k <= se) {
                      val sym = huffDecode(ac, bit _)
                      if (err || sym < 0) return None
                      val run0 = sym >> 4; val sz = sym & 0x0f
                      var newval = 0
                      var r = run0
                      if (sz == 0) {
                        if (run0 != 15) {
                          // EOBn: corrections for the block's tail,
                          // then eobrun-1 further whole blocks
                          eobrun = (1 << run0) + recv(run0)
                          if (err) return None
                          while (k <= se) {
                            if (cf(blk)(k) != 0 && !correct(blk, k)) return None
                            k += 1
                          }
                          eobrun -= 1
                        }
                        // ZRL: fall through with r = 15 (skips 16 zeros)
                      } else {
                        if (sz != 1) return None // refinement codes ±1 only
                        val sb = bit()
                        if (err) return None
                        newval = if (sb == 1) p1 else m1
                      }
                      if (k <= se && (sz != 0 || r == 15)) {
                        var placed = false
                        while (!placed && k <= se) {
                          if (cf(blk)(k) != 0) {
                            if (!correct(blk, k)) return None
                          } else {
                            r -= 1
                            if (r < 0) {
                              if (sz != 0) cf(blk)(k) = newval
                              placed = true
                            }
                          }
                          k += 1
                        }
                        // a ZRL or (run,1) that never lands is malformed
                        if (!placed && (sz != 0 || r >= 0)) return None
                      }
                    }
                  }
                  blk += 1
                }
              }
            }
            // byte-align: the scan's trailing pad bits are discarded
            pos = sp
          case 0xdd => return None // DRI: outside the progressive profile
          case x if x >= 0xc0 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xc2 =>
            return None // any other SOF: not progressive
          case _ => () // APPn / COM: skipped BY LENGTH
        }
        if (m != 0xda) pos += 2 + len
      }
    }
    if (coef == null || w < 0) return None
    var ci = 0
    while (ci < nf) { if (qts(compQ(ci)) == null) return None; ci += 1 }
    // dequantize + IDCT per block — the baseline tail, 1×1 planes
    val planes = Array.tabulate(nf)(_ => new Array[Int](w * h))
    val bw = w / 8
    ci = 0
    while (ci < nf) {
      val qt = qts(compQ(ci))
      var blk = 0
      while (blk < nBlocks) {
        val dq = Array.ofDim[Long](8, 8)
        var k = 0
        while (k < 64) {
          val (r, c) = zigzag(k)
          dq(r)(c) = coef(ci)(blk)(k).toLong * qt(r)(c)
          k += 1
        }
        val px = idctBlock(dq)
        val by = blk / bw; val bx = blk % bw
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            planes(ci)((by * 8 + y) * w + bx * 8 + x) = px(y)(x)
            x += 1
          }
          y += 1
        }
        blk += 1
      }
      ci += 1
    }
    if (nf == 1) {
      val gray = new Array[Byte](w * h)
      var i = 0
      while (i < gray.length) { gray(i) = planes(0)(i).toByte; i += 1 }
      Some(JpegImage(w, h, gray))
    } else {
      @inline def cl(v: Long): Int = math.max(0L, math.min(255L, v)).toInt
      val pix = new Array[Int](w * h)
      var i = 0
      while (i < pix.length) {
        val yy = planes(0)(i).toLong
        val cb = planes(1)(i) - 128L
        val cr = planes(2)(i) - 128L
        val r = cl(yy + ((CrR * cr + 32768L) >> 16))
        val g = cl(yy - ((CbG * cb + CrG * cr + 32768L) >> 16))
        val b = cl(yy + ((CbB * cb + 32768L) >> 16))
        pix(i) = (r << 16) | (g << 8) | b
        i += 1
      }
      Some(ColorJpegImage(w, h, pix))
    }
  }

  /** SOF-type dispatch: walk segments from SOI to the frame header
    * and route — SOF0 → [[parseJpeg]] (baseline), SOF2 →
    * [[parseJpegProgressive]]; any other SOF (or none) is outside the
    * profile. The m18 corpus mixes both framings, so a decoder that
    * assumes one silently loses half the corpus. */
  def parseJpegAuto(p: Array[Byte]): Option[Multimodal.Raster] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var pos = 2
    while (pos + 4 <= p.length) {
      if (u8(pos) != 0xff) return None
      val m = u8(pos + 1)
      if (m == 0xc0) return parseJpeg(p)
      if (m == 0xc2) return parseJpegProgressive(p)
      if (m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
        return None // some other SOF: outside the profile
      if (m == 0xd9 || m == 0xda) return None // no frame header seen
      val len = be16(pos + 2)
      if (len < 2 || pos + 2 + len > p.length) return None
      pos += 2 + len
    }
    None
  }
}
