package graft.operators

/** Hand-written Brotli (RFC 7932) decoder — the web's THIRD
  * Content-Encoding (after gzip and deflate), and the natural sequel
  * to the Inflate and Zstd substrates: Common Crawl response records
  * carry `Content-Encoding: br` routinely, so the WARC read path
  * needs it to complete the coding dispatch.
  *
  * Implements the full stream format: window-size header (large-window
  * extension rejected), the meta-block series (compressed, uncompressed,
  * metadata-skip, empty-last), simple (1–4 symbol) and complex prefix
  * codes (the fixed code-length code via the RFC's 4-bit-peek tables,
  * repeat codes 16/17 with the multiplicative accumulation rule,
  * 32768-space completeness, the single-nonzero-symbol zero-bit form),
  * block switching for all three categories (type codes with the
  * previous/next semantics, the 26-symbol block-count alphabet),
  * context maps with run-length zero coding and inverse move-to-front,
  * the 704-symbol insert-and-copy command alphabet, NPOSTFIX/NDIRECT
  * distance decoding, the four-slot distance ring buffer with ±1..3
  * forms, and overlap-correct window copies.
  *
  * FULL RFC 7932 (round 16 — rounds 15's profile boundary is CLOSED):
  * all four literal context modes (LSB6/MSB6/UTF8/Signed through the
  * spec's 2,048-byte context lookup, [[BrotliTables.contextLut]]) and
  * STATIC DICTIONARY references — the 122,784-byte word blob, the
  * NDBITS word-count layout, and all 121 word transformations
  * (omit-first/omit-last, ferment-first/ferment-all with the spec's
  * multi-byte ferment steps, prefix/suffix attachment) per §8. The
  * spec data tables live in [[BrotliTables]] (CRC-pinned), and the
  * certificate is no longer self-referential: BrotliSpec decodes 87
  * streams produced by the REAL brotli encoder (library v1.2.0,
  * qualities 0–11, text/generic/font modes, window 10–24, inputs from
  * prose to UTF-8 multilingual to binary) byte-exactly — those
  * streams carry dictionary references, UTF8/Signed context modeling,
  * block splitting and NPOSTFIX distances as real encoders emit them.
  * The one remaining rejection is the large-window EXTENSION
  * (WBITS > 24), which is outside RFC 7932 itself. Inputs whose bit
  * count would overflow the Int bit cursor (≥ 2^28 bytes) are
  * rejected by an explicit guard, not an overflow artifact.
  *
  * [[compress]] is the fixture half: a conforming greedy-LZ encoder
  * (flat literal code, real canonical Huffman command/distance codes
  * written through the repeat-coded code-length machinery, distance
  * ring reuse, uncompressed, metadata and last-metadata meta-blocks,
  * UTF8-context two-tree literal coding, and static-dictionary
  * references on rotating variants) whose output exercises every
  * decoder arm on the oracle-certified t31/e19 path. BrotliSpec
  * round-trips the pair, pins the reference encoder's known
  * empty-stream bytes (0x3B, and the WBITS=16 form 0x06), and
  * rejects a malformation per structural layer. `None` on ANY
  * malformation — never throws.
  */
object Brotli {

  private object Bad extends scala.util.control.ControlThrowable

  // ---- LSB-first bit reader -----------------------------------------------
  private final class Bits(buf: Array[Byte], val end: Int) {
    var pos = 0 // absolute bit position
    def endBits: Int = end * 8
    def bad(): Nothing = throw Bad
    def bit(): Int = {
      val byteI = pos >> 3
      if (byteI >= end) bad()
      val v = ((buf(byteI) & 0xff) >> (pos & 7)) & 1
      pos += 1
      v
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
    /** 4-bit zero-padded peek (the fixed code-length code's index). */
    def peek4: Int = {
      var v = 0
      var i = 0
      while (i < 4) {
        val p = pos + i
        val byteI = p >> 3
        if (byteI < end) v |= (((buf(byteI) & 0xff) >> (p & 7)) & 1) << i
        i += 1
      }
      v
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7
    def bytePos: Int = pos >> 3
    def byteAligned: Boolean = (pos & 7) == 0
  }

  // ---- canonical prefix code (DEFLATE bit packing, RFC 7932 §3.2) --------
  private final class Huff(lengths: Array[Int]) {
    // single-symbol zero-bit form (simple NSYM=1 or one nonzero length)
    val single: Int = {
      var s = -1; var n = 0; var i = 0
      while (i < lengths.length) {
        if (lengths(i) != 0) { n += 1; s = i }
        i += 1
      }
      if (n == 1) s else -1
    }
    val bad: Boolean = {
      var kraft = 0L
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > 15) kraft = Long.MaxValue
        else if (l > 0) kraft += (1L << (15 - l))
        i += 1
      }
      single < 0 && kraft != (1L << 15) // complete codes only
    }
    private val cnt = new Array[Int](16)
    private val syms: Array[Int] = {
      lengths.foreach(l => if (l > 0) cnt(l) += 1)
      val off = new Array[Int](16)
      var i = 1
      while (i < 15) { off(i + 1) = off(i) + cnt(i); i += 1 }
      val s = new Array[Int](lengths.count(_ > 0))
      i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l > 0) { s(off(l)) = i; off(l) += 1 }
        i += 1
      }
      s
    }
    def decode(br: Bits): Int = {
      if (single >= 0) return single
      var code = 0; var first = 0; var index = 0; var len = 0
      while (len < 15) {
        len += 1
        code = (code << 1) | br.bit()
        val c = cnt(len)
        if (code - first < c) return syms(index + code - first)
        index += c
        first = (first + c) << 1
      }
      throw Bad
    }
  }

  // ---- fixed tables --------------------------------------------------------
  private val ctxLut = BrotliTables.contextLut
  // code-length-code order and its fixed 4-bit-peek prefix code (§3.5)
  private val clOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)
  // the fixed code: 0="00", 3="01", 4="10", 2="110", 1="1110", 5="1111"
  private val clPrefixLen = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val clPrefixVal = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)

  // insert-length codes (§5.2)
  private[operators] val insBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26,
    34, 50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private[operators] val insExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  // copy-length codes (§5.2)
  private[operators] val cpyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18,
    22, 30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private[operators] val cpyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2,
    3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  // the 11 command ranges (§5): rangeIdx ≥ 2 reads an explicit distance
  private val insRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val cpyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)
  // block-count codes (§6)
  private val blkBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113,
    145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)
  private val blkExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5,
    6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  private def alphabetBits(size: Int): Int =
    32 - Integer.numberOfLeadingZeros(size - 1) // log2floor(size-1)+1

  // ---- prefix-code reading (§3.4 / §3.5) ----------------------------------
  private def readPrefixCode(br: Bits, alphabet: Int): Huff = {
    val kind = br.read(2)
    if (kind == 1) { // simple code
      val nsym = br.read(2) + 1
      val bits = alphabetBits(alphabet)
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        syms(i) = br.read(bits)
        if (syms(i) >= alphabet) throw Bad
        var j = 0
        while (j < i) { if (syms(j) == syms(i)) throw Bad; j += 1 }
        i += 1
      }
      val lengths = new Array[Int](alphabet)
      nsym match {
        case 1 => lengths(syms(0)) = 1 // Huff treats the one symbol as 0-bit
        case 2 => lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case _ =>
          if (br.bit() == 0) syms.foreach(lengths(_) = 2)
          else {
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          }
      }
      val h = new Huff(lengths)
      if (h.bad) throw Bad
      h
    } else { // complex code; kind = HSKIP (0, 2 or 3)
      val clLens = new Array[Int](18)
      var clSpace = 32
      var numCl = 0
      var i = kind
      while (i < 18 && clSpace > 0) {
        val idx = br.peek4
        val l = clPrefixLen(idx)
        val v = clPrefixVal(idx)
        br.pos += l
        clLens(clOrder(i)) = v
        if (v != 0) { clSpace -= 32 >> v; numCl += 1 }
        i += 1
      }
      if (!(numCl == 1 || clSpace == 0)) throw Bad
      if (br.pos > br.endBits) throw Bad // zero-padded peek past truncation
      val clHuff = new Huff(clLens)
      if (clHuff.bad) throw Bad
      // symbol code lengths with repeat codes 16/17 (§3.5)
      val lengths = new Array[Int](alphabet)
      var space = 32768
      var prevNonZero = 8
      var repeat = 0
      var repeatLen = 0
      var sym = 0
      var nonzero = 0
      while (sym < alphabet && space > 0) {
        val cl = clHuff.decode(br)
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          repeat = 0
          if (cl != 0) {
            prevNonZero = cl
            space -= 32768 >> cl
            nonzero += 1
          }
        } else {
          val extraBits = cl - 14 // 2 for 16, 3 for 17
          val newLen = if (cl == 16) prevNonZero else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val oldRepeat = repeat
          if (repeat > 0) repeat = (repeat - 2) << extraBits
          repeat += br.read(extraBits) + 3
          val delta = repeat - oldRepeat
          if (sym + delta > alphabet) throw Bad
          var k = 0
          while (k < delta) { lengths(sym) = repeatLen; sym += 1; k += 1 }
          if (repeatLen != 0) {
            space -= delta << (15 - repeatLen)
            nonzero += delta
          }
        }
      }
      if (space != 0 && nonzero != 1) throw Bad // must be complete
      val h = new Huff(lengths)
      if (h.bad) throw Bad
      h
    }
  }

  // ---- small helpers -------------------------------------------------------
  /** §9.2's variable-length 8-bit value (block-type and tree counts). */
  private def varLenUint8(br: Bits): Int =
    if (br.bit() == 0) 0
    else {
      val n = br.read(3)
      if (n == 0) 1 else br.read(n) + (1 << n)
    }

  private def readBlockCount(br: Bits, h: Huff): Int = {
    val s = h.decode(br)
    if (s >= 26) throw Bad
    blkBase(s) + br.read(blkExtra(s))
  }

  private def inverseMtf(v: Array[Int]): Unit = {
    val mtf = Array.tabulate(256)(identity)
    var i = 0
    while (i < v.length) {
      val idx = v(i)
      val value = mtf(idx)
      v(i) = value
      var k = idx
      while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
      mtf(0) = value
      i += 1
    }
  }

  /** Context map (§7.3): `size` entries over trees 0..ntrees-1. */
  private def readContextMap(br: Bits, size: Int, ntrees: Int): Array[Int] = {
    val cmap = new Array[Int](size)
    if (ntrees == 1) return cmap
    val rleMax = if (br.bit() == 1) br.read(4) + 1 else 0
    val h = readPrefixCode(br, ntrees + rleMax)
    var i = 0
    while (i < size) {
      val s = h.decode(br)
      if (s == 0) { cmap(i) = 0; i += 1 }
      else if (s <= rleMax) {
        val run = (1 << s) + br.read(s)
        if (i + run > size) throw Bad
        i += run // zeros
      } else {
        cmap(i) = s - rleMax
        i += 1
      }
    }
    if (br.bit() == 1) inverseMtf(cmap)
    cmap
  }

  /** Per-category block-switching state (§6). */
  private final class BlockState(val ntypes: Int, val typeHuff: Huff,
                                 val countHuff: Huff, var count: Int) {
    var cur = 0
    var prev = 1
    def switch(br: Bits): Unit = {
      val s = typeHuff.decode(br)
      val next = s match {
        case 0 => prev
        case 1 => (cur + 1) % ntypes
        case _ =>
          if (s - 2 >= ntypes) throw Bad
          s - 2
      }
      prev = cur
      cur = next
      count = readBlockCount(br, countHuff)
    }
  }

  private def readBlockHeader(br: Bits): BlockState = {
    val ntypes = varLenUint8(br) + 1
    if (ntypes > 1) {
      val tHuff = readPrefixCode(br, ntypes + 2)
      val cHuff = readPrefixCode(br, 26)
      new BlockState(ntypes, tHuff, cHuff, readBlockCount(br, cHuff))
    } else new BlockState(1, null, null, Int.MaxValue)
  }

  /** §8 word transformation: prefix ++ ferment/omit(word) ++ suffix.
    * Ferment steps 1 byte below 0xC0 (XOR 32 on a-z), 2 bytes below
    * 0xE0 (XOR 32 on the second), else 3 (XOR 5 on the third); a step
    * whose mutated byte falls past the word's end leaves it unchanged
    * (the reference applies the ferment before the suffix is attached,
    * so such writes are overwritten — same visible behavior). */
  private def dictWord(tId: Int, woff: Int, len: Int): Array[Byte] = {
    val t = BrotliTables.transforms(tId)
    val dic = BrotliTables.dictionary
    var off = woff
    var n = len
    val op = t.op
    if (op >= 12) { val skip = math.min(op - 11, n); off += skip; n -= skip }
    else if (op >= 1 && op <= 9) n = math.max(0, n - op)
    val w = new Array[Byte](n)
    System.arraycopy(dic, off, w, 0, n)
    // ferment-first (10) / ferment-all (11)
    @inline def fermentAt(i: Int): Int = {
      val b = w(i) & 0xff
      if (b < 0xc0) {
        if (b >= 'a' && b <= 'z') w(i) = (b ^ 32).toByte
        1
      } else if (b < 0xe0) {
        if (i + 1 < n) w(i + 1) = (w(i + 1) ^ 32).toByte
        2
      } else {
        if (i + 2 < n) w(i + 2) = (w(i + 2) ^ 5).toByte
        3
      }
    }
    if (op == 10) { if (n > 0) fermentAt(0) }
    else if (op == 11) {
      var i = 0
      while (i < n) i += fermentAt(i)
    }
    val pre = t.prefixBytes
    val suf = t.suffixBytes
    val out = new Array[Byte](pre.length + n + suf.length)
    System.arraycopy(pre, 0, out, 0, pre.length)
    System.arraycopy(w, 0, out, pre.length, n)
    System.arraycopy(suf, 0, out, pre.length + n, suf.length)
    out
  }

  // ---- decoder -------------------------------------------------------------
  /** Decode one complete brotli stream that must exactly tile `p`
    * (padding bits in the final byte excepted, per the RFC). None on
    * any malformation or out-of-profile feature (see the object
    * scaladoc); `maxOut` bounds the decompressed allocation. */
  def decompress(p: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] =
    try Some(decode0(p, maxOut)) catch {
      case Bad => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def decode0(p: Array[Byte], maxOut: Int): Array[Byte] = {
    def bad(): Nothing = throw Bad
    if (maxOut < 0) bad()
    // Bits.pos is an Int of absolute bit positions: inputs at or past
    // 2^28 bytes (2^31 bits) are rejected deliberately, not by
    // overflow (maxOut bounds output, not input)
    if (p.length >= (1 << 28)) bad()
    val br = new Bits(p, p.length)
    // WBITS (§9.1)
    val wbits =
      if (br.bit() == 0) 16
      else {
        val n = br.read(3)
        if (n != 0) 17 + n
        else {
          val m = br.read(3)
          if (m == 1) bad() // large-window extension: out of profile
          else if (m != 0) 8 + m
          else 17
        }
      }
    val windowSize = (1 << wbits) - 16

    var out = new Array[Byte](math.min(maxOut, 4096))
    var outLen = 0
    @inline def ensure(n: Int): Unit = {
      if (n < 0 || n > maxOut) bad()
      if (n > out.length) {
        val cap = math.min(maxOut.toLong,
          math.max(out.length.toLong * 2, n.toLong)).toInt
        out = java.util.Arrays.copyOf(out, cap)
      }
    }

    // initial last distances (§4): the spec lists them fourth-last to
    // last, so the LAST distance (code 0) starts at 4 — pinned by the
    // real-encoder fixtures (a reversed ring decodes self-round-trips
    // fine but drifts on real streams)
    val ring = Array(4, 11, 15, 16)
    var isLast = false
    while (!isLast) {
      isLast = br.bit() == 1
      if (isLast && br.bit() == 1) { // ISLASTEMPTY
        // stream ends; only pad bits in the final byte may remain
        br.alignByte()
        if (br.bytePos != p.length) bad()
        return java.util.Arrays.copyOf(out, outLen)
      }
      val mnibbles = br.read(2) match {
        case 3 => 0
        case n => n + 4
      }
      if (mnibbles == 0) { // metadata meta-block (§9.2; ISLAST allowed)
        if (br.bit() != 0) bad() // reserved bit
        val skipBytes = br.read(2)
        var skipLen = 0
        var k = 0
        while (k < skipBytes) { skipLen |= br.read(8) << (8 * k); k += 1 }
        if (skipBytes > 1 && (skipLen >> (8 * (skipBytes - 1))) == 0) bad()
        if (skipBytes > 0) skipLen += 1
        br.alignByte()
        if (br.bytePos + skipLen > p.length) bad()
        br.pos += skipLen * 8
      } else {
        var mlen = 0
        var k = 0
        while (k < mnibbles) { mlen |= br.read(4) << (4 * k); k += 1 }
        if (mnibbles > 4 && (mlen >> (4 * (mnibbles - 1))) == 0) bad()
        mlen += 1
        val uncompressed = !isLast && br.bit() == 1
        if (uncompressed) {
          br.alignByte()
          val bp = br.bytePos
          if (bp + mlen > p.length) bad()
          ensure(outLen + mlen)
          System.arraycopy(p, bp, out, outLen, mlen)
          outLen += mlen
          br.pos += mlen * 8
        } else {
          // ---- compressed meta-block header (§9.3) --------------------
          val blkL = readBlockHeader(br)
          val blkI = readBlockHeader(br)
          val blkD = readBlockHeader(br)
          val npostfix = br.read(2)
          val ndirect = br.read(4) << npostfix
          val postfixMask = (1 << npostfix) - 1
          val cmodes = new Array[Int](blkL.ntypes)
          var i = 0
          while (i < blkL.ntypes) { cmodes(i) = br.read(2); i += 1 }
          val ntreesL = varLenUint8(br) + 1
          val cmapL = readContextMap(br, 64 * blkL.ntypes, ntreesL)
          val ntreesD = varLenUint8(br) + 1
          val cmapD = readContextMap(br, 4 * blkD.ntypes, ntreesD)
          val litHuffs = Array.fill(ntreesL)(readPrefixCode(br, 256))
          val cmdHuffs = Array.fill(blkI.ntypes)(readPrefixCode(br, 704))
          val distAlphabet = 16 + ndirect + (48 << npostfix)
          val distHuffs = Array.fill(ntreesD)(readPrefixCode(br, distAlphabet))

          // ---- command loop (§9.3 step 12) -----------------------------
          var produced = 0
          while (produced < mlen) {
            if (blkI.count == 0) blkI.switch(br)
            blkI.count -= 1
            val cmd = cmdHuffs(blkI.cur).decode(br)
            var rangeIdx = cmd >> 6
            var implicitZero = false
            if (rangeIdx >= 2) rangeIdx -= 2 else implicitZero = true
            val insCode = insRangeLut(rangeIdx) + ((cmd >> 3) & 7)
            val cpyCode = cpyRangeLut(rangeIdx) + (cmd & 7)
            val insLen = insBase(insCode) + br.read(insExtra(insCode))
            val cpyLen = cpyBase(cpyCode) + br.read(cpyExtra(cpyCode))
            // insert literals
            if (produced + insLen > mlen) bad()
            ensure(outLen + insLen)
            var li = 0
            while (li < insLen) {
              if (blkL.count == 0) blkL.switch(br)
              blkL.count -= 1
              val p1 = if (outLen > 0) out(outLen - 1) & 0xff else 0
              val p2 = if (outLen > 1) out(outLen - 2) & 0xff else 0
              // §7.1: all four modes through the spec's lookup table —
              // 512 bytes per mode (256 for p1, 256 for p2), OR-combined
              val lutOff = cmodes(blkL.cur) << 9
              val ctx = (ctxLut(lutOff + p1) | ctxLut(lutOff + 256 + p2)) & 0xff
              val tree = cmapL(64 * blkL.cur + ctx)
              if (tree >= ntreesL) bad()
              val lit = litHuffs(tree).decode(br)
              out(outLen) = lit.toByte
              outLen += 1
              li += 1
            }
            produced += insLen
            if (produced == mlen) {
              // the copy part of the final command is ignored (§9.3)
            } else {
              // distance
              var distance = 0
              var dcode = 0
              if (implicitZero) {
                distance = ring(0)
              } else {
                if (blkD.count == 0) blkD.switch(br)
                blkD.count -= 1
                val ctx = math.min(cpyLen, 5) - 2 // §7.2
                val tree = cmapD(4 * blkD.cur + ctx)
                if (tree >= ntreesD) bad()
                dcode = distHuffs(tree).decode(br)
                if (dcode < 16) {
                  distance = dcode match {
                    case 0 => ring(0)
                    case 1 => ring(1)
                    case 2 => ring(2)
                    case 3 => ring(3)
                    case _ =>
                      val idx = if (dcode < 10) 0 else 1
                      val delta = ((dcode - 4 - idx * 6) >> 1) + 1
                      val sign = if (((dcode - 4) & 1) == 0) -1 else 1
                      ring(idx) + sign * delta
                  }
                  if (distance <= 0) bad()
                } else if (dcode < 16 + ndirect) {
                  distance = dcode - 15
                } else {
                  val x = dcode - ndirect - 16
                  val hcode = x >> npostfix
                  val lcode = x & postfixMask
                  val n = 1 + (hcode >> 1)
                  val offset = ((2 + (hcode & 1)) << n) - 4
                  distance = ((offset + br.read(n)) << npostfix) +
                    lcode + ndirect + 1
                }
              }
              val maxDist = math.min(windowSize, outLen)
              if (distance > maxDist) {
                // static dictionary reference (§8): the word id selects
                // (index within the length bucket, transform id); the
                // ring is NOT updated for dictionary references (§4)
                if (cpyLen < 4 || cpyLen > 24) bad()
                val sizeBits = BrotliTables.sizeBitsByLength(cpyLen)
                val wordId = distance - maxDist - 1
                val index = wordId & ((1 << sizeBits) - 1)
                val tId = wordId >>> sizeBits
                if (tId >= 121) bad()
                val word = dictWord(tId,
                  BrotliTables.offsetByLength(cpyLen) + cpyLen * index, cpyLen)
                if (produced + word.length > mlen) bad()
                ensure(outLen + word.length)
                System.arraycopy(word, 0, out, outLen, word.length)
                outLen += word.length
                produced += word.length
              } else {
                // ring update: not for distance code 0 (explicit or
                // implied) and not for dictionary references
                if (!implicitZero && dcode != 0) {
                  ring(3) = ring(2); ring(2) = ring(1)
                  ring(1) = ring(0); ring(0) = distance
                }
                if (produced + cpyLen > mlen) bad()
                ensure(outLen + cpyLen)
                var src = outLen - distance
                var k2 = 0
                while (k2 < cpyLen) {
                  out(outLen) = out(src)
                  outLen += 1; src += 1; k2 += 1
                }
                produced += cpyLen
              }
            }
          }
        }
      }
    }
    br.alignByte()
    if (br.bytePos != p.length) bad()
    java.util.Arrays.copyOf(out, outLen)
  }

  // ======================= encoder (fixture half) ===========================
  // A conforming greedy-LZ encoder whose streams exercise every decoder
  // arm the profile certifies: flat-8 literal code written through the
  // repeat-coded code-length machinery, real canonical Huffman command
  // and distance codes (simple form when ≤4 symbols, complex with
  // 16/17 chains otherwise), ring-distance reuse (codes 0–3),
  // uncompressed meta-blocks, metadata-skip blocks, and the empty-last
  // terminator. NBLTYPES = 1 and NTREES = 1 throughout (the block- and
  // context-switching arms are certified by crafted streams in
  // BrotliSpec, not the fixture).

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = { // LSB-first
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i += 1
      }
    }
    def putCode(code: Int, len: Int): Unit = { // MSB of the code first
      var i = len - 1
      while (i >= 0) { put((code >> i) & 1, 1); i -= 1 }
    }
    def alignByte(): Unit = if (nbits > 0) { buf += cur.toByte; cur = 0; nbits = 0 }
    def putRaw(b: Array[Byte], off: Int, len: Int): Unit = {
      require(nbits == 0)
      var i = 0
      while (i < len) { buf += b(off + i); i += 1 }
    }
    def finish(): Array[Byte] = { alignByte(); buf.toArray }
  }

  /** Canonical complete prefix-code lengths from frequencies (Huffman
    * via two-queue merge; quasi-balanced fallback if a depth exceeds
    * `maxLen`). Exactly one used symbol → length 1 (callers emit that
    * through the simple form or the single-nonzero complex rule). */
  private def huffLengths(freq: Array[Int], maxLen: Int): Array[Int] = {
    val lengths = new Array[Int](freq.length)
    val used = freq.indices.filter(freq(_) > 0)
    if (used.isEmpty) return lengths
    if (used.size == 1) { lengths(used.head) = 1; return lengths }
    final case class Node(w: Long, syms: List[Int])
    val pq = scala.collection.mutable.PriorityQueue.empty[Node](Ordering.by(-_.w))
    used.foreach(s => pq.enqueue(Node(freq(s).toLong, s :: Nil)))
    val depth = new Array[Int](freq.length)
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      val all = a.syms ::: b.syms
      all.foreach(depth(_) += 1)
      pq.enqueue(Node(a.w + b.w, all))
    }
    if (used.forall(depth(_) <= maxLen)) used.foreach(s => lengths(s) = depth(s))
    else {
      // complete quasi-balanced code: n1 symbols at l-1, rest at l
      val k = used.size
      val l = 32 - Integer.numberOfLeadingZeros(k - 1)
      require(l <= maxLen, "alphabet too large for depth cap")
      val n1 = (1 << l) - k
      val byFreq = used.sortBy(s => (-freq(s), s))
      byFreq.zipWithIndex.foreach { case (s, i) =>
        lengths(s) = if (i < n1) l - 1 else l
      }
    }
    lengths
  }

  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lengths.length)
    val cnt = new Array[Int](16)
    lengths.foreach(l => if (l > 0) cnt(l) += 1)
    val next = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= 15) { code = (code + cnt(l - 1)) << 1; next(l) = code; l += 1 }
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) { codes(s) = next(lengths(s)); next(lengths(s)) += 1 }
      s += 1
    }
    codes
  }

  /** Repeat-code chain extras reaching EXACTLY a run of `L` (≥ 3):
    * r₁ = 3+e, rₖ₊₁ = factor·(rₖ−2)+3+e — the decoder's accumulation. */
  private def chainExtras(L: Int, factor: Int, m: Int): List[Int] =
    if (L <= 3 + m) List(L - 3)
    else {
      val rm2 = (L - 3 - m + factor - 1) / factor
      val e = L - 3 - factor * rm2
      chainExtras(2 + rm2, factor, m) :+ e
    }

  /** Emit one prefix code for `lengths` (complete, or one symbol). */
  private def writePrefixCode(bw: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.indices.filter(lengths(_) > 0)
    val bits = alphabetBits(lengths.length)
    if (used.size <= 4 && used.nonEmpty) { // simple form
      bw.put(1, 2)
      bw.put(used.size - 1, 2)
      val order: Seq[Int] = used.size match {
        case 1 | 2 => used.sorted
        case 3 =>
          val s1 = used.minBy(lengths(_)) // the length-1 symbol
          s1 +: used.filterNot(_ == s1).sorted
        case _ =>
          if (used.forall(lengths(_) == 2)) used.sorted
          else used.sortBy(s => (lengths(s), s)) // (1,2,3,3), 3s ascending
      }
      order.foreach(bw.put(_, bits))
      if (used.size == 4)
        bw.put(if (used.forall(lengths(_) == 2)) 0 else 1, 1)
      return
    }
    bw.put(0, 2) // complex, HSKIP = 0
    // tokenize the length array (up to its last nonzero symbol)
    val lastNz = used.max
    final case class Tok(kind: Int, extra: Int, extraBits: Int)
    val toks = new scala.collection.mutable.ArrayBuffer[Tok]()
    var i = 0
    while (i <= lastNz) {
      val v = lengths(i)
      var run = 1
      while (i + run <= lastNz && lengths(i + run) == v) run += 1
      if (v == 0) {
        if (run < 3) (0 until run).foreach(_ => toks += Tok(0, 0, 0))
        else chainExtras(run, 8, 7).foreach(e => toks += Tok(17, e, 3))
      } else {
        toks += Tok(v, 0, 0)
        val rem = run - 1
        if (rem > 0) {
          if (rem < 3) (0 until rem).foreach(_ => toks += Tok(v, 0, 0))
          else chainExtras(rem, 4, 3).foreach(e => toks += Tok(16, e, 2))
        }
      }
      i += run
    }
    // code-length code over the token kinds, depth ≤ 5
    val clFreq = new Array[Int](18)
    toks.foreach(t => clFreq(t.kind) += 1)
    val clLens = huffLengths(clFreq, 5)
    val clCodes = canonicalCodes(clLens)
    // fixed 4-bit-peek code for the cl lengths: value -> (bits, len)
    val fixedBits = Array(0, 7, 3, 2, 1, 15)
    val fixedLen = Array(2, 4, 3, 2, 2, 4)
    var clSpace = 32
    var oi = 0
    while (oi < 18 && clSpace > 0) {
      val v = clLens(clOrder(oi))
      bw.put(fixedBits(v), fixedLen(v))
      if (v != 0) clSpace -= 32 >> v
      oi += 1
    }
    // token stream
    toks.foreach { t =>
      bw.putCode(clCodes(t.kind), clLens(t.kind))
      if (t.extraBits > 0) bw.put(t.extra, t.extraBits)
    }
  }

  private def insCodeOf(len: Int): Int = {
    var c = 23
    while (c > 0 && insBase(c) > len) c -= 1
    c
  }
  private def cpyCodeOf(len: Int): Int = {
    var c = 23
    while (c > 0 && cpyBase(c) > len) c -= 1
    c
  }
  private val riLut = Map((0, 0) -> 0, (0, 1) -> 1, (1, 0) -> 2, (1, 1) -> 3,
    (0, 2) -> 4, (2, 0) -> 5, (1, 2) -> 6, (2, 1) -> 7, (2, 2) -> 8)
  private def cmdSymbol(insCode: Int, cpyCode: Int): Int =
    ((riLut((insCode >> 3, cpyCode >> 3)) + 2) << 6) |
      ((insCode & 7) << 3) | (cpyCode & 7)

  private final case class Cmd(litStart: Int, litLen: Int, cpyLen: Int,
                               dist: Int, dictIdx: Int = -1)

  /** Static-dictionary words of length 4..8 → index, for the fixture
    * encoder's dictionary-reference variant (Identity transform). */
  private lazy val dictIndex: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](16384)
    var len = 4
    while (len <= 8) {
      val n = 1 << BrotliTables.sizeBitsByLength(len)
      val base = BrotliTables.offsetByLength(len)
      var i = 0
      while (i < n) {
        m.put(new String(BrotliTables.dictionary, base + len * i, len,
          "ISO-8859-1"), i)
        i += 1
      }
      len += 1
    }
    m
  }

  /** Encode `raw` as one brotli stream. `variant` rotates stream
    * shapes: metadata-skip block (v%3==1), uncompressed meta-blocks
    * interleaved (v%4==2), UTF8 context mode with TWO literal trees
    * split on the spec's context value (v%5==2, certifying the §7.1
    * lookup on the oracle path), static-dictionary references
    * (v%7==3, certifying §8 word lookup on the oracle path), a LAST
    * metadata meta-block ending the stream (v%9==5), context-mode
    * bit when single-tree (v%2). */
  def compress(raw: Array[Byte], variant: Long = 0): Array[Byte] = {
    val bw = new BitWriter
    bw.put(1, 1); bw.put(5, 3) // WBITS = 22
    val window = (1 << 22) - 16
    val useUtf8Ctx = variant % 5 == 2
    val useDict = variant % 7 == 3
    if (variant % 3 == 1) { // metadata-skip meta-block
      val meta = s"graft-meta-$variant".getBytes("UTF-8")
      bw.put(0, 1) // ISLAST
      bw.put(3, 2) // MNIBBLES code 3: metadata
      bw.put(0, 1) // reserved
      bw.put(1, 2) // MSKIPBYTES = 1
      bw.put(meta.length - 1, 8) // MSKIPLEN - 1
      bw.alignByte()
      bw.putRaw(meta, 0, meta.length)
    }
    // greedy LZ over the whole input; 4-byte hash, last position wins
    val table = new Array[Int](1 << 16)
    java.util.Arrays.fill(table, -1)
    @inline def hash(i: Int): Int = {
      val v = (raw(i) & 0xff) | ((raw(i + 1) & 0xff) << 8) |
        ((raw(i + 2) & 0xff) << 16) | ((raw(i + 3) & 0xff) << 24)
      (v * 0x9e3779b1) >>> 16
    }
    var segStart = 0
    var segIdx = 0
    // mirror of the decoder's distance ring (last distance first)
    val ring = Array(4, 11, 15, 16)
    while (segStart < raw.length) {
      val segLen = math.min(50000, raw.length - segStart)
      val segEnd = segStart + segLen
      if (variant % 4 == 2 && segIdx % 2 == 1) { // uncompressed meta-block
        bw.put(0, 1) // ISLAST
        bw.put(0, 2) // 4 nibbles
        bw.put(segLen - 1, 16)
        bw.put(1, 1) // ISUNCOMPRESSED
        bw.alignByte()
        bw.putRaw(raw, segStart, segLen)
        var i = segStart
        while (i + 4 <= segEnd) { table(hash(i)) = i; i += 1 }
      } else {
        // parse the segment into commands
        val cmds = new scala.collection.mutable.ArrayBuffer[Cmd]()
        var i = segStart
        var litStart = segStart
        while (i < segEnd) {
          var take = 0
          var dist = 0
          if (i + 4 <= segEnd) {
            val h = hash(i)
            val j = table(h)
            if (j >= 0 && i - j <= window - 16) {
              var l = 0
              val cap = segEnd - i
              while (l < cap && raw(j + l) == raw(i + l)) l += 1
              if (l >= 4) { take = l; dist = i - j }
            }
            table(h) = i
          }
          var dictIdx = -1
          if (take == 0 && useDict && i + 4 <= segEnd) {
            // try the static dictionary (longest of lengths 8..4)
            var len = math.min(8, segEnd - i)
            while (len >= 4 && dictIdx < 0) {
              val hit = dictIndex.get(new String(raw, i, len, "ISO-8859-1"))
              if (hit ne null) { dictIdx = hit.intValue; take = len }
              else len -= 1
            }
          }
          if (take > 0) {
            cmds += Cmd(litStart, i - litStart, take, dist, dictIdx)
            var k = i + 1
            val stop = math.min(i + take, segEnd - 4)
            while (k < stop) { table(hash(k)) = k; k += 1 }
            i += take
            litStart = i
          } else i += 1
        }
        if (litStart < segEnd) cmds += Cmd(litStart, segEnd - litStart, 0, 0)
        // meta-block header
        bw.put(0, 1) // ISLAST
        bw.put(0, 2) // 4 nibbles
        bw.put(segLen - 1, 16)
        bw.put(0, 1) // ISUNCOMPRESSED = 0
        bw.put(0, 1); bw.put(0, 1); bw.put(0, 1) // NBLTYPES L/I/D = 1
        bw.put(0, 2) // NPOSTFIX = 0
        bw.put(0, 4) // NDIRECT = 0
        if (useUtf8Ctx) {
          bw.put(2, 2) // context mode UTF8
          bw.put(1, 1); bw.put(0, 3) // NTREESL = 2 (varlen value 1)
          // context map: trees split on context value (ctx >= 32 →
          // tree 1); no RLE, simple 2-symbol code, no inverse MTF
          bw.put(0, 1) // RLEMAX absent
          bw.put(1, 2); bw.put(1, 2) // simple code, NSYM = 2
          bw.put(0, 1); bw.put(1, 1) // symbols 0, 1 (1-bit alphabet)
          var cm = 0
          while (cm < 64) { bw.put(if (cm >= 32) 1 else 0, 1); cm += 1 }
          bw.put(0, 1) // IMTF = 0
        } else {
          bw.put((variant % 2).toInt, 2) // context mode (irrelevant: 1 tree)
          bw.put(0, 1) // NTREESL = 1
        }
        bw.put(0, 1) // NTREESD = 1
        // resolve distance symbols against the ring (decoder's model);
        // dictionary references encode explicitly and never push (§4)
        val distSyms = new Array[Int](cmds.length)
        val distExtra = new Array[(Int, Int)](cmds.length)
        @inline def explicitForm(ci: Int, d: Int): Int = {
          val big = d + 3
          val n = 31 - Integer.numberOfLeadingZeros(big) - 1
          val h = (big >> n) - 2
          distExtra(ci) = (big - ((2 + h) << n), n)
          16 + 2 * (n - 1) + h
        }
        var ci = 0
        while (ci < cmds.length) {
          val c = cmds(ci)
          val isFinalNoCopy = c.cpyLen == 0
          if (c.dictIdx >= 0) {
            // distance past the window selects word (index, Identity)
            val pos = c.litStart + c.litLen
            distSyms(ci) = explicitForm(ci, math.min(window, pos) + 1 + c.dictIdx)
          } else if (!isFinalNoCopy) {
            val d = c.dist
            val sym =
              if (d == ring(0)) 0
              else if (d == ring(1)) 1
              else if (d == ring(2)) 2
              else if (d == ring(3)) 3
              else explicitForm(ci, d)
            if (sym != 0) { // ring codes 1..3 and explicit forms push
              ring(3) = ring(2); ring(2) = ring(1)
              ring(1) = ring(0); ring(0) = d
            }
            distSyms(ci) = sym
            if (sym < 16) distExtra(ci) = (0, 0)
          } else distSyms(ci) = -1
          ci += 1
        }
        // histograms → prefix codes
        val cmdFreq = new Array[Int](704)
        val dstFreq = new Array[Int](64)
        cmds.zipWithIndex.foreach { case (c, k) =>
          val ins = insCodeOf(c.litLen)
          val cpy = if (c.cpyLen == 0) 0 else cpyCodeOf(c.cpyLen)
          cmdFreq(cmdSymbol(ins, cpy)) += 1
          if (distSyms(k) >= 0) dstFreq(distSyms(k)) += 1
        }
        if (!dstFreq.exists(_ > 0)) dstFreq(0) = 1 // header needs one code
        // literal tree for a literal at absolute position `idx` under
        // the UTF8 context split (the decoder's §7.1 computation —
        // decode output equals the raw prefix, so p1/p2 are raw bytes)
        @inline def litTree(idx: Int): Int = {
          if (!useUtf8Ctx) return 0
          val p1 = if (idx > 0) raw(idx - 1) & 0xff else 0
          val p2 = if (idx > 1) raw(idx - 2) & 0xff else 0
          if (((ctxLut(1024 + p1) | ctxLut(1280 + p2)) & 0xff) >= 32) 1 else 0
        }
        val litLens = Array.fill(256)(8) // tree 0: flat-8, complete
        val lit1Freq = new Array[Int](256)
        if (useUtf8Ctx) cmds.foreach { c =>
          var li = 0
          while (li < c.litLen) {
            val idx = c.litStart + li
            if (litTree(idx) == 1) lit1Freq(raw(idx) & 0xff) += 1
            li += 1
          }
        }
        if (!lit1Freq.exists(_ > 0)) lit1Freq(0) = 1 // header needs one code
        val lit1Lens = huffLengths(lit1Freq, 15)
        val lit1Codes = canonicalCodes(lit1Lens)
        val lit1Single = lit1Lens.count(_ > 0) == 1
        val cmdLens = huffLengths(cmdFreq, 15)
        val dstLens = huffLengths(dstFreq, 15)
        writePrefixCode(bw, litLens)
        if (useUtf8Ctx) writePrefixCode(bw, lit1Lens)
        writePrefixCode(bw, cmdLens)
        writePrefixCode(bw, dstLens)
        val cmdCodes = canonicalCodes(cmdLens)
        val dstCodes = canonicalCodes(dstLens)
        // a one-symbol prefix code decodes with ZERO bits — emit none
        val cmdSingle = cmdLens.count(_ > 0) == 1
        val dstSingle = dstLens.count(_ > 0) == 1
        // command stream
        cmds.zipWithIndex.foreach { case (c, k) =>
          val ins = insCodeOf(c.litLen)
          val cpy = if (c.cpyLen == 0) 0 else cpyCodeOf(c.cpyLen)
          val sym = cmdSymbol(ins, cpy)
          if (!cmdSingle) bw.putCode(cmdCodes(sym), cmdLens(sym))
          bw.put(c.litLen - insBase(ins), insExtra(ins))
          bw.put((if (c.cpyLen == 0) 2 else c.cpyLen) - cpyBase(cpy),
            cpyExtra(cpy))
          var li = 0
          while (li < c.litLen) {
            val idx = c.litStart + li
            val b = raw(idx) & 0xff
            if (litTree(idx) == 0) bw.putCode(b, 8) // flat-8: code == byte
            else if (!lit1Single) bw.putCode(lit1Codes(b), lit1Lens(b))
            li += 1
          }
          if (distSyms(k) >= 0) {
            val ds = distSyms(k)
            if (!dstSingle) bw.putCode(dstCodes(ds), dstLens(ds))
            val (e, n) = distExtra(k)
            if (n > 0) bw.put(e, n)
          }
        }
      }
      segStart = segEnd
      segIdx += 1
    }
    if (variant % 9 == 5) { // LAST metadata meta-block ends the stream
      val meta = s"graft-tail-$variant".getBytes("UTF-8")
      bw.put(1, 1) // ISLAST
      bw.put(0, 1) // ISLASTEMPTY = 0
      bw.put(3, 2) // MNIBBLES code 3: metadata
      bw.put(0, 1) // reserved
      bw.put(1, 2) // MSKIPBYTES = 1
      bw.put(meta.length - 1, 8)
      bw.alignByte()
      bw.putRaw(meta, 0, meta.length)
    } else {
      bw.put(1, 1) // ISLAST
      bw.put(1, 1) // ISLASTEMPTY
    }
    bw.finish()
  }
}
