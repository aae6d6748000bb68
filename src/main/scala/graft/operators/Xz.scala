package graft.operators

/** Hand-written xz / LZMA2 decoder — the fourth general-purpose
  * codec of the intake ladder (gzip t25, zstd t30, brotli t31,
  * bzip2 t40): scientific datasets, software archives and many
  * public corpora ship `.xz`. Implements the public xz file format
  * specification (tukaani, v1.1.x) and the published LZMA
  * specification:
  *
  *   - the .xz CONTAINER: stream header (magic, stream flags, CRC32
  *     of the flags), block headers (size-coded, filter chain —
  *     LZMA2 only, its dictionary-size props byte decoded and
  *     bounded — optional size fields, padding, header CRC32),
  *     block padding to 4, the INDEX (record per block: unpadded /
  *     uncompressed sizes, both verified against what was actually
  *     decoded), and the stream footer (CRC32, backward size =
  *     index size, flags equal to the header's, end magic `YZ`);
  *     integrity checks CRC32 / CRC64 (hand-built ECMA-182
  *     reflected table) / SHA-256 verified over every block's
  *     DECODED bytes per the stream-flags check id;
  *   - the LZMA2 chunk layer: end marker, uncompressed chunks (with
  *     and without dict reset), LZMA chunks with the four reset
  *     classes (none / state / state+props / state+props+dict), the
  *     21-bit size split (5 control bits + 16), packed-size
  *     exactness per chunk, first-chunk must-carry-props;
  *   - LZMA proper: the 11-bit-probability binary range coder
  *     (bound split, 2^24 normalization, direct bits), the 12-state
  *     machine, bit-tree and reverse-bit-tree decoders, literal
  *     coding with lc/lp contexts INCLUDING matched-literal mode,
  *     match/rep length coders, the 64-slot distance model with
  *     aligned/spec-pos reverse trees, the rep0–rep3 distance ring,
  *     and the lc+lp ≤ 4 LZMA2 restriction; the dictionary position
  *     context (posState, literal pos bits, prev byte) resets with
  *     the DICT, not the chunk — the classic cross-chunk bug class;
  *   - fail-closed: end marker inside a sized chunk, range coder
  *     not ending clean (code != 0 or unconsumed packed bytes),
  *     match distance reaching past the dictionary-reset horizon,
  *     any CRC/size/flag mismatch, stream concatenation or trailing
  *     bytes → None.
  *
  * XzSpec cross-validates against TWO independent real
  * implementations: org.tukaani.xz (the fixture encoder — presets
  * 0–9, all three check types, multi-block via endBlock, tiny
  * dictionaries forcing cross-chunk matches) and the system xz(1)
  * binary, plus a malformation per container layer and a byte-flip
  * sweep.
  *
  * Scale: one linear pass; allocation bounded by the declared
  * uncompressed size against `maxOut`. Used from mapPartitions —
  * map-only, never throws.
  */
object Xz {

  private object Bad extends scala.util.control.ControlThrowable

  // ---- CRC64-ECMA (reflected), the xz default check ------------------------
  private lazy val crc64Tab: Array[Long] = Array.tabulate(256) { i =>
    var c = i.toLong
    var k = 0
    while (k < 8) {
      c = if ((c & 1L) != 0) (c >>> 1) ^ 0xC96C5795D7870F42L else c >>> 1
      k += 1
    }
    c
  }
  private def crc64(b: Array[Byte], off: Int, len: Int): Long = {
    var c = ~0L
    var i = off
    while (i < off + len) {
      c = (c >>> 8) ^ crc64Tab(((c ^ b(i)) & 0xff).toInt)
      i += 1
    }
    ~c
  }
  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue
  }

  // ---- LZMA range decoder ---------------------------------------------------

  private final class RC(p: Array[Byte], var pos: Int, val end: Int) {
    var range: Int = 0xFFFFFFFF
    var code: Int = 0
    def init(): Unit = {
      if (pos + 5 > end || p(pos) != 0) throw Bad
      pos += 1
      var i = 0
      while (i < 4) { code = (code << 8) | (p(pos) & 0xff); pos += 1; i += 1 }
    }
    @inline private def normalize(): Unit = {
      if ((range & 0xFF000000) == 0) {
        if (pos >= end) throw Bad
        range <<= 8
        code = (code << 8) | (p(pos) & 0xff)
        pos += 1
      }
    }
    def bit(probs: Array[Short], i: Int): Int = {
      val pr = probs(i)
      val bound = (range >>> 11) * pr
      val r =
        if (java.lang.Integer.compareUnsigned(code, bound) < 0) {
          range = bound
          probs(i) = (pr + ((2048 - pr) >>> 5)).toShort
          0
        } else {
          code -= bound
          range -= bound
          probs(i) = (pr - (pr >>> 5)).toShort
          1
        }
      normalize()
      r
    }
    def direct(n: Int): Int = {
      var res = 0
      var k = n
      while (k > 0) {
        range = range >>> 1
        code -= range
        val t = 0 - (code >>> 31)
        code += range & t
        if (code == range) throw Bad // spec: error case
        normalize()
        res = (res << 1) + (t.toInt + 1)
        k -= 1
      }
      res
    }
    def tree(probs: Array[Short], off: Int, n: Int): Int = {
      var m = 1
      var k = 0
      while (k < n) { m = (m << 1) | bit(probs, off + m); k += 1 }
      m - (1 << n)
    }
    def rtree(probs: Array[Short], off: Int, n: Int): Int = {
      var m = 1
      var sym = 0
      var k = 0
      while (k < n) {
        val b = bit(probs, off + m)
        m = (m << 1) | b
        sym |= b << k
        k += 1
      }
      sym
    }
    def finishedClean: Boolean = pos == end && code == 0
  }

  private def newProbs(n: Int): Array[Short] = Array.fill(n)(1024.toShort)

  /** LZMA probability model + state, reset-able per LZMA2 semantics. */
  private final class Lzma {
    var lc = 0; var lp = 0; var pb = 0
    var state = 0
    var rep0 = 0; var rep1 = 0; var rep2 = 0; var rep3 = 0
    var isMatch: Array[Short] = _
    var isRep: Array[Short] = _
    var isRepG0: Array[Short] = _
    var isRepG1: Array[Short] = _
    var isRepG2: Array[Short] = _
    var isRep0Long: Array[Short] = _
    var posSlot: Array[Short] = _
    var specPos: Array[Short] = _
    var align0: Array[Short] = _
    var lenChoice: Array[Short] = _
    var lenLow: Array[Short] = _
    var lenMid: Array[Short] = _
    var lenHigh: Array[Short] = _
    var repChoice: Array[Short] = _
    var repLow: Array[Short] = _
    var repMid: Array[Short] = _
    var repHigh: Array[Short] = _
    var lit: Array[Short] = _

    def setProps(b: Int): Unit = {
      if (b >= 225) throw Bad
      lc = b % 9
      val r = b / 9
      lp = r % 5
      pb = r / 5
      if (pb > 4 || lc + lp > 4) throw Bad // LZMA2 restriction
      resetState()
    }
    def resetState(): Unit = {
      state = 0; rep0 = 0; rep1 = 0; rep2 = 0; rep3 = 0
      isMatch = newProbs(12 * 16)
      isRep = newProbs(12); isRepG0 = newProbs(12)
      isRepG1 = newProbs(12); isRepG2 = newProbs(12)
      isRep0Long = newProbs(12 * 16)
      posSlot = newProbs(4 * 64)
      specPos = newProbs(128)
      align0 = newProbs(16)
      lenChoice = newProbs(2); lenLow = newProbs(16 * 8)
      lenMid = newProbs(16 * 8); lenHigh = newProbs(256)
      repChoice = newProbs(2); repLow = newProbs(16 * 8)
      repMid = newProbs(16 * 8); repHigh = newProbs(256)
      lit = newProbs((0x300 << (lc + lp)))
    }
    def lenDecode(rc: RC, choice: Array[Short], low: Array[Short],
                  mid: Array[Short], high: Array[Short], posState: Int): Int =
      if (rc.bit(choice, 0) == 0) 2 + rc.tree(low, posState * 8, 3)
      else if (rc.bit(choice, 1) == 0) 10 + rc.tree(mid, posState * 8, 3)
      else 18 + rc.tree(high, 0, 8)
  }

  /** Decode one LZMA chunk of exactly `unpack` bytes into out
    * [outPos, outPos+unpack), with dictionary horizon `dictStart`
    * and context position = pos - dictStart. */
  private def lzmaChunk(z: Lzma, rc: RC, out: Array[Byte], outPos0: Int,
                        unpack: Int, dictStart: Int): Unit = {
    val pbMask = (1 << z.pb) - 1
    val lpMask = (1 << z.lp) - 1
    var pos = outPos0
    val outEnd = outPos0 + unpack
    while (pos < outEnd) {
      val ctxPos = pos - dictStart
      val posState = ctxPos & pbMask
      if (rc.bit(z.isMatch, z.state * 16 + posState) == 0) {
        // literal
        val prev = if (ctxPos == 0) 0 else out(pos - 1) & 0xff
        val litBase =
          0x300 * (((ctxPos & lpMask) << z.lc) + (prev >>> (8 - z.lc)))
        var symbol = 1
        if (z.state >= 7) {
          if (z.rep0 + 1 > ctxPos) throw Bad
          var matchByte = out(pos - z.rep0 - 1) & 0xff
          var break = false
          while (!break && symbol < 0x100) {
            val matchBit = (matchByte >> 7) & 1
            matchByte = (matchByte << 1) & 0xff
            val b = rc.bit(z.lit, litBase + ((1 + matchBit) << 8) + symbol)
            symbol = (symbol << 1) | b
            if (matchBit != b) break = true
          }
          while (symbol < 0x100)
            symbol = (symbol << 1) | rc.bit(z.lit, litBase + symbol)
        } else {
          while (symbol < 0x100)
            symbol = (symbol << 1) | rc.bit(z.lit, litBase + symbol)
        }
        out(pos) = (symbol & 0xff).toByte
        pos += 1
        z.state = if (z.state < 4) 0 else if (z.state < 10) z.state - 3 else z.state - 6
      } else {
        var len = 0
        if (rc.bit(z.isRep, z.state) == 0) {
          // match: new distance
          len = z.lenDecode(rc, z.lenChoice, z.lenLow, z.lenMid, z.lenHigh, posState)
          val lenState = math.min(len - 2, 3)
          val slot = rc.tree(z.posSlot, lenState * 64, 6)
          var dist = slot
          if (slot >= 4) {
            val numDirect = (slot >> 1) - 1
            dist = (2 | (slot & 1)) << numDirect
            if (slot < 14)
              // spec: PosDecoders + dist - posSlot, probed at base+m
              // with m starting at 1 (max index 114)
              dist += rc.rtree(z.specPos, dist - slot, numDirect)
            else {
              dist += rc.direct(numDirect - 4) << 4
              dist += rc.rtree(z.align0, 0, 4)
            }
          }
          if (dist == -1) throw Bad // end marker: not allowed in sized chunks
          z.rep3 = z.rep2; z.rep2 = z.rep1; z.rep1 = z.rep0; z.rep0 = dist
          z.state = if (z.state < 7) 7 else 10
        } else {
          // rep match
          if (rc.bit(z.isRepG0, z.state) == 0) {
            if (rc.bit(z.isRep0Long, z.state * 16 + posState) == 0) {
              // short rep: one byte at rep0
              if (z.rep0 + 1 > ctxPos) throw Bad
              out(pos) = out(pos - z.rep0 - 1)
              pos += 1
              z.state = if (z.state < 7) 9 else 11
              len = -1 // handled
            }
          } else {
            var dist = 0
            if (rc.bit(z.isRepG1, z.state) == 0) dist = z.rep1
            else {
              if (rc.bit(z.isRepG2, z.state) == 0) dist = z.rep2
              else { dist = z.rep3; z.rep3 = z.rep2 }
              z.rep2 = z.rep1
            }
            z.rep1 = z.rep0
            z.rep0 = dist
          }
          if (len == 0) {
            len = z.lenDecode(rc, z.repChoice, z.repLow, z.repMid, z.repHigh, posState)
            z.state = if (z.state < 7) 8 else 11
          }
        }
        if (len > 0) {
          if (pos + len > outEnd) throw Bad // over-run of the sized chunk
          if (z.rep0 + 1 > pos - dictStart) throw Bad
          var k = 0
          val d = z.rep0 + 1
          while (k < len) { out(pos + k) = out(pos + k - d); k += 1 }
          pos += len
        }
      }
    }
  }

  /** Decode a full LZMA2 chunk sequence into a fresh buffer of
    * exactly `unSize` bytes. */
  private def lzma2(p: Array[Byte], off: Int, end: Int, unSize: Int): Array[Byte] = {
    val out = new Array[Byte](unSize)
    var outPos = 0
    var ip = off
    var dictStart = 0
    val z = new Lzma
    var haveProps = false
    var needStateReset = true // first LZMA chunk must reset (and carry props)
    var done = false
    while (!done) {
      if (ip >= end) throw Bad
      val ctrl = p(ip) & 0xff
      ip += 1
      if (ctrl == 0x00) done = true
      else if (ctrl == 0x01 || ctrl == 0x02) {
        // uncompressed chunk; 0x01 resets the dictionary
        if (ip + 2 > end) throw Bad
        val size = (((p(ip) & 0xff) << 8) | (p(ip + 1) & 0xff)) + 1
        ip += 2
        if (ctrl == 0x01) dictStart = outPos
        if (ip + size > end || outPos + size > unSize) throw Bad
        System.arraycopy(p, ip, out, outPos, size)
        ip += size
        outPos += size
        needStateReset = true // LZMA state is invalid after a raw chunk
      } else if (ctrl >= 0x80) {
        val unpack = (((ctrl & 0x1f) << 16) |
          ((p(ip) & 0xff) << 8) | (p(ip + 1) & 0xff)) + 1
        val pack = (((p(ip + 2) & 0xff) << 8) | (p(ip + 3) & 0xff)) + 1
        ip += 4
        val reset = (ctrl >> 5) & 3
        reset match {
          case 0 =>
            if (needStateReset || !haveProps) throw Bad
          case 1 =>
            if (!haveProps) throw Bad
            z.resetState()
          case _ =>
            if (ip >= end) throw Bad
            z.setProps(p(ip) & 0xff)
            haveProps = true
            ip += 1
            if (reset == 3) dictStart = outPos
        }
        needStateReset = false
        if (ip + pack > end || outPos + unpack > unSize) throw Bad
        val rc = new RC(p, ip, ip + pack)
        rc.init()
        lzmaChunk(z, rc, out, outPos, unpack, dictStart)
        if (!rc.finishedClean) throw Bad
        ip = ip + pack
        outPos += unpack
      } else throw Bad
    }
    if (outPos != unSize) throw Bad
    // the chunk sequence must exactly tile the compressed region
    // (padding is the CONTAINER's job, not LZMA2's)
    if (ip != end) throw Bad
    out
  }

  // ---- xz container ----------------------------------------------------------

  private def vli(p: Array[Byte], posRef: Array[Int]): Long = {
    var v = 0L
    var i = 0
    var pos = posRef(0)
    var cont = true
    while (cont) {
      if (pos >= p.length || i >= 9) throw Bad
      val b = p(pos) & 0xff
      pos += 1
      v |= (b & 0x7fL) << (7 * i)
      i += 1
      if ((b & 0x80) == 0) {
        if (b == 0 && i > 1) throw Bad // non-minimal encoding
        cont = false
      }
    }
    posRef(0) = pos
    v
  }

  /** Decompress one .xz stream. None on any malformation; `maxOut`
    * bounds total allocation. */
  def decompress(p: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] = {
    try {
      if (p.length < 32) return None
      // stream header
      if (p(0) != 0xFD.toByte || p(1) != '7' || p(2) != 'z' ||
          p(3) != 'X' || p(4) != 'Z' || p(5) != 0) return None
      if (p(6) != 0) return None // first flags byte must be 0
      val checkId = p(7) & 0xff
      val checkSize = checkId match {
        case 0x00 => 0
        case 0x01 => 4
        case 0x04 => 8
        case 0x0A => 32
        case _ => return None // reserved / unsupported check ids
      }
      if (crc32(p, 6, 2) != ((p(8) & 0xffL) | ((p(9) & 0xffL) << 8) |
          ((p(10) & 0xffL) << 16) | ((p(11) & 0xffL) << 24))) return None
      var pos = 12
      val out = new java.io.ByteArrayOutputStream(math.min(p.length * 4, 1 << 20))
      val records = Vector.newBuilder[(Long, Long)] // (unpadded, uncompressed)
      var done = false
      while (!done) {
        if (pos >= p.length) return None
        val first = p(pos) & 0xff
        if (first == 0x00) {
          done = true // index indicator
        } else {
          // block header
          val hdrSize = (first + 1) * 4
          if (pos + hdrSize > p.length) return None
          val hdrCrc = crc32(p, pos, hdrSize - 4)
          val storedHdrCrc = (p(pos + hdrSize - 4) & 0xffL) |
            ((p(pos + hdrSize - 3) & 0xffL) << 8) |
            ((p(pos + hdrSize - 2) & 0xffL) << 16) |
            ((p(pos + hdrSize - 1) & 0xffL) << 24)
          if (hdrCrc != storedHdrCrc) return None
          val flags = p(pos + 1) & 0xff
          val nFilters = (flags & 0x03) + 1
          if ((flags & 0x3C) != 0) return None // reserved bits
          val hasCompSize = (flags & 0x40) != 0
          val hasUncompSize = (flags & 0x80) != 0
          val pr = Array(pos + 2)
          var declComp = -1L
          var declUncomp = -1L
          if (hasCompSize) declComp = vli(p, pr)
          if (hasUncompSize) declUncomp = vli(p, pr)
          // filter chain: this profile decodes LZMA2-only chains
          if (nFilters != 1) return None
          val fid = vli(p, pr)
          if (fid != 0x21) return None
          val propsSize = vli(p, pr)
          if (propsSize != 1) return None
          if (pr(0) >= pos + hdrSize - 4) return None
          val dictProp = p(pr(0)) & 0xff
          pr(0) += 1
          if (dictProp > 40) return None
          // header padding must be zero
          var q = pr(0)
          while (q < pos + hdrSize - 4) {
            if (p(q) != 0) return None
            q += 1
          }
          // compressed data: LZMA2 is self-delimiting; walk chunks to
          // find its extent, then decode
          val dataStart = pos + hdrSize
          var ip = dataStart
          var unSizeL = 0L
          var scanning = true
          while (scanning) {
            if (ip >= p.length) return None
            val ctrl = p(ip) & 0xff
            ip += 1
            if (ctrl == 0x00) scanning = false
            else if (ctrl == 0x01 || ctrl == 0x02) {
              if (ip + 2 > p.length) return None
              val size = (((p(ip) & 0xff) << 8) | (p(ip + 1) & 0xff)) + 1
              ip += 2 + size
              unSizeL += size
            } else if (ctrl >= 0x80) {
              if (ip + 4 > p.length) return None
              val unpack = (((ctrl & 0x1f) << 16) |
                ((p(ip) & 0xff) << 8) | (p(ip + 1) & 0xff)) + 1
              val pack = (((p(ip + 2) & 0xff) << 8) | (p(ip + 3) & 0xff)) + 1
              ip += 4 + (if ((ctrl >> 5) >= 6) 1 else 0) + pack
              unSizeL += unpack
            } else return None
            if (ip > p.length) return None
          }
          val dataEnd = ip
          val compSize = (dataEnd - dataStart).toLong
          if (declComp >= 0 && declComp != compSize) return None
          if (unSizeL > maxOut - out.size()) return None
          if (declUncomp >= 0 && declUncomp != unSizeL) return None
          val block = lzma2(p, dataStart, dataEnd, unSizeL.toInt)
          // block padding to 4
          var pad = (4 - ((dataEnd - pos) % 4)) % 4
          var pp2 = dataEnd
          while (pad > 0) {
            if (pp2 >= p.length || p(pp2) != 0) return None
            pp2 += 1
            pad -= 1
          }
          // integrity check over the DECODED bytes
          checkId match {
            case 0x00 => ()
            case 0x01 =>
              val want = crc32(block, 0, block.length)
              val got = (p(pp2) & 0xffL) | ((p(pp2 + 1) & 0xffL) << 8) |
                ((p(pp2 + 2) & 0xffL) << 16) | ((p(pp2 + 3) & 0xffL) << 24)
              if (want != got) return None
            case 0x04 =>
              val want = crc64(block, 0, block.length)
              var got = 0L
              var k = 0
              while (k < 8) { got |= (p(pp2 + k) & 0xffL) << (8 * k); k += 1 }
              if (want != got) return None
            case _ =>
              val md = java.security.MessageDigest.getInstance("SHA-256")
              val want = md.digest(block)
              var k = 0
              while (k < 32) {
                if (want(k) != p(pp2 + k)) return None
                k += 1
              }
          }
          out.write(block)
          records += ((hdrSize.toLong + compSize + checkSize, unSizeL))
          pos = pp2 + checkSize
        }
      }
      // index
      val idxStart = pos
      pos += 1 // the 0x00 indicator
      val pr = Array(pos)
      val nRec = vli(p, pr)
      val recs = records.result()
      if (nRec != recs.length) return None
      recs.foreach { case (unpadded, uncompressed) =>
        if (vli(p, pr) != unpadded) return None
        if (vli(p, pr) != uncompressed) return None
      }
      pos = pr(0)
      var pad = (4 - ((pos - idxStart) % 4)) % 4
      while (pad > 0) {
        if (pos >= p.length || p(pos) != 0) return None
        pos += 1
        pad -= 1
      }
      val idxCrc = crc32(p, idxStart, pos - idxStart)
      if (pos + 4 > p.length) return None
      val storedIdxCrc = (p(pos) & 0xffL) | ((p(pos + 1) & 0xffL) << 8) |
        ((p(pos + 2) & 0xffL) << 16) | ((p(pos + 3) & 0xffL) << 24)
      if (idxCrc != storedIdxCrc) return None
      val idxSize = (pos + 4 - idxStart).toLong
      pos += 4
      // stream footer: crc32(4) | backward size(4) | flags(2) | "YZ"
      if (pos + 12 != p.length) return None // single stream, no padding/concat
      val footCrc = (p(pos) & 0xffL) | ((p(pos + 1) & 0xffL) << 8) |
        ((p(pos + 2) & 0xffL) << 16) | ((p(pos + 3) & 0xffL) << 24)
      if (crc32(p, pos + 4, 6) != footCrc) return None
      val backward = (((p(pos + 4) & 0xffL) | ((p(pos + 5) & 0xffL) << 8) |
        ((p(pos + 6) & 0xffL) << 16) | ((p(pos + 7) & 0xffL) << 24)) + 1) * 4
      if (backward != idxSize) return None
      if (p(pos + 8) != p(6) || p(pos + 9) != p(7)) return None
      if (p(pos + 10) != 'Y' || p(pos + 11) != 'Z') return None
      Some(out.toByteArray)
    } catch {
      case Bad => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }
}
