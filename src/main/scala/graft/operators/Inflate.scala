package graft.operators

/** RFC 1951 DEFLATE, hand-written — the entropy-coded substrate under
  * PNG (and gzip/zlib text corpora). Two halves:
  *
  *  - [[inflate]]: a full decoder — stored blocks (§3.2.4), fixed
  *    Huffman (§3.2.6), dynamic Huffman (§3.2.7) — as pure byte/int
  *    arithmetic: LSB-first bit reader, canonical-Huffman decode via
  *    the per-length count/offset walk, the code-length alphabet with
  *    RLE symbols 16/17/18, and the 32 KiB LZ77 back-reference window.
  *    Strict: over-subscribed trees, unassigned code patterns,
  *    out-of-window distances, output overrun/underrun, and truncated
  *    streams all return None — never throws. (This replaces the
  *    round-9 stored-block-only profile in Multimodal.parsePng: real
  *    PNGs are fixed/dynamic-Huffman deflate, and the decode contract
  *    has to cover them to mean anything at 100 TB of image data.)
  *
  *  - [[deflateFixed]] / [[deflateDynamic]]: fixture ENCODERS for the
  *    m10 generator — a greedy hash-head LZ77 matcher feeding either
  *    the fixed code (BTYPE=01, multi-block, bit-continuous across
  *    block boundaries so the reader must carry bits) or a dynamic
  *    block (BTYPE=10) with a predefined COMPLETE code pair whose
  *    code-length preamble exercises the CL alphabet including the
  *    16-repeat. The generator stays deterministic (no library codec
  *    in the emitted corpus); MultimodalSpec additionally round-trips
  *    [[inflate]] against java.util.zip.Deflater streams for
  *    independence from this encoder's bugs.
  *
  * Reference semantics: RFC 1951 (public); behavior cross-checked
  * against java.util.zip in the spec. No reference-repo code involved
  * (SmarterApp/RDW ships no codecs).
  */
object Inflate {

  // length symbols 257..285 → (base, extra bits); RFC 1951 §3.2.5
  private[operators] val lenBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
    51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private[operators] val lenExtra = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4,
    4, 4, 5, 5, 5, 5, 0)
  // distance symbols 0..29 → (base, extra bits)
  private[operators] val distBase = Array(
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257,
    385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289,
    16385, 24577)
  private[operators] val distExtra = Array(
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9,
    10, 10, 11, 11, 12, 12, 13, 13)
  // order in which code-length code lengths are transmitted (§3.2.7)
  private val clOrder = Array(
    16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

  /** Canonical-Huffman decode table: per-length counts + symbols
    * sorted by (length, symbol). Over-subscription (Kraft sum > 1) is
    * flagged at build; incomplete codes are tolerated at build and
    * fail at decode time when an unassigned pattern arrives — the
    * zlib-compatible treatment (a one-code distance tree is legal). */
  private final class Huff(lengths: Array[Int], nsym: Int) {
    val count = new Array[Int](16)
    val symbol = new Array[Int](nsym)
    var oversubscribed = false
    locally {
      var i = 0
      while (i < nsym) { count(lengths(i)) += 1; i += 1 }
      var left = 1
      var len = 1
      while (len <= 15) {
        left <<= 1
        left -= count(len)
        if (left < 0) oversubscribed = true
        len += 1
      }
      val offs = new Array[Int](16)
      var l = 1
      while (l < 15) { offs(l + 1) = offs(l) + count(l); l += 1 }
      i = 0
      while (i < nsym) {
        if (lengths(i) != 0) {
          symbol(offs(lengths(i))) = i
          offs(lengths(i)) += 1
        }
        i += 1
      }
    }
  }

  /** LSB-first bit reader over z[pos until end); err latches. */
  private final class BitReader(z: Array[Byte], var pos: Int, end: Int) {
    var bitBuf = 0
    var bitCnt = 0
    var err = false
    def bits(n: Int): Int = {
      while (bitCnt < n) {
        if (pos >= end) { err = true; return -1 }
        bitBuf |= (z(pos) & 0xff) << bitCnt
        pos += 1; bitCnt += 8
      }
      val v = bitBuf & ((1 << n) - 1)
      bitBuf >>>= n; bitCnt -= n
      v
    }
    /** canonical decode: accumulate the code MSB-first one bit at a
      * time, checking it against each length's first-code/count. */
    def decode(h: Huff): Int = {
      var code = 0; var first = 0; var index = 0; var len = 1
      while (len <= 15) {
        code |= bits(1)
        if (err) return -1
        val cnt = h.count(len)
        if (code - first < cnt) return h.symbol(index + (code - first))
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        len += 1
      }
      err = true; -1 // unassigned pattern: incomplete code used
    }
    def alignByte(): Unit = {
      val drop = bitCnt % 8
      bitBuf >>>= drop; bitCnt -= drop
    }
    /** first un-consumed BYTE index (valid only when byte-aligned). */
    def bytePos: Int = pos - bitCnt / 8
  }

  // fixed litlen code lengths (§3.2.6): 0-143→8, 144-255→9,
  // 256-279→7, 280-287→8; fixed distance: 30 codes of 5 bits
  private lazy val fixedLit: Huff = {
    val l = new Array[Int](288)
    var i = 0
    while (i < 288) {
      l(i) = if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
      i += 1
    }
    new Huff(l, 288)
  }
  private lazy val fixedDist: Huff = new Huff(Array.fill(30)(5), 30)

  /** §3.2.7 preamble: HLIT/HDIST/HCLEN, the 3-bit CL code lengths in
    * clOrder, then the HLIT+HDIST lengths through the CL code with
    * repeat symbols 16 (copy prev 3-6) / 17 (zero 3-10) / 18
    * (zero 11-138). One lens sequence — a repeat may legally cross
    * the litlen/distance boundary. */
  private def dynamicTables(br: BitReader): Option[(Huff, Huff)] = {
    val hlit = br.bits(5) + 257
    val hdist = br.bits(5) + 1
    val hclen = br.bits(4) + 4
    if (br.err || hlit > 286 || hdist > 30) return None
    val clLens = new Array[Int](19)
    var i = 0
    while (i < hclen) { clLens(clOrder(i)) = br.bits(3); i += 1 }
    if (br.err) return None
    val cl = new Huff(clLens, 19)
    if (cl.oversubscribed) return None
    val lens = new Array[Int](hlit + hdist)
    var n = 0
    while (n < hlit + hdist) {
      val sym = br.decode(cl)
      if (br.err || sym < 0) return None
      if (sym < 16) { lens(n) = sym; n += 1 }
      else {
        var value = 0; var repeat = 0
        if (sym == 16) {
          if (n == 0) return None // no previous length to copy
          value = lens(n - 1); repeat = 3 + br.bits(2)
        } else if (sym == 17) repeat = 3 + br.bits(3)
        else repeat = 11 + br.bits(7)
        if (br.err || n + repeat > hlit + hdist) return None
        var j = 0
        while (j < repeat) { lens(n) = value; n += 1; j += 1 }
      }
    }
    if (lens(256) == 0) return None // end-of-block code must exist
    val lit = new Huff(java.util.Arrays.copyOfRange(lens, 0, hlit), hlit)
    val dist = new Huff(java.util.Arrays.copyOfRange(lens, hlit, hlit + hdist),
      hdist)
    if (lit.oversubscribed || dist.oversubscribed) None
    else Some((lit, dist))
  }

  /** Inflate z[off until end) expecting EXACTLY exactOut output bytes
    * (PNG computes the inflated size from IHDR — any other size is
    * malformed). Returns (raw, nextBytePos) with nextBytePos the
    * first byte after the final block's byte-aligned end (where
    * zlib's Adler-32 trailer sits); None for anything malformed. */
  def inflate(z: Array[Byte], off: Int, end: Int,
              exactOut: Int): Option[(Array[Byte], Int)] = {
    if (exactOut < 0) return None
    inflateCore(z, off, end, maxOut = exactOut) match {
      case Some((buf, len, next)) if len == exactOut =>
        Some((if (buf.length == len) buf else java.util.Arrays.copyOf(buf, len),
          next))
      case _ => None
    }
  }

  /** The deflate decode loop over a GROWABLE output (the deflate
    * stream is self-delimiting, so the caller need not know the
    * output size — what the multi-member gzip walk requires, where
    * each member's ISIZE trailer FOLLOWS its stream). `maxOut` bounds
    * allocation; [[inflate]] passes its exact size (identical
    * overflow behavior to the fixed-buffer form it replaced).
    * Returns (buffer, decoded length, next byte offset). */
  private def inflateCore(z: Array[Byte], off: Int, end: Int,
                          maxOut: Int): Option[(Array[Byte], Int, Int)] = {
    if (off < 0 || end > z.length || off > end || maxOut < 0) return None
    var out = new Array[Byte](math.min(maxOut, 4096))
    var op = 0
    @inline def ensure(n: Int): Boolean = {
      if (op + n > maxOut || op + n < 0) false
      else {
        if (op + n > out.length) {
          var cap = math.max(out.length * 2, op + n)
          cap = math.min(cap, maxOut)
          out = java.util.Arrays.copyOf(out, cap)
        }
        true
      }
    }
    val br = new BitReader(z, off, end)
    var fin = false
    while (!fin) {
      val bfinal = br.bits(1)
      val btype = br.bits(2)
      if (br.err) return None
      fin = bfinal == 1
      if (btype == 0) { // stored (§3.2.4): byte-aligned LEN/NLEN + raw copy
        br.alignByte()
        val len = br.bits(16)
        val nlen = br.bits(16)
        if (br.err || (len ^ 0xffff) != nlen) return None
        val start = br.bytePos
        if (start + len > end || !ensure(len)) return None
        System.arraycopy(z, start, out, op, len)
        op += len
        br.pos = start + len; br.bitBuf = 0; br.bitCnt = 0
      } else if (btype == 1 || btype == 2) {
        val tables =
          if (btype == 1) Some((fixedLit, fixedDist)) else dynamicTables(br)
        val (lit, dist) = tables match {
          case Some(t) => t
          case None    => return None
        }
        var eob = false
        while (!eob) {
          val sym = br.decode(lit)
          if (br.err || sym < 0) return None
          if (sym < 256) {
            if (!ensure(1)) return None
            out(op) = sym.toByte; op += 1
          } else if (sym == 256) eob = true
          else {
            if (sym > 285) return None // 286/287 are reserved
            val li = sym - 257
            val length = lenBase(li) + br.bits(lenExtra(li))
            val dsym = br.decode(dist)
            if (br.err || dsym < 0 || dsym > 29) return None
            val distance = distBase(dsym) + br.bits(distExtra(dsym))
            if (br.err) return None
            if (distance > op || !ensure(length)) return None
            var i = 0 // byte-by-byte: distance < length overlap is legal
            while (i < length) { out(op) = out(op - distance); op += 1; i += 1 }
          }
        }
      } else return None // BTYPE=11 reserved
    }
    br.alignByte()
    Some((out, op, br.bytePos))
  }

  // ======================= fixture encoders ================================

  /** LSB-first bit writer (the encoder mirror of BitReader). */
  private final class BitWriter {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var bitBuf = 0
    private var bitCnt = 0
    def put(v: Int, n: Int): Unit = { // value bits LSB-first (extra bits)
      bitBuf |= (v & ((1 << n) - 1)) << bitCnt
      bitCnt += n
      while (bitCnt >= 8) {
        out += (bitBuf & 0xff).toByte
        bitBuf >>>= 8; bitCnt -= 8
      }
    }
    def putHuff(code: Int, n: Int): Unit = { // Huffman code bits MSB-first (§3.1.1)
      var i = n - 1
      while (i >= 0) { put((code >> i) & 1, 1); i -= 1 }
    }
    def finish(): Array[Byte] = {
      if (bitCnt > 0) { out += (bitBuf & 0xff).toByte; bitBuf = 0; bitCnt = 0 }
      out.toArray
    }
  }

  /** canonical code values for a length array — the assignment the
    * decoder's count/offset walk implies (codes in (length, symbol)
    * order). Returns symbol → code; lengths(sym)=0 ⇒ unused. */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.max
    val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxLen + 1)
    var code = 0
    var l = 1
    while (l <= maxLen) { code = (code + count(l - 1)) << 1; next(l) = code; l += 1 }
    val codes = new Array[Int](lengths.length)
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) { codes(s) = next(lengths(s)); next(lengths(s)) += 1 }
      s += 1
    }
    codes
  }

  /** length value → (symbol index 0-based into 257.., extra value). */
  private def lenSym(length: Int): (Int, Int) = {
    var li = lenBase.length - 1
    while (lenBase(li) > length) li -= 1
    // length 258 is symbol 285 exactly; lengths in [227,257] use 284
    if (li == 28 && length != 258) li = 27
    (li, length - lenBase(li))
  }

  private def distSym(distance: Int): (Int, Int) = {
    var di = distBase.length - 1
    while (distBase(di) > distance) di -= 1
    (di, distance - distBase(di))
  }

  /** Greedy hash-head LZ77 matcher: emits (literal | match) tokens to
    * `emit` for raw[from until until), matching against anything
    * earlier in raw within maxDist. Fixture-grade: one head per
    * 3-byte hash, no chains, no lazy matching. */
  private def lzTokens(raw: Array[Byte], from: Int, until: Int,
                       head: java.util.HashMap[Int, Int], maxDist: Int,
                       emitLit: Int => Unit,
                       emitMatch: (Int, Int) => Unit): Unit = {
    @inline def h3(i: Int): Int =
      ((raw(i) & 0xff) << 16) | ((raw(i + 1) & 0xff) << 8) | (raw(i + 2) & 0xff)
    var p = from
    while (p < until) {
      var matched = false
      if (p + 3 <= until) {
        val key = h3(p)
        val cand = head.getOrDefault(key, -1)
        if (cand >= 0 && p - cand <= maxDist) {
          var len = 0
          val cap = math.min(258, until - p)
          while (len < cap && raw(cand + len) == raw(p + len)) len += 1
          if (len >= 3) {
            emitMatch(len, p - cand)
            head.put(key, p)
            p += len
            matched = true
          }
        }
        if (!matched) head.put(key, p)
      }
      if (!matched) { emitLit(raw(p) & 0xff); p += 1 }
    }
  }

  /** Fixed-Huffman deflate (BTYPE=01) in blocks of ≤ blockInput input
    * bytes — multi-block and bit-continuous across block boundaries
    * (blocks do NOT byte-align, so the reader must carry its bit
    * buffer over a header). */
  def deflateFixed(raw: Array[Byte], blockInput: Int = 512): Array[Byte] = {
    val bw = new BitWriter
    val head = new java.util.HashMap[Int, Int]()
    def fixedLitCode(sym: Int): (Int, Int) =
      if (sym < 144) (0x30 + sym, 8)
      else if (sym < 256) (0x190 + (sym - 144), 9)
      else if (sym < 280) (sym - 256, 7)
      else (0xc0 + (sym - 280), 8)
    var start = 0
    do {
      val until = math.min(raw.length, start + blockInput)
      val fin = until >= raw.length
      bw.put(if (fin) 1 else 0, 1)
      bw.put(1, 2) // BTYPE=01
      lzTokens(raw, start, until, head, maxDist = 32768,
        emitLit = { sym =>
          val (c, n) = fixedLitCode(sym); bw.putHuff(c, n)
        },
        emitMatch = { (len, distVal) =>
          val (li, lx) = lenSym(len)
          val (c, n) = fixedLitCode(257 + li)
          bw.putHuff(c, n); bw.put(lx, lenExtra(li))
          val (di, dx) = distSym(distVal)
          bw.putHuff(di, 5); bw.put(dx, distExtra(di))
        })
      val (ec, en) = fixedLitCode(256)
      bw.putHuff(ec, en) // end of block
      start = until
    } while (start < raw.length)
    bw.finish()
  }

  // The predefined COMPLETE code pair for deflateDynamic. Litlen
  // (286 symbols): 0-255 → 9 bits (Kraft 256/512 = 1/2),
  // 256-283 → 6 bits (28/64 = 7/16), 284-285 → 5 bits (2/32 = 1/16);
  // sum = 1 exactly. Distance (30 symbols): 0-1 → 4 bits (2/16),
  // 2-29 → 5 bits (28/32); sum = 1 exactly. Every length/distance
  // symbol usable, so the matcher needs no caps.
  private lazy val dynLitLens: Array[Int] =
    Array.tabulate(286)(i => if (i < 256) 9 else if (i < 284) 6 else 5)
  private lazy val dynDistLens: Array[Int] =
    Array.tabulate(30)(i => if (i < 2) 4 else 5)
  private lazy val dynLitCodes = canonicalCodes(dynLitLens)
  private lazy val dynDistCodes = canonicalCodes(dynDistLens)

  /** One dynamic-Huffman block (BTYPE=10) over the whole input, with
    * the predefined complete code pair above. The code-length
    * preamble is emitted through the CL alphabet with repeat-16 runs
    * — a real §3.2.7 header, not a degenerate one. */
  def deflateDynamic(raw: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    bw.put(1, 1) // BFINAL
    bw.put(2, 2) // BTYPE=10
    bw.put(286 - 257, 5) // HLIT
    bw.put(30 - 1, 5)    // HDIST
    // CL code over the symbols this preamble uses: {4,5,6,9,16};
    // lengths 9→2, 16→2, 6→2, 5→3, 4→3 (Kraft 3/4 + 1/4 = 1).
    val clLens = new Array[Int](19)
    clLens(9) = 2; clLens(16) = 2; clLens(6) = 2; clLens(5) = 3; clLens(4) = 3
    // transmit through index 11 of clOrder (covers 16@0, 9@6, 6@7,
    // 5@9, 4@11)
    val hclen = 12
    bw.put(hclen - 4, 4)
    var i = 0
    while (i < hclen) { bw.put(clLens(clOrder(i)), 3); i += 1 }
    val clCodes = canonicalCodes(clLens)
    def clSym(s: Int): Unit = bw.putHuff(clCodes(s), clLens(s))
    def runOf(value: Int, n: Int): Unit = { // value, then repeat-16s
      clSym(value)
      var left = n - 1
      while (left >= 3) {
        val take = math.min(6, left)
        clSym(16); bw.put(take - 3, 2)
        left -= take
      }
      while (left > 0) { clSym(value); left -= 1 }
    }
    runOf(9, 256) // litlen 0..255
    runOf(6, 28)  // 256..283
    runOf(5, 2)   // 284..285
    runOf(4, 2)   // dist 0..1
    runOf(5, 28)  // dist 2..29
    // token stream
    val headMap = new java.util.HashMap[Int, Int]()
    lzTokens(raw, 0, raw.length, headMap, maxDist = 32768,
      emitLit = sym => bw.putHuff(dynLitCodes(sym), dynLitLens(sym)),
      emitMatch = { (len, distVal) =>
        val (li, lx) = lenSym(len)
        bw.putHuff(dynLitCodes(257 + li), dynLitLens(257 + li))
        bw.put(lx, lenExtra(li))
        val (di, dx) = distSym(distVal)
        bw.putHuff(dynDistCodes(di), dynDistLens(di))
        bw.put(dx, distExtra(di))
      })
    bw.putHuff(dynLitCodes(256), dynLitLens(256))
    bw.finish()
  }

  // ======================= zlib (RFC 1950) =================================
  // The deflate substrate in its OTHER wire wrapper: the `deflate`
  // HTTP Content-Encoding is a zlib stream (2-byte header, deflate
  // body, Adler-32 trailer) — what the WARC read path needs to decode
  // real crawled response bodies.

  /** Encode one zlib stream around `raw`; deflateMode 0|1|2 as in
    * [[gzipMember]] (stored / fixed / dynamic). */
  def zlibEncode(raw: Array[Byte], deflateMode: Int = 2): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte](raw.length + 16)
    out += 0x78.toByte += 0x01.toByte // CMF: deflate/32k, FLG: check bits
    if (deflateMode == 1) out ++= deflateFixed(raw)
    else if (deflateMode == 2) out ++= deflateDynamic(raw)
    else { // stored blocks, <= 40 bytes each (the PNG generator's framing)
      var pos = 0
      var fin = false
      while (!fin) {
        val len = math.min(40, raw.length - pos)
        fin = pos + len >= raw.length
        out += (if (fin) 1 else 0).toByte
        out += (len & 0xff).toByte += ((len >> 8) & 0xff).toByte
        out += (~len & 0xff).toByte += ((~len >> 8) & 0xff).toByte
        var i = 0
        while (i < len) { out += raw(pos + i); i += 1 }
        pos += len
      }
    }
    val ad = new java.util.zip.Adler32
    ad.update(raw, 0, raw.length)
    val a = ad.getValue
    out += ((a >> 24) & 0xff).toByte += ((a >> 16) & 0xff).toByte
    out += ((a >> 8) & 0xff).toByte += (a & 0xff).toByte
    out.toArray
  }

  /** Decode a zlib stream that must exactly tile `p`: 2-byte header
    * (deflate method, valid FCHECK, no preset dictionary), growable
    * inflate, big-endian Adler-32 trailer verified over the inflated
    * bytes. None for anything malformed — never throws. */
  def zlibDecode(p: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    if (p.length < 2 + 1 + 4) return None
    val cmf = u8(0); val flg = u8(1)
    if ((cmf & 0x0f) != 8) return None // deflate method only
    if ((cmf >> 4) > 7) return None // window size > 32k is invalid
    if ((cmf * 256 + flg) % 31 != 0) return None // FCHECK
    if ((flg & 0x20) != 0) return None // preset dictionary: out of profile
    val (buf, len, next) = inflateCore(p, 2, p.length - 4, maxOut) match {
      case Some(r) => r
      case None => return None
    }
    if (next != p.length - 4) return None // stream must tile to the trailer
    val ad = new java.util.zip.Adler32
    ad.update(buf, 0, len)
    val want = (u8(p.length - 4).toLong << 24) | (u8(p.length - 3).toLong << 16) |
      (u8(p.length - 2).toLong << 8) | u8(p.length - 1).toLong
    if (ad.getValue != want) return None
    Some(java.util.Arrays.copyOf(buf, len))
  }

  // ======================= gzip (RFC 1952) =================================
  // The deflate substrate applied to the format 100-TB text corpora
  // actually arrive in: single-member gzip files. Header variants
  // (FEXTRA / FNAME / FCOMMENT / FHCRC) must be WALKED, the optional
  // header CRC16 verified, and the CRC-32 + ISIZE trailer checked
  // against the inflated bytes.

  /** Encode one gzip member around `raw`. deflateMode 0|1|2 as in the
    * PNG generator; header option flags rotate real-world layouts:
    * fname/fcomment are zero-terminated fields, extra is an XLEN-
    * prefixed opaque block, hcrc appends the CRC-16 of the header. */
  def gzipMember(raw: Array[Byte], deflateMode: Int,
                 fname: Option[String] = None,
                 fcomment: Option[String] = None,
                 extra: Option[Array[Byte]] = None,
                 hcrc: Boolean = false): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    def b(v: Int): Unit = out += (v & 0xff).toByte
    def le16(v: Int): Unit = { b(v); b(v >> 8) }
    def le32(v: Long): Unit = {
      b(v.toInt); b((v >> 8).toInt); b((v >> 16).toInt); b((v >> 24).toInt)
    }
    b(0x1f); b(0x8b); b(8) // magic + CM=deflate
    var flg = 0
    if (extra.isDefined) flg |= 4
    if (fname.isDefined) flg |= 8
    if (fcomment.isDefined) flg |= 16
    if (hcrc) flg |= 2
    b(flg)
    le32(0L) // MTIME=0: deterministic fixtures
    b(0); b(255) // XFL, OS=unknown
    extra.foreach { e => le16(e.length); e.foreach(x => b(x & 0xff)) }
    fname.foreach { n => n.getBytes("ISO-8859-1").foreach(x => b(x & 0xff)); b(0) }
    fcomment.foreach { n => n.getBytes("ISO-8859-1").foreach(x => b(x & 0xff)); b(0) }
    if (hcrc) {
      val c = new java.util.zip.CRC32
      c.update(out.toArray, 0, out.length)
      le16((c.getValue & 0xffff).toInt)
    }
    if (deflateMode == 1) out ++= deflateFixed(raw)
    else if (deflateMode == 2) out ++= deflateDynamic(raw)
    else { // stored blocks, ≤ 40 bytes each (the PNG generator's framing)
      var pos = 0
      var fin = false
      while (!fin) {
        val len = math.min(40, raw.length - pos)
        fin = pos + len >= raw.length
        b(if (fin) 1 else 0)
        le16(len); le16(~len & 0xffff)
        var i = 0
        while (i < len) { out += raw(pos + i); i += 1 }
        pos += len
      }
    }
    val c = new java.util.zip.CRC32
    c.update(raw, 0, raw.length)
    le32(c.getValue)
    le32(raw.length.toLong & 0xffffffffL)
    out.toArray
  }

  /** Decode a SINGLE-member gzip payload: header walk (reserved FLG
    * bits rejected; FEXTRA skipped by XLEN; FNAME/FCOMMENT scanned to
    * their terminators; FHCRC verified when present), full inflate
    * (ISIZE read from the trailer gives the exact output size —
    * single-member only, by design), CRC-32 + ISIZE verification, and
    * the member must consume the whole payload. None for anything
    * malformed — never throws. */
  /** Walk one member's header from `start` (magic, method, option
    * flags in order FEXTRA/FNAME/FCOMMENT/FHCRC, with the CRC-16
    * verified over the header's own bytes when present). Returns the
    * offset of the deflate stream, or -1 on any malformation. Shared
    * by [[gunzip]] (single member) and [[gunzipMembers]] (the RFC
    * 1952 §2.2 member series). */
  private def memberHeaderEnd(p: Array[Byte], start: Int): Int = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    if (start + 10 > p.length) return -1
    if (u8(start) != 0x1f || u8(start + 1) != 0x8b || u8(start + 2) != 8) return -1
    val flg = u8(start + 3)
    if ((flg & 0xe0) != 0) return -1 // reserved bits must be zero
    var pos = start + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (pos + 2 > p.length) return -1
      val xlen = u8(pos) | (u8(pos + 1) << 8)
      pos += 2 + xlen
      if (pos > p.length) return -1
    }
    if ((flg & 8) != 0) { // FNAME
      while (pos < p.length && p(pos) != 0) pos += 1
      if (pos >= p.length) return -1
      pos += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (pos < p.length && p(pos) != 0) pos += 1
      if (pos >= p.length) return -1
      pos += 1
    }
    if ((flg & 2) != 0) { // FHCRC: low 16 bits of the header's CRC-32
      if (pos + 2 > p.length) return -1
      val c = new java.util.zip.CRC32
      c.update(p, start, pos - start)
      if ((c.getValue & 0xffff).toInt != (u8(pos) | (u8(pos + 1) << 8)))
        return -1
      pos += 2
    }
    pos
  }

  def gunzip(p: Array[Byte]): Option[Array[Byte]] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    if (p.length < 18 + 2) { // header(10) + empty stored block + trailer(8)
      if (p.length < 20) return None
    }
    val pos = memberHeaderEnd(p, 0)
    if (pos < 0) return None
    if (p.length - pos < 8 + 1) return None
    val t = p.length - 8 // trailer offset for a single member
    val isize = (u8(t + 4).toLong | (u8(t + 5).toLong << 8) |
      (u8(t + 6).toLong << 16) | (u8(t + 7).toLong << 24))
    if (isize > Int.MaxValue) return None
    val raw = inflate(p, pos, t, isize.toInt) match {
      case Some((r, next)) if next == t => r // member must fill the payload
      case _ => return None
    }
    val c = new java.util.zip.CRC32
    c.update(raw, 0, raw.length)
    val crc = (u8(t).toLong | (u8(t + 1).toLong << 8) |
      (u8(t + 2).toLong << 16) | (u8(t + 3).toLong << 24))
    if (c.getValue != crc) return None
    Some(raw)
  }

  /** RFC 1952 §2.2: a gzip FILE is a SERIES of members — `cat a.gz
    * b.gz` is a valid gzip file, and warehouse text shards routinely
    * arrive that way (shard concatenation, bgzip-class writers). Walks
    * every member (header by option flags, growable inflate — each
    * member's deflate stream is self-delimiting, its trailer only
    * FOLLOWS it — then CRC-32 + ISIZE verified per member), requires
    * the members to exactly tile the payload, and returns the
    * concatenated bytes plus the member count. None on any
    * malformation in any member; `maxOut` bounds total allocation.
    * A single-member stream returns exactly [[gunzip]]'s bytes. */
  def gunzipMembers(p: Array[Byte],
                    maxOut: Int = 1 << 26): Option[(Array[Byte], Int)] =
    gunzipMemberList(p, maxOut).map { ms =>
      val acc = new java.io.ByteArrayOutputStream()
      ms.foreach(m => acc.write(m, 0, m.length))
      (acc.toByteArray, ms.length)
    }

  /** [[gunzipMembers]]' walk with the member BOUNDARIES kept: one
    * decoded byte array per member, in payload order. This is the
    * read primitive for record-per-member containers — Common Crawl
    * `.warc.gz` shards frame every WARC record as its own gzip member
    * (the record parse above needs each member separately, not the
    * concatenation). None on any malformation in any member (a
    * corrupt member's LENGTH is unknowable without inflating it, so
    * the walk cannot resync past one — the caller accounts the whole
    * payload, the e15 idiom); `maxOut` bounds total allocation. */
  def gunzipMemberList(p: Array[Byte],
                       maxOut: Int = 1 << 26): Option[Vector[Array[Byte]]] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    val members = Vector.newBuilder[Array[Byte]]
    var total = 0
    var pos = 0
    var n = 0
    while (pos < p.length) {
      val dstart = memberHeaderEnd(p, pos)
      if (dstart < 0) return None
      if (p.length - dstart < 8) return None
      val (buf, len, next) =
        inflateCore(p, dstart, p.length - 8, maxOut - total) match {
          case Some(r) => r
          case None => return None
        }
      if (next + 8 > p.length) return None
      val c = new java.util.zip.CRC32
      c.update(buf, 0, len)
      val crc = (u8(next).toLong | (u8(next + 1).toLong << 8) |
        (u8(next + 2).toLong << 16) | (u8(next + 3).toLong << 24))
      if (c.getValue != crc) return None
      val isize = (u8(next + 4).toLong | (u8(next + 5).toLong << 8) |
        (u8(next + 6).toLong << 16) | (u8(next + 7).toLong << 24))
      if (isize != (len.toLong & 0xffffffffL)) return None
      members += java.util.Arrays.copyOfRange(buf, 0, len)
      total += len
      pos = next + 8
      n += 1
    }
    if (n == 0) return None
    Some(members.result())
  }
}
