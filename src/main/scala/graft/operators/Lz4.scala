package graft.operators

/** Hand-written LZ4 frame decoder — the fifth codec of the intake
  * ladder (gzip t25, zstd t30, brotli t31, bzip2 t40, xz t41): LZ4
  * is the data-lake interchange codec — shuffle spills, Kafka
  * payloads, fast-tier archives. Implements the public LZ4 frame
  * format specification (v1.6.x) and the LZ4 block format:
  *
  *   - frame: magic, FLG/BD descriptor (version 01, block
  *     independence, block checksums, content size, content
  *     checksum, dictID rejected, reserved bits enforced), the
  *     header-checksum byte (xxh32(descriptor) >> 8), 4-byte
  *     block headers (high bit = stored block), EndMark, optional
  *     per-block xxh32 and final content xxh32;
  *   - block: token sequences — 4-bit literal/match lengths with
  *     255-saturated extension bytes, 2-byte little-endian offsets
  *     (zero offset rejected), overlap-correct copies, the
  *     end-of-block literal run; in LINKED mode (B.Indep = 0)
  *     matches may reach back across block boundaries into the
  *     64 KiB window — the mode real lz4(1) streams use by default;
  *   - xxHash32 implemented from its public specification (the
  *     frame format depends on it three times: header byte, block
  *     checksums, content checksum).
  *
  * Fail-closed: reserved bits/versions, dictID frames, declared
  * content size mismatch, any checksum mismatch, output overrun of
  * the declared maximum block size, match before the window start,
  * trailing bytes after the frame.
  *
  * Lz4Spec cross-validates against TWO independent real
  * implementations: lz4-java's frame writer (the fixture encoder —
  * block sizes 64K–4M, independent and LINKED modes, content
  * checksums) and the system lz4(1) binary, plus a malformation per
  * layer and a byte-flip sweep.
  *
  * Scale: one linear pass, used from mapPartitions — map-only,
  * never throws.
  */
object Lz4 {

  private object Bad extends scala.util.control.ControlThrowable

  // ---- xxHash32 (public spec; seed 0 throughout the frame format) ---------
  private final val P1 = 0x9E3779B1
  private final val P2 = 0x85EBCA77
  private final val P3 = 0xC2B2AE3D
  private final val P4 = 0x27D4EB2F
  private final val P5 = 0x165667B1

  private def rotl(x: Int, r: Int): Int = java.lang.Integer.rotateLeft(x, r)
  private def u32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private[graft] def xxh32(b: Array[Byte], off: Int, len: Int, seed: Int = 0): Int = {
    var h = 0
    var i = off
    val end = off + len
    if (len >= 16) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 16
      while (i <= limit) {
        v1 = rotl(v1 + u32le(b, i) * P2, 13) * P1
        v2 = rotl(v2 + u32le(b, i + 4) * P2, 13) * P1
        v3 = rotl(v3 + u32le(b, i + 8) * P2, 13) * P1
        v4 = rotl(v4 + u32le(b, i + 12) * P2, 13) * P1
        i += 16
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
    } else h = seed + P5
    h += len
    while (i + 4 <= end) {
      h = rotl(h + u32le(b, i) * P3, 17) * P4
      i += 4
    }
    while (i < end) {
      h = rotl(h + (b(i) & 0xff) * P5, 11) * P1
      i += 1
    }
    h ^= h >>> 15
    h *= P2
    h ^= h >>> 13
    h *= P3
    h ^= h >>> 16
    h
  }

  /** Decode one LZ4 block into `out` at `outPos`; matches may reach
    * back to `windowStart` (linked mode) — never before. Returns the
    * new output position. */
  private def block(p: Array[Byte], off: Int, end: Int, out: Array[Byte],
                    outPos0: Int, outCap: Int, windowStart: Int): Int = {
    var ip = off
    var op = outPos0
    while (ip < end) {
      val token = p(ip) & 0xff
      ip += 1
      // literal length
      var ll = token >>> 4
      if (ll == 15) {
        var b = 0xff
        while (b == 0xff) {
          if (ip >= end) throw Bad
          b = p(ip) & 0xff
          ip += 1
          ll += b
          if (ll < 0) throw Bad
        }
      }
      if (ip + ll > end || op + ll > outCap) throw Bad
      System.arraycopy(p, ip, out, op, ll)
      ip += ll
      op += ll
      if (ip < end) {
        // a match follows
        if (ip + 2 > end) throw Bad
        val offset = (p(ip) & 0xff) | ((p(ip + 1) & 0xff) << 8)
        ip += 2
        if (offset == 0) throw Bad
        if (op - offset < windowStart) throw Bad
        var ml = (token & 0x0f) + 4
        if ((token & 0x0f) == 15) {
          var b = 0xff
          while (b == 0xff) {
            if (ip >= end) throw Bad
            b = p(ip) & 0xff
            ip += 1
            ml += b
            if (ml < 0) throw Bad
          }
        }
        if (op + ml > outCap) throw Bad
        var k = 0
        while (k < ml) { out(op + k) = out(op + k - offset); k += 1 }
        op += ml
      }
    }
    op
  }

  /** Decompress one LZ4 frame. None on any malformation; `maxOut`
    * bounds total allocation. */
  def decompress(p: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] = {
    try {
      if (p.length < 11) return None
      if (u32le(p, 0) != 0x184D2204) return None
      val flg = p(4) & 0xff
      if ((flg >>> 6) != 1) return None // version must be 01
      val bIndep = (flg & 0x20) != 0
      val bChecksum = (flg & 0x10) != 0
      val cSize = (flg & 0x08) != 0
      val cChecksum = (flg & 0x04) != 0
      if ((flg & 0x02) != 0) return None // reserved
      if ((flg & 0x01) != 0) return None // dictID: rejected profile
      val bd = p(5) & 0xff
      if ((bd & 0x8f) != 0) return None // reserved bits
      val bmax = (bd >>> 4) & 7
      if (bmax < 4 || bmax > 7) return None
      val maxBlock = 1 << (8 + 2 * bmax) // 64K / 256K / 1M / 4M
      var pos = 6
      var declared = -1L
      if (cSize) {
        declared = 0L
        var k = 0
        while (k < 8) { declared |= (p(pos + k) & 0xffL) << (8 * k); k += 1 }
        pos += 8
      }
      // header checksum byte covers FLG..end of descriptor
      val hc = p(pos) & 0xff
      if (((xxh32(p, 4, pos - 4) >>> 8) & 0xff) != hc) return None
      pos += 1
      var outBuf = new Array[Byte](
        if (declared >= 0 && declared <= maxOut) declared.toInt
        else math.min(maxOut, math.max(1 << 16, p.length * 4)))
      var op = 0
      var done = false
      while (!done) {
        if (pos + 4 > p.length) return None
        val hdr = u32le(p, pos)
        pos += 4
        if (hdr == 0) done = true
        else {
          val stored = (hdr & 0x80000000) != 0
          val bsize = hdr & 0x7fffffff
          if (bsize == 0 || bsize > maxBlock) return None
          if (pos + bsize > p.length) return None
          // grow the output if needed (content size unknown)
          val need = op + maxBlock
          if (need > outBuf.length) {
            if (need > maxOut) return None
            val n = math.min(maxOut.toLong,
              math.max(outBuf.length.toLong * 2, need.toLong)).toInt
            outBuf = java.util.Arrays.copyOf(outBuf, n)
          }
          val windowStart = if (bIndep) op else math.max(0, op - 65536)
          if (stored) {
            if (op + bsize > outBuf.length) return None
            System.arraycopy(p, pos, outBuf, op, bsize)
            op += bsize
          } else {
            val newOp = block(p, pos, pos + bsize, outBuf, op,
              math.min(outBuf.length, op + maxBlock), windowStart)
            if (newOp - op > maxBlock) return None
            op = newOp
          }
          if (bChecksum) {
            if (pos + bsize + 4 > p.length) return None
            if (u32le(p, pos + bsize) != xxh32(p, pos, bsize)) return None
            pos += 4
          }
          pos += bsize
        }
      }
      if (declared >= 0 && declared != op) return None
      if (cChecksum) {
        if (pos + 4 > p.length) return None
        if (u32le(p, pos) != xxh32(outBuf, 0, op)) return None
        pos += 4
      }
      if (pos != p.length) return None // trailing bytes / concatenation
      Some(java.util.Arrays.copyOf(outBuf, op))
    } catch {
      case Bad => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }
}
