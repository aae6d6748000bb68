package graft.operators

/** Baseline TIFF 6.0 read path — the raster container scans and
  * scanned-document corpora actually arrive in (and the last
  * ubiquitous crawl raster after BMP/PNG/JPEG/GIF). Implements the
  * public TIFF 6.0 specification subset a curation pass needs:
  *
  *   - both byte orders (`II` little / `MM` big endian) through one
  *     order-parameterized reader — a format whose ENDIANNESS is
  *     data, not convention;
  *   - the IFD walk: 12-byte entries, SHORT/LONG value types, inline
  *     vs offset-addressed values (count × size ≤ 4 bytes is inline —
  *     misreading that rule corrupts every small array);
  *   - 8-bit grayscale (PhotometricInterpretation 1) and RGB (2),
  *     chunky planar config, STRIP layout (RowsPerStrip /
  *     StripOffsets / StripByteCounts, each strip decoded
  *     independently);
  *   - compressions: 1 (none), 32773 (PackBits), 5 (LZW — the TIFF
  *     flavor: MSB-first code packing, Clear=256/EOI=257, EARLY
  *     code-width change at table size 2^n−1, per-strip reset), with
  *     horizontal-differencing Predictor 2 (what real LZW writers
  *     emit);
  *   - validation at every layer: magic/42, entry bounds, required
  *     tags, bits-per-sample 8, strip tiling of the exact raster
  *     size, PackBits/LZW output-length exactness, trailing-code
  *     integrity.
  *
  * Deliberate boundaries (fail-closed, counted by callers): tiled
  * layout, 16-bit samples, palette TIFF, planar=2 and the fax/JPEG
  * compressions are rejected — the profile matches what scanners and
  * exporters emit for 8-bit continuous-tone images.
  *
  * TiffSpec cross-validates BOTH directions against the JDK's
  * ImageIO TIFF codec (Java 9+): our encoder's bytes (both orders ×
  * all three compressions × predictor) read pixel-identically, and
  * ImageIO-written LZW/PackBits/uncompressed streams decode
  * pixel-identically by this parser.
  *
  * Scale: one linear pass per strip, used from mapPartitions —
  * map-only, no state, never throws.
  */
object Tiff {

  final class TiffRaster(val width: Int, val height: Int,
                         samples: Int, data: Array[Byte])
      extends Multimodal.Raster {
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      if (samples == 1) {
        val g = data(y * width + x) & 0xff
        (g, g, g)
      } else {
        val o = (y * width + x) * 3
        (data(o) & 0xff, data(o + 1) & 0xff, data(o + 2) & 0xff)
      }
    }
  }

  final case class Parsed(raster: TiffRaster, bigEndian: Boolean,
                          compression: Int, predictor: Int,
                          gray: Boolean, nStrips: Int)

  // ---- byte-order-parameterized reads ------------------------------------

  private def u16(p: Array[Byte], i: Int, be: Boolean): Int =
    if (be) ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    else (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  private def u32(p: Array[Byte], i: Int, be: Boolean): Long =
    if (be) (u16(p, i, be).toLong << 16) | u16(p, i + 2, be)
    else u16(p, i, be).toLong | (u16(p, i + 2, be).toLong << 16)

  /** One IFD entry's value array as longs (types SHORT=3 / LONG=4),
    * handling the inline-vs-offset rule. None on bounds/type issues. */
  private def values(p: Array[Byte], entryOff: Int, be: Boolean): Option[Array[Long]] = {
    val typ = u16(p, entryOff + 2, be)
    val count = u32(p, entryOff + 4, be)
    val size = typ match {
      case 3 => 2
      case 4 => 4
      case _ => return None
    }
    if (count <= 0 || count > (1 << 20)) return None
    val total = count * size
    val base =
      if (total <= 4) entryOff + 8
      else {
        val off = u32(p, entryOff + 8, be)
        if (off < 8 || off + total > p.length) return None
        off.toInt
      }
    if (base + total > p.length) return None
    Some(Array.tabulate(count.toInt) { k =>
      if (size == 2) u16(p, base + 2 * k, be).toLong
      else u32(p, base + 4 * k, be)
    })
  }

  // ---- codecs --------------------------------------------------------------

  /** PackBits (TIFF §9) decode to exactly `outLen` bytes. */
  private[graft] def unpackBits(p: Array[Byte], off: Int, end: Int,
                                    outLen: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](outLen)
    var i = off
    var o = 0
    while (i < end) {
      val n = p(i)
      i += 1
      if (n >= 0) {
        val run = n + 1
        if (i + run > end || o + run > outLen) return None
        System.arraycopy(p, i, out, o, run)
        i += run; o += run
      } else if (n != -128) {
        val run = 1 - n
        if (i >= end || o + run > outLen) return None
        java.util.Arrays.fill(out, o, o + run, p(i))
        i += 1; o += run
      } // -128: no-op
    }
    if (o == outLen) Some(out) else None
  }

  /** TIFF-flavor LZW decode (spec §13): MSB-first packing, Clear=256,
    * EOI=257, EARLY code-width change (the table's next index hitting
    * 2^w − 1 bumps w), per-call fresh state. Exactly `outLen` bytes. */
  private[graft] def lzwDecode(p: Array[Byte], off: Int, end: Int,
                                   outLen: Int): Option[Array[Byte]] = {
    val Clear = 256; val Eoi = 257
    val out = new Array[Byte](outLen)
    var o = 0
    // dictionary as (prefix, suffix) arrays; 0..255 implicit roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = 258
    var width = 9
    var bitPos = off.toLong * 8
    val bitEnd = end.toLong * 8
    var prev = -1
    def read(): Int = {
      if (bitPos + width > bitEnd) return -1
      var v = 0
      var k = 0
      while (k < width) {
        val b = (p((bitPos >> 3).toInt) >> (7 - (bitPos & 7)).toInt) & 1
        v = (v << 1) | b
        bitPos += 1; k += 1
      }
      v
    }
    def emit(code: Int): Boolean = {
      // expand code to out; returns false on overflow/invalid
      var stack = List.empty[Byte]
      var c = code
      var guard = 0
      while (c >= 256) {
        if (c >= next || guard > 4096) return false
        stack = suffix(c) :: stack
        c = prefix(c)
        guard += 1
      }
      stack = c.toByte :: stack
      stack.foreach { b =>
        if (o >= outLen) return false
        out(o) = b; o += 1
      }
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= 256) c = prefix(c)
      c.toByte
    }
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return None // ran off the strip without EOI
      if (code == Clear) {
        next = 258; width = 9; prev = -1
      } else if (code == Eoi) {
        done = true
      } else if (prev < 0) {
        if (code > 255) return None // first code after clear must be a root
        if (o >= outLen) return None
        out(o) = code.toByte; o += 1
        prev = code
      } else {
        if (code < next) {
          val start = o
          if (!emit(code)) return None
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = out(start); next += 1
          }
        } else if (code == next && next < 4096) {
          // KwKwK
          val fb = firstByte(prev)
          prefix(next) = prev; suffix(next) = fb; next += 1
          if (!emit(code)) return None
        } else return None
        prev = code
        // EARLY change: bump when the NEXT insertion index reaches 2^w-1
        if (next == (1 << width) - 1 && width < 12) width += 1
      }
    }
    if (o == outLen) Some(out) else None
  }

  /** Horizontal-differencing predictor (tag 317 = 2) reversal, per
    * row, per channel. */
  private def undiff(row: Array[Byte], rowOff: Int, w: Int, samples: Int): Unit = {
    var i = rowOff + samples
    val end = rowOff + w * samples
    while (i < end) {
      row(i) = (row(i) + row(i - samples)).toByte
      i += 1
    }
  }

  // ---- parser --------------------------------------------------------------

  def parseTiff(p: Array[Byte], maxOut: Int = 1 << 26): Option[Parsed] = {
    if (p.length < 8) return None
    val be =
      if (p(0) == 'M' && p(1) == 'M') true
      else if (p(0) == 'I' && p(1) == 'I') false
      else return None
    if (u16(p, 2, be) != 42) return None
    val ifd = u32(p, 4, be)
    if (ifd < 8 || ifd + 2 > p.length) return None
    val n = u16(p, ifd.toInt, be)
    val base = ifd.toInt + 2
    if (base + 12 * n + 4 > p.length) return None
    var tags = Map.empty[Int, Array[Long]]
    var k = 0
    var lastTag = -1
    while (k < n) {
      val off = base + 12 * k
      val tag = u16(p, off, be)
      if (tag <= lastTag) return None // spec: ascending tag order
      lastTag = tag
      values(p, off, be) match {
        case Some(v) => tags += (tag -> v)
        // unknown value types (RATIONAL resolutions, ASCII Software
        // tags …) are skipped like any real reader skips unknown
        // tags; a REQUIRED tag that stays missing fails below
        case None => ()
      }
      k += 1
    }
    def one(tag: Int): Option[Long] = tags.get(tag).filter(_.length == 1).map(_(0))
    val w = one(256).getOrElse(return None)
    val h = one(257).getOrElse(return None)
    if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) return None
    val photo = one(262).getOrElse(return None)
    val samples = one(277).getOrElse(1L)
    val gray = photo == 1 && samples == 1
    if (!gray && !(photo == 2 && samples == 3)) return None
    val bits = tags.getOrElse(258, Array(8L))
    if (bits.length != samples.toInt || bits.exists(_ != 8L)) return None
    val comp = one(259).getOrElse(1L)
    if (comp != 1 && comp != 5 && comp != 32773) return None
    val predictor = one(317).getOrElse(1L)
    // predictor 2 is defined by the LZW section (TIFF 6.0 §14) and
    // real writers pair it with LZW; with other codecs readers
    // disagree (verified: ImageIO ignores it on uncompressed strips)
    if (predictor != 1 && !(predictor == 2 && comp == 5)) return None
    if (one(284).getOrElse(1L) != 1L) return None // chunky only
    if (tags.contains(322) || tags.contains(323)) return None // tiled
    val rps = one(278).getOrElse(h).min(h)
    if (rps <= 0) return None
    val offs = tags.getOrElse(273, return None)
    val cnts = tags.getOrElse(279, return None)
    val nStrips = ((h + rps - 1) / rps).toInt
    if (offs.length != nStrips || cnts.length != nStrips) return None
    val rowBytes = w.toInt * samples.toInt
    if (w * h * samples > maxOut) return None
    val out = new Array[Byte](rowBytes * h.toInt)
    var s = 0
    while (s < nStrips) {
      val rows0 = (s * rps).toInt
      val rows = math.min(rps, h - s * rps).toInt
      val need = rows * rowBytes
      val so = offs(s); val sc = cnts(s)
      if (so < 8 || sc < 0 || so + sc > p.length) return None
      val strip: Array[Byte] = comp match {
        case 1L =>
          if (sc != need) return None
          java.util.Arrays.copyOfRange(p, so.toInt, (so + sc).toInt)
        case 32773L =>
          unpackBits(p, so.toInt, (so + sc).toInt, need).getOrElse(return None)
        case _ =>
          lzwDecode(p, so.toInt, (so + sc).toInt, need).getOrElse(return None)
      }
      if (predictor == 2) {
        var r = 0
        while (r < rows) { undiff(strip, r * rowBytes, w.toInt, samples.toInt); r += 1 }
      }
      System.arraycopy(strip, 0, out, rows0 * rowBytes, need)
      s += 1
    }
    Some(Parsed(new TiffRaster(w.toInt, h.toInt, samples.toInt, out),
      be, comp.toInt, predictor.toInt, gray, nStrips))
  }

  // ---- encoder (fixture half) ----------------------------------------------

  private[graft] def packBits(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length + 16)
    var i = 0
    while (i < raw.length) {
      // find a run
      var j = i
      while (j + 1 < raw.length && raw(j + 1) == raw(i) && j - i < 126) j += 1
      if (j > i) { // run of (j-i+1) ≥ 2
        out.write(i - j) // negative count
        out.write(raw(i))
        i = j + 1
      } else {
        // literal run until next 3-byte repeat or cap
        var e = i + 1
        while (e < raw.length && e - i < 128 &&
               !(e + 2 < raw.length && raw(e) == raw(e + 1) && raw(e) == raw(e + 2)))
          e += 1
        out.write(e - i - 1)
        out.write(raw, i, e - i)
        i = e
      }
    }
    out.toByteArray
  }

  private[graft] def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 16)
    var cur = 0
    var nbits = 0
    var width = 9
    def put(code: Int): Unit = {
      cur = (cur << width) | code
      nbits += width
      while (nbits >= 8) {
        out.write((cur >> (nbits - 8)) & 0xff)
        nbits -= 8
      }
    }
    val dict = new java.util.HashMap[Int, Int]()
    var next = 258
    def reset(): Unit = { dict.clear(); next = 258; width = 9 }
    put(256) // Clear
    reset()
    var prev = -1
    var i = 0
    while (i < raw.length) {
      val b = raw(i) & 0xff
      if (prev < 0) prev = b
      else {
        val key = (prev << 8) | b
        val hit = dict.getOrDefault(key, -1)
        if (hit >= 0) prev = hit
        else {
          put(prev)
          dict.put(key, next); next += 1
          // width alignment with the early-change decoder: the
          // decoder's table runs ONE ENTRY BEHIND (it can only form
          // an entry after the following code arrives), so the
          // encoder bumps at 2^w where the decoder bumps at 2^w − 1
          if (next == (1 << width) && width < 12) width += 1
          if (next == 4094) { put(256); reset() }
          prev = b
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(257) // EOI
    if (nbits > 0) out.write((cur << (8 - nbits)) & 0xff)
    out.toByteArray
  }

  /** Write a baseline TIFF: 8-bit gray or RGB, strip layout,
    * compression 1/5/32773, optional predictor 2, either byte order.
    * Strips are `rowsPerStrip` tall. `corruptStrip` perturbs that
    * strip's first payload byte (decode-or-validation must catch). */
  def encodeTiff(width: Int, height: Int, gray: Boolean,
                 px: (Int, Int) => (Int, Int, Int),
                 bigEndian: Boolean = false,
                 compression: Int = 1,
                 predictor: Int = 1,
                 rowsPerStrip: Int = 8,
                 corruptStrip: Int = -1): Array[Byte] = {
    val samples = if (gray) 1 else 3
    val rowBytes = width * samples
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      val raw = new Array[Byte](rows * rowBytes)
      var r = 0
      while (r < rows) {
        val y = s * rowsPerStrip + r
        var x = 0
        while (x < width) {
          val (pr, pg, pb) = px(x, y)
          if (gray) raw(r * rowBytes + x) = pr.toByte
          else {
            val o = r * rowBytes + x * 3
            raw(o) = pr.toByte; raw(o + 1) = pg.toByte; raw(o + 2) = pb.toByte
          }
          x += 1
        }
        r += 1
      }
      if (predictor == 2 && compression == 5) {
        var r2 = rows - 1
        while (r2 >= 0) {
          // forward difference (right to left)
          val off = r2 * rowBytes
          var i = off + rowBytes - 1
          while (i >= off + samples) {
            raw(i) = (raw(i) - raw(i - samples)).toByte
            i -= 1
          }
          r2 -= 1
        }
      }
      val body = compression match {
        case 1 => raw
        case 5 => lzwEncode(raw)
        case _ => packBits(raw)
      }
      if (s == corruptStrip && body.nonEmpty) {
        val c = body.clone(); c(0) = (c(0) ^ 0x55).toByte; c
      } else body
    }
    val out = new java.io.ByteArrayOutputStream(4096)
    def w16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      if (bigEndian) { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
      else { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    out.write(if (bigEndian) 'M' else 'I'); out.write(if (bigEndian) 'M' else 'I')
    w16(42)
    // layout: header(8) | strip data | aux arrays | IFD
    val stripOffs = new Array[Long](nStrips)
    var pos = 8L
    strips.zipWithIndex.foreach { case (b, i) => stripOffs(i) = pos; pos += b.length }
    var aux = pos
    val bpsOff = if (!gray) { val o = aux; aux += 6; o } else 0L
    val soOff = if (nStrips > 1) { val o = aux; aux += 4L * nStrips; o } else 0L
    val scOff = if (nStrips > 1) { val o = aux; aux += 4L * nStrips; o } else 0L
    val ifdOff = aux
    w32(ifdOff)
    strips.foreach(out.write)
    if (!gray) { w16(8); w16(8); w16(8) }
    if (nStrips > 1) {
      stripOffs.foreach(w32)
      strips.foreach(b => w32(b.length.toLong))
    }
    // IFD: entries must be in ascending tag order
    case class E(tag: Int, typ: Int, count: Long, inline: Option[Long], off: Long = 0)
    val entries = Seq(
      Some(E(256, 4, 1, Some(width.toLong))),
      Some(E(257, 4, 1, Some(height.toLong))),
      if (gray) Some(E(258, 3, 1, Some(8L)))
      else Some(E(258, 3, 3, None, bpsOff)),
      Some(E(259, 3, 1, Some(compression.toLong))),
      Some(E(262, 3, 1, Some(if (gray) 1L else 2L))),
      if (nStrips > 1) Some(E(273, 4, nStrips.toLong, None, soOff))
      else Some(E(273, 4, 1, Some(stripOffs(0)))),
      Some(E(277, 3, 1, Some(samples.toLong))),
      Some(E(278, 4, 1, Some(rowsPerStrip.toLong))),
      if (nStrips > 1) Some(E(279, 4, nStrips.toLong, None, scOff))
      else Some(E(279, 4, 1, Some(strips(0).length.toLong))),
      Some(E(284, 3, 1, Some(1L))),
      if (predictor == 2 && compression == 5) Some(E(317, 3, 1, Some(2L)))
      else None
    ).flatten
    w16(entries.length)
    entries.foreach { e =>
      w16(e.tag); w16(e.typ); w32(e.count)
      e.inline match {
        case Some(v) =>
          // inline values sit in the first bytes of the 4-byte field
          if (e.typ == 3) { w16(v.toInt); w16(0) } else w32(v)
        case None => w32(e.off)
      }
    }
    w32(0) // no next IFD
    out.toByteArray
  }
}
