package graft.operators

/** GIF (87a/89a) codec for the multimodal read path (m19) — the one
  * remaining ubiquitous crawl raster format after BMP/PNG/JPEG: logo,
  * icon and animation payloads on every web shard. Public spec
  * (GIF89a, CompuServe 1990; the W3C-hosted grammar): header +
  * logical screen descriptor, global/local color tables, extension
  * blocks as length-prefixed sub-block chains (graphic control,
  * comment, application, plain text — skipped structurally), image
  * descriptors with optional INTERLACE (the four-pass row schedule),
  * and the GIF flavor of LZW: variable code width from
  * `min code size + 1`, clear/EOI codes, 4096-entry dictionary with
  * the KwKwK case, codes packed LSB-first across the sub-block chain.
  *
  * [[parseGif]] decodes the FIRST frame to an RGB raster (palette
  * expansion; interlace resolved) and walks the remaining blocks
  * strictly to the trailer, counting frames: `None` on any
  * malformation — bad signature, missing color table, reserved block
  * labels, an LZW code beyond the dictionary, an out-of-palette
  * index, pixel overrun/underrun, missing trailer, trailing garbage —
  * and never throws. Frames after the first are structurally walked
  * (their LZW data is skipped, not decoded) — first-frame semantics
  * are what the thumbnail/dedup pipeline consumes.
  *
  * [[encodeGif]] is the fixture half (m16's recipe): real LZW with
  * dictionary reset at 4096, canonical width bumps, sub-block size
  * rotation, optional interlace/GCE/comment blocks. BOTH directions
  * are cross-validated against the JDK ImageIO GIF codec in
  * MultimodalSpec (encode → ImageIO reads pixel-identically; ImageIO
  * writes → [[parseGif]] reads pixel-identically).
  */
object Gif {

  final class GifRaster(val width: Int, val height: Int,
                        pal: Array[Int], idx: Array[Byte])
    extends Multimodal.Raster {
    def rgb(x: Int, y: Int): (Int, Int, Int) = {
      val c = pal(idx(y * width + x) & 0xff)
      ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)
    }
    def index(x: Int, y: Int): Int = idx(y * width + x) & 0xff
  }

  final case class Parsed(version: String, raster: GifRaster,
                          nFrames: Int, interlaced: Boolean,
                          nExtensions: Int)

  private object Bad extends scala.util.control.ControlThrowable

  def parseGif(p: Array[Byte]): Option[Parsed] =
    try Some(parse0(p)) catch {
      case Bad => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  private def parse0(p: Array[Byte]): Parsed = {
    def bad(): Nothing = throw Bad
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length < 13) bad()
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") bad()
    val version = sig.substring(3)
    val sw = le16(6)
    val sh = le16(8)
    val packed = u8(10)
    var i = 13
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (i + 3 * n > p.length) bad()
        val t = Array.tabulate(n) { k =>
          (u8(i + 3 * k) << 16) | (u8(i + 3 * k + 1) << 8) | u8(i + 3 * k + 2)
        }
        i += 3 * n
        t
      } else null

    /** Skip a sub-block chain from `from`; returns the offset past its
      * 0 terminator. */
    def skipSubBlocks(from: Int): Int = {
      var j = from
      while (true) {
        if (j >= p.length) bad()
        val n = u8(j)
        j += 1 + n
        if (n == 0) return j
      }
      j
    }

    var nFrames = 0
    var nExt = 0
    var first: GifRaster = null
    var firstInterlaced = false
    var done = false
    while (!done) {
      if (i >= p.length) bad() // ran out before the trailer
      u8(i) match {
        case 0x3B => // trailer
          i += 1
          done = true
        case 0x21 => // extension: label + sub-block chain
          if (i + 1 >= p.length) bad()
          val label = u8(i + 1)
          if (label != 0xF9 && label != 0xFE && label != 0xFF && label != 0x01)
            bad() // reserved label
          nExt += 1
          i = skipSubBlocks(i + 2)
        case 0x2C => // image descriptor
          if (i + 10 > p.length) bad()
          val left = le16(i + 1); val top = le16(i + 3)
          val w = le16(i + 5); val h = le16(i + 7)
          val ip = u8(i + 9)
          i += 10
          if (w == 0 || h == 0 || left + w > sw || top + h > sh) bad()
          val interlaced = (ip & 0x40) != 0
          val lct: Array[Int] =
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              if (i + 3 * n > p.length) bad()
              val t = Array.tabulate(n) { k =>
                (u8(i + 3 * k) << 16) | (u8(i + 3 * k + 1) << 8) | u8(i + 3 * k + 2)
              }
              i += 3 * n
              t
            } else null
          val pal = if (lct != null) lct else gct
          if (pal == null) bad() // no color table at all
          if (i >= p.length) bad()
          val minCode = u8(i)
          i += 1
          if (minCode < 2 || minCode > 8) bad()
          if (nFrames == 0) {
            // decode the first frame; later frames are walked only
            val idx = lzwDecode(p, i, minCode, w * h, pal.length)
            val out = new Array[Byte](w * h)
            if (interlaced) {
              // four-pass row schedule
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < h) {
                  System.arraycopy(idx, src * w, out, y * w, w)
                  src += 1
                  y += step
                }
              }
            } else System.arraycopy(idx, 0, out, 0, w * h)
            first = new GifRaster(w, h, pal, out)
            firstInterlaced = interlaced
          }
          nFrames += 1
          i = skipSubBlocks(i)
        case _ => bad()
      }
    }
    if (i != p.length) bad() // trailing garbage
    if (first == null) bad() // no image
    Parsed(version, first, nFrames, firstInterlaced, nExt)
  }

  /** GIF-LZW decode of the sub-block chain at `off`: exactly `need`
    * indices, each < `palSize`. Throws Bad on any malformation. */
  private def lzwDecode(p: Array[Byte], off: Int, minCode: Int,
                        need: Int, palSize: Int): Array[Byte] = {
    def bad(): Nothing = throw Bad
    @inline def u8(i: Int): Int = p(i) & 0xff
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefix code, appended byte); roots are implicit
    val prefix = new Array[Short](4096)
    val append = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCode + 1
    val out = new Array[Byte](need)
    var produced = 0
    // bit reader across the sub-block chain
    var blockPos = off // offset of the current sub-block's length byte
    var blockEnd = off // exclusive end of current sub-block data
    var i = off // next data byte
    var acc = 0L
    var nbits = 0
    var sawTerminator = false
    @inline def fill(): Unit = {
      while (nbits < width && !sawTerminator) {
        if (i >= blockEnd) {
          if (blockPos >= p.length) bad()
          val n = u8(blockPos)
          if (n == 0) { sawTerminator = true }
          else {
            i = blockPos + 1
            blockEnd = i + n
            if (blockEnd > p.length) bad()
            blockPos = blockEnd
          }
        }
        if (!sawTerminator) { acc |= (u8(i).toLong << nbits); nbits += 8; i += 1 }
      }
    }
    def read(): Int = {
      fill()
      if (nbits < width) bad() // data exhausted mid-code
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>= width
      nbits -= width
      v
    }
    @inline def emitSeq(code: Int, stack: Array[Byte]): Int = {
      // unroll code into stack (reversed), return length
      var c = code
      var n = 0
      while (c >= clear) { stack(n) = append(c); n += 1; c = prefix(c) }
      if (c >= palSize) bad() // root outside the palette
      stack(n) = c.toByte
      n + 1
    }
    val stack = new Array[Byte](4097)
    var prev = -1
    var finished = false
    while (!finished) {
      val code = read()
      if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        finished = true
      } else {
        if (prev < 0) {
          // first code after clear must be a root
          if (code >= clear || code >= palSize) bad()
          if (produced >= need) bad()
          out(produced) = code.toByte
          produced += 1
          prev = code
        } else {
          var n = 0
          var firstByte: Byte = 0
          if (code < next && code != clear && code != eoi) {
            if (code > clear && code >= next) bad()
            n = emitSeq(code, stack)
            firstByte = stack(n - 1)
          } else if (code == next) { // KwKwK
            val m = emitSeq(prev, stack)
            firstByte = stack(m - 1)
            // sequence = prev ++ first(prev)
            // build into stack: prev reversed at 0..m-1; prepend first
            // by shifting: easier to emit prev then firstByte directly
            n = -m // sentinel: emit prev then firstByte below
          } else bad() // code beyond the dictionary
          if (n > 0) {
            if (produced + n > need) bad()
            var k = n - 1
            while (k >= 0) { out(produced) = stack(k); produced += 1; k -= 1 }
          } else {
            val m = -n
            if (produced + m + 1 > need) bad()
            var k = m - 1
            while (k >= 0) { out(produced) = stack(k); produced += 1; k -= 1 }
            out(produced) = firstByte
            produced += 1
          }
          if (next < 4096) {
            prefix(next) = prev.toShort
            append(next) = firstByte
            next += 1
            if (next < 4096 && next == (1 << width) && width < 12) width += 1
          }
          prev = code
        }
      }
    }
    if (produced != need) bad()
    // padding bits after EOI are ignored; the walker re-skips the
    // sub-block chain structurally (see parse0), so chain termination
    // is enforced there
    out
  }

  // ======================= encoder (fixture half) ===========================

  /** Encode one frame as GIF. Palette is padded to the next power of
    * two (min 4 entries); `chunk` sets the sub-block size (2..255). */
  def encodeGif(w: Int, h: Int, palette: Array[(Int, Int, Int)],
                idxAt: (Int, Int) => Int, interlace: Boolean = false,
                version89: Boolean = true, gce: Boolean = false,
                comment: Option[String] = None, chunk: Int = 255,
                extraFrame: Boolean = false): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256)
    var bits = 1
    while ((1 << bits) < palette.length || bits < 2) bits += 1
    val n = 1 << bits
    val out = new java.io.ByteArrayOutputStream(w * h + 256)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write((if (version89) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0x80 | ((bits - 1) & 7) << 4 | ((bits - 1) & 7)) // GCT, res, size
    out.write(0) // background
    out.write(0) // aspect
    var k = 0
    while (k < n) {
      val (r, g, b) =
        if (k < palette.length) palette(k) else (0, 0, 0)
      out.write(r); out.write(g); out.write(b)
      k += 1
    }
    if (gce && version89) {
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0); le16(0); out.write(0) // no transparency, no delay
      out.write(0)
    }
    comment.foreach { c =>
      if (version89) {
        out.write(0x21); out.write(0xFE)
        val cb = c.getBytes("US-ASCII")
        var o = 0
        while (o < cb.length) {
          val m = math.min(255, cb.length - o)
          out.write(m); out.write(cb, o, m)
          o += m
        }
        out.write(0)
      }
    }
    out.write(0x2C)
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlace) 0x40 else 0) // no LCT
    val minCode = math.max(2, bits)
    out.write(minCode)
    // gather indices in transmission order (interlace schedule)
    val seq = new Array[Int](w * h)
    var s = 0
    val rows: Seq[Int] =
      if (interlace)
        (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)
      else 0 until h
    rows.foreach { y =>
      var x = 0
      while (x < w) {
        val v = idxAt(x, y)
        require(v >= 0 && v < palette.length, "index outside the palette")
        seq(s) = v; s += 1
        x += 1
      }
    }
    val lzw = lzwEncode(seq, minCode)
    var o = 0
    val ch = math.max(2, math.min(255, chunk))
    while (o < lzw.length) {
      val m = math.min(ch, lzw.length - o)
      out.write(m); out.write(lzw, o, m)
      o += m
    }
    out.write(0) // sub-block terminator
    if (extraFrame) {
      // a second tiny frame: the reader must WALK it structurally
      // (first-frame semantics) and count it
      val fw = math.min(2, w); val fh = math.min(2, h)
      out.write(0x2C)
      le16(0); le16(0); le16(fw); le16(fh)
      out.write(0) // no LCT, no interlace
      out.write(minCode)
      val z = lzwEncode(Array.fill(fw * fh)(0), minCode)
      var zo = 0
      while (zo < z.length) {
        val m = math.min(255, z.length - zo)
        out.write(m); out.write(z, zo, m)
        zo += m
      }
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }

  private def lzwEncode(seq: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(seq.length)
    var acc = 0L
    var nbits = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>= 8
        nbits -= 8
      }
    }
    var dict = new java.util.HashMap[Int, Int](8192)
    var next = eoi + 1
    emit(clear)
    if (seq.isEmpty) { emit(eoi) }
    else {
      var prev = seq(0)
      var i = 1
      while (i < seq.length) {
        val k = seq(i)
        val key = (prev << 12) | k // prev < 4096, k < 256 < 4096
        val hit = dict.get(key)
        if (dict.containsKey(key)) prev = hit
        else {
          emit(prev)
          // DEFERRED width bump (the giflib/ImageIO wire behavior):
          // the check runs after the emission and BEFORE the new
          // assignment, so the first code that fills the width is
          // still emitted narrow — the decoder, one table entry
          // behind, bumps at the matching bit position
          if (next >= (1 << width) && width < 12) width += 1
          if (next < 4096) {
            dict.put(key, next)
            next += 1
          } else {
            emit(clear) // dictionary full: reset (the common policy)
            dict = new java.util.HashMap[Int, Int](8192)
            next = eoi + 1
            width = minCode + 1
          }
          prev = k
        }
        i += 1
      }
      emit(prev)
      if (next >= (1 << width) && width < 12) width += 1
      emit(eoi)
    }
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }
}
