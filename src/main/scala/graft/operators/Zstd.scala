package graft.operators

/** Hand-written Zstandard (RFC 8878) frame decoder — the OTHER wire
  * format modern 100-TB corpora arrive in (`.zst` shards next to
  * t25/t27's gzip). Decode-only by design: fixtures compress with the
  * real zstd library already on the provided classpath (zstd-jni,
  * shipped by Spark for shuffle compression), so the certificate is
  * "our decoder reads genuine zstd output" — the strongest possible
  * form; ZstdSpec round-trips against zstd-jni across levels and
  * shapes and corrupts streams at every structural layer.
  *
  * Implements the frame SERIES format of RFC 8878 §3.1.2
  * ([[frameList]] / [[decompressSeries]]: zstd frames interleaved
  * with skippable frames, the shape pzstd and seekable-zstd write)
  * and, per frame: frame header (window
  * descriptor / single-segment, all four frame-content-size fields,
  * dictionary ids rejected as out of profile, content checksum
  * VERIFIED via a hand-written XXH64), raw / RLE / compressed blocks,
  * literals in all four forms (raw, RLE, Huffman-compressed with
  * FSE-compressed OR direct 4-bit weights, treeless repeat), 1- and
  * 4-stream literal bitstreams, sequences with all four
  * symbol-compression modes (the RFC's predefined distributions, RLE,
  * FSE-compressed, repeat), the backward bitstream, interleaved FSE
  * state machines, the three-slot repeat-offset history with the
  * literals-length-0 special case, and overlap-correct sequence
  * execution against the whole decoded window. `None` on ANY
  * malformation — never throws.
  */
object Zstd {

  private object Bad extends scala.util.control.ControlThrowable

  // ---- backward bitstream (§4.1): bits are written little-endian
  // and read from the END; the last byte carries a 1 sentinel.
  private final class BackBits(buf: Array[Byte], start: Int, end: Int) {
    var bitPos: Int = {
      if (end <= start) -1
      else {
        val last = buf(end - 1) & 0xff
        if (last == 0) -1 // missing sentinel
        else (end - start - 1) * 8 + (31 - Integer.numberOfLeadingZeros(last))
      }
    }
    def bad: Boolean = bitPos < 0
    /** Read n ≤ 31 bits below the cursor (highest position = MSB);
      * bits past the stream start read as zeros and drive bitPos
      * negative — callers detect via [[overread]], matching the
      * reference decoder's reload-then-detect discipline. */
    def read(n: Int): Int = {
      if (n == 0 || bitPos <= -64) return 0
      bitPos -= n
      val lo = math.max(bitPos, 0)
      var v = 0
      var i = lo
      while (i < bitPos + n) {
        v |= (((buf(start + (i >> 3)) & 0xff) >> (i & 7)) & 1) << (i - lo)
        i += 1
      }
      if (bitPos < 0) v << math.min(-bitPos, 31) else v
    }
    def overread: Boolean = bitPos < 0
    def finished: Boolean = bitPos == 0
  }

  // ---- FSE decode table (§4.1.1) ------------------------------------------
  private final class FseTable(val accuracyLog: Int, val symbol: Array[Int],
                               val nbBits: Array[Int], val newStateBase: Array[Int])

  private def fseBuild(counts: Array[Int], accuracyLog: Int): Option[FseTable] = {
    val size = 1 << accuracyLog
    val sym = new Array[Int](size)
    var high = size - 1
    // "less than 1" (−1) symbols take the table's last cells, lowest
    // symbol at the highest cell (ascending walk, highThreshold
    // descending — verified against real reference-encoder streams)
    var i = 0
    while (i < counts.length) {
      if (counts(i) == -1) {
        if (high < 0) return None
        sym(high) = i; high -= 1
      } else if (counts(i) < -1 || counts(i) > size) return None
      i += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    var pos = 0
    i = 0
    while (i < counts.length) {
      var c = 0
      while (c < counts(i)) {
        sym(pos) = i
        do pos = (pos + step) & (size - 1) while (pos > high)
        c += 1
      }
      i += 1
    }
    if (pos != 0) return None // counts must exactly fill the table
    val next = counts.map(c => if (c == -1) 1 else c)
    val nb = new Array[Int](size)
    val base = new Array[Int](size)
    i = 0
    while (i < size) {
      val s = sym(i)
      val n = next(s); next(s) += 1
      if (n <= 0) return None
      val b = 31 - Integer.numberOfLeadingZeros(n)
      nb(i) = accuracyLog - b
      base(i) = (n << nb(i)) - size
      i += 1
    }
    Some(new FseTable(accuracyLog, sym, nb, base))
  }

  /** Parse an FSE table description (the NCount threshold coding of
    * §4.1.1, mirroring the reference FSE_readNCount): forward
    * little-endian bits, dynamic threshold narrowing, the −1
    * "less-than-one" probability, and the 2-bit zero-repeat chains.
    * Returns the table and the byte length consumed. */
  private def fseParse(buf: Array[Byte], off: Int, end: Int,
                       maxSym: Int, maxLog: Int): Option[(FseTable, Int)] = {
    var bitPos = 0
    def peek(n: Int): Int = { // forward LE peek at bitPos; -1 on overrun
      var v = 0
      var i = 0
      while (i < n) {
        val p = bitPos + i
        val idx = off + (p >> 3)
        if (idx >= end) return -1
        v |= (((buf(idx) & 0xff) >> (p & 7)) & 1) << i
        i += 1
      }
      v
    }
    val alRaw = peek(4)
    if (alRaw < 0) return None
    bitPos += 4
    val accuracyLog = alRaw + 5
    if (accuracyLog > maxLog) return None
    val tableSize = 1 << accuracyLog
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = accuracyLog + 1
    val counts = new scala.collection.mutable.ArrayBuffer[Int]()
    var prev0 = false
    while (remaining > 1) {
      if (counts.length > maxSym) return None
      if (prev0) {
        var rep = peek(2)
        if (rep < 0) return None
        bitPos += 2
        while (rep == 3) {
          counts += 0; counts += 0; counts += 0
          if (counts.length > maxSym + 1) return None
          rep = peek(2)
          if (rep < 0) return None
          bitPos += 2
        }
        var k = 0
        while (k < rep) { counts += 0; k += 1 }
        prev0 = false
      } else {
        val max = (2 * threshold - 1) - remaining
        val peeked = peek(nbBits)
        if (peeked < 0) return None
        var count = 0
        if ((peeked & (threshold - 1)) < max) {
          count = peeked & (threshold - 1)
          bitPos += nbBits - 1
        } else {
          var c = peeked & (2 * threshold - 1)
          if (c >= threshold) c -= max
          count = c
          bitPos += nbBits
        }
        count -= 1 // shift to [-1, remaining-1]
        remaining -= math.abs(count)
        counts += count
        prev0 = count == 0
        while (remaining > 1 && remaining < threshold) {
          nbBits -= 1; threshold >>= 1
        }
      }
    }
    if (remaining != 1) return None
    if (counts.length > maxSym + 1) return None
    val bytes = (bitPos + 7) / 8
    if (off + bytes > end) return None
    fseBuild(counts.toArray, accuracyLog).map(t => (t, bytes))
  }

  // ---- Huffman literals (§4.2) --------------------------------------------
  private final class HufTable(val maxBits: Int, val symbols: Array[Int],
                               val lengths: Array[Int])

  /** Build the decode table from explicit weights; the LAST weight is
    * implied (reference rule: tableLog = highbit(sum) + 1, the
    * remainder to 2^tableLog must itself be a power of two). */
  private def hufBuild(weights: Array[Int]): Option[HufTable] = {
    if (weights.isEmpty || weights.length > 255) return None
    var sum = 0L
    weights.foreach { w =>
      if (w < 0 || w > 11) return None
      if (w > 0) sum += 1L << (w - 1)
    }
    if (sum == 0) return None
    val maxBits = 64 - java.lang.Long.numberOfLeadingZeros(sum) // highbit+1
    if (maxBits > 11) return None
    val total = 1L << maxBits
    val rest = total - sum
    if (rest <= 0 || java.lang.Long.bitCount(rest) != 1) return None
    val lastW = java.lang.Long.numberOfTrailingZeros(rest).toInt + 1
    val all = weights :+ lastW
    val size = 1 << maxBits.toInt
    val symbols = new Array[Int](size)
    val lengths = new Array[Int](size)
    // canonical order: ascending weight (longer codes first),
    // ascending symbol within a weight
    var rank = 1
    var pos = 0
    while (rank <= maxBits) {
      var s = 0
      while (s < all.length) {
        if (all(s) == rank) {
          val nb = maxBits.toInt + 1 - rank
          val span = 1 << (maxBits.toInt - nb)
          var k = 0
          while (k < span) { symbols(pos) = s; lengths(pos) = nb; pos += 1; k += 1 }
        }
        s += 1
      }
      rank += 1
    }
    if (pos != size) return None
    Some(new HufTable(maxBits.toInt, symbols, lengths))
  }

  /** Decode exactly n literals from one backward stream; the stream
    * must be consumed exactly. */
  private def hufDecodeStream(t: HufTable, buf: Array[Byte], start: Int,
                              end: Int, out: Array[Byte], outOff: Int,
                              n: Int): Boolean = {
    val bs = new BackBits(buf, start, end)
    if (bs.bad) return false
    var i = 0
    while (i < n) {
      val idx = bs.read(t.maxBits)
      val nb = t.lengths(idx)
      bs.bitPos += t.maxBits - nb // return the unused lookahead bits
      out(outOff + i) = t.symbols(idx).toByte
      i += 1
    }
    bs.finished
  }

  /** Decode FSE-compressed Huffman weights: two interleaved states
    * over one backward stream, terminating per the reference decoder
    * (a state update that overruns the stream flushes the OTHER
    * state's symbol and stops). */
  private def fseWeights(buf: Array[Byte], start: Int, end: Int): Option[Array[Int]] = {
    val (wt, wBytes) = fseParse(buf, start, end, 255, 6).getOrElse(return None)
    val bs = new BackBits(buf, start + wBytes, end)
    if (bs.bad) return None
    var s1 = bs.read(wt.accuracyLog)
    var s2 = bs.read(wt.accuracyLog)
    if (bs.overread) return None
    val ws = new scala.collection.mutable.ArrayBuffer[Int]()
    var done = false
    while (!done) {
      if (ws.length > 255) return None
      ws += wt.symbol(s1)
      val n1 = wt.newStateBase(s1) + bs.read(wt.nbBits(s1))
      if (bs.overread) { ws += wt.symbol(s2); done = true }
      else {
        s1 = n1
        ws += wt.symbol(s2)
        val n2 = wt.newStateBase(s2) + bs.read(wt.nbBits(s2))
        if (bs.overread) { ws += wt.symbol(s1); done = true }
        else s2 = n2
      }
    }
    Some(ws.toArray)
  }

  // ---- predefined sequence distributions (§3.1.1.3.2.2) -------------------
  private val llDefault = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val mlDefault = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val ofDefault = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)
  private lazy val llDefaultT = fseBuild(llDefault, 6).get
  private lazy val mlDefaultT = fseBuild(mlDefault, 6).get
  private lazy val ofDefaultT = fseBuild(ofDefault, 5).get

  // literals-length / match-length code tables (§3.1.1.3.2.1.1)
  private val llBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val llBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val mlBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val mlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ---- XXH64 (content checksum) -------------------------------------------
  private val P1 = 0x9E3779B185EBCA87L; private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L; private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L
  private[graft] def xxh64(b: Array[Byte], seed: Long = 0L): Long = {
    @inline def rotl(x: Long, r: Int) = (x << r) | (x >>> (64 - r))
    @inline def le64(i: Int): Long = {
      var v = 0L; var k = 0
      while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    @inline def le32(i: Int): Long = {
      var v = 0L; var k = 0
      while (k < 4) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    val n = b.length
    var i = 0
    var h =
      if (n >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i + 32 <= n) {
          v1 = rotl(v1 + le64(i) * P2, 31) * P1
          v2 = rotl(v2 + le64(i + 8) * P2, 31) * P1
          v3 = rotl(v3 + le64(i + 16) * P2, 31) * P1
          v4 = rotl(v4 + le64(i + 24) * P2, 31) * P1
          i += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        def merge(a: Long, v: Long): Long = (a ^ (rotl(v * P2, 31) * P1)) * P1 + P4
        merge(merge(merge(merge(acc, v1), v2), v3), v4)
      } else seed + P5
    h += n
    while (i + 8 <= n) { h = rotl(h ^ (rotl(le64(i) * P2, 31) * P1), 27) * P1 + P4; i += 8 }
    if (i + 4 <= n) { h = rotl(h ^ (le32(i) * P1), 23) * P2 + P3; i += 4 }
    while (i < n) { h = rotl(h ^ ((b(i) & 0xffL) * P5), 11) * P1; i += 1 }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // ---- frame decode ---------------------------------------------------------
  /** Decode one complete zstd frame that must exactly tile `p`; None
    * on any malformation or out-of-profile feature (dictionaries).
    * `maxOut` bounds the decompressed allocation. */
  def decompress(p: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] =
    try {
      val (raw, next) = decodeFrame(p, 0, maxOut)
      if (next == p.length) Some(raw) else None
    } catch {
      case Bad => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** RFC 8878 §3.1.2: a `.zst` PAYLOAD is a SERIES of frames — zstd
    * frames interleaved with skippable frames (magic 0x184D2A5?, an
    * explicit 4-byte length, opaque content; pzstd and seekable-zstd
    * write them routinely) — the gzip member-series story
    * ([[Inflate.gunzipMemberList]]) one format over. Walks every
    * frame (each zstd frame fully decoded and verified, each
    * skippable frame skipped by its declared length), requires the
    * frames to exactly tile the payload, and returns one decoded
    * array per ZSTD frame (boundaries kept — the record-per-frame
    * read primitive) plus the skippable-frame count. None on any
    * malformation in any frame: a corrupt frame's length is
    * unknowable, so the walk cannot resync past one — the caller
    * accounts the whole payload (the e15/e17 idiom). `maxOut` bounds
    * TOTAL allocation across the series. */
  def frameList(p: Array[Byte],
                maxOut: Int = 1 << 26): Option[(Vector[Array[Byte]], Int)] =
    try {
      if (p.length == 0) return None
      val frames = Vector.newBuilder[Array[Byte]]
      var nSkip = 0
      var total = 0L
      var pos = 0
      while (pos < p.length) {
        if (pos + 4 > p.length) return None
        val magic = (p(pos) & 0xff) | ((p(pos + 1) & 0xff) << 8) |
          ((p(pos + 2) & 0xff) << 16) | ((p(pos + 3) & 0xff) << 24)
        if (magic == 0xfd2fb528) {
          val (raw, next) = decodeFrame(p, pos, (maxOut - total).toInt)
          frames += raw
          total += raw.length
          pos = next
        } else if ((magic & 0xfffffff0) == 0x184d2a50) { // skippable
          if (pos + 8 > p.length) return None
          val sz = (p(pos + 4) & 0xffL) | ((p(pos + 5) & 0xffL) << 8) |
            ((p(pos + 6) & 0xffL) << 16) | ((p(pos + 7) & 0xffL) << 24)
          if (pos + 8 + sz > p.length) return None
          pos += 8 + sz.toInt
          nSkip += 1
        } else return None
      }
      Some((frames.result(), nSkip))
    } catch {
      case Bad => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** [[frameList]]'s concatenation — what a `.zst` shard decodes to. */
  def decompressSeries(p: Array[Byte],
                       maxOut: Int = 1 << 26): Option[Array[Byte]] =
    frameList(p, maxOut).map { case (fs, _) =>
      var n = 0
      fs.foreach(f => n += f.length)
      val out = new Array[Byte](n)
      var o = 0
      fs.foreach { f => System.arraycopy(f, 0, out, o, f.length); o += f.length }
      out
    }

  /** Decode ONE zstd frame starting at `start`; returns the decoded
    * bytes and the offset just past the frame (checksum included).
    * Throws [[Bad]] on any malformation. */
  private def decodeFrame(p: Array[Byte], start: Int, maxOut: Int): (Array[Byte], Int) = {
    def bad(): Nothing = throw Bad
    @inline def u8(i: Int): Int = { if (i < 0 || i >= p.length) bad(); p(i) & 0xff }
    if (maxOut < 0) bad()
    if (start < 0 || start + 6 > p.length) bad()
    if (u8(start) != 0x28 || u8(start + 1) != 0xb5 ||
        u8(start + 2) != 0x2f || u8(start + 3) != 0xfd) bad()
    var pos = start + 4
    val fhd = u8(pos); pos += 1
    val fcsFlag = fhd >> 6
    val singleSeg = (fhd & 0x20) != 0
    if ((fhd & 0x08) != 0) bad() // reserved bit
    val hasChecksum = (fhd & 0x04) != 0
    if ((fhd & 0x03) != 0) bad() // dictionary id: out of profile
    var windowSize = 0L
    if (!singleSeg) {
      val wd = u8(pos); pos += 1
      val windowLog = 10 + (wd >> 3)
      if (windowLog > 31) bad()
      val base = 1L << windowLog
      windowSize = base + (base >> 3) * (wd & 7)
    }
    var fcs = -1L
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSeg) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    if (fcsBytes > 0) {
      var v = 0L
      var k = 0
      while (k < fcsBytes) { v |= u8(pos + k).toLong << (8 * k); k += 1 }
      fcs = if (fcsBytes == 2) v + 256 else v
      pos += fcsBytes
    }
    if (singleSeg) windowSize = fcs
    if (windowSize < 0 || fcs > maxOut) bad()
    val blockMax = math.max(1L, math.min(windowSize, 128L * 1024)).toInt

    // ONE growable output buffer for the whole frame: match copies
    // index it directly, so multi-block decode is O(output bytes),
    // not O(blocks × output) per-block history snapshots.
    var outBuf = new Array[Byte](
      math.max(64, if (fcs >= 0 && fcs < (1 << 26)) fcs.toInt else 4096))
    var outLen = 0
    @inline def ensure(n: Int): Unit = {
      if (n < 0) bad()
      if (n > outBuf.length)
        outBuf = java.util.Arrays.copyOf(outBuf, math.max(outBuf.length * 2, n))
    }
    // cross-block decoder state
    val reps = Array(1, 4, 8)
    var prevHuf: HufTable = null
    var prevLL: FseTable = null
    var prevOF: FseTable = null
    var prevML: FseTable = null

    var lastBlock = false
    while (!lastBlock) {
      val bh = u8(pos) | (u8(pos + 1) << 8) | (u8(pos + 2) << 16)
      pos += 3
      lastBlock = (bh & 1) == 1
      val btype = (bh >> 1) & 3
      val bsize = bh >>> 3
      btype match {
        case 0 => // raw
          if (pos + bsize > p.length || bsize > blockMax) bad()
          if (outLen + bsize > maxOut) bad()
          ensure(outLen + bsize)
          System.arraycopy(p, pos, outBuf, outLen, bsize)
          outLen += bsize
          pos += bsize
        case 1 => // RLE
          if (bsize > blockMax || outLen + bsize > maxOut) bad()
          ensure(outLen + bsize)
          java.util.Arrays.fill(outBuf, outLen, outLen + bsize, u8(pos).toByte)
          outLen += bsize
          pos += 1
        case 2 => // compressed
          if (pos + bsize > p.length) bad()
          val blockEnd = pos + bsize
          // ---- literals section --------------------------------------
          val b0 = u8(pos)
          val litType = b0 & 3
          val sizeFormat = (b0 >> 2) & 3
          var regenSize = 0
          var compSize = 0
          var streams4 = false
          litType match {
            case 0 | 1 =>
              sizeFormat match {
                case 0 | 2 => regenSize = b0 >> 3; pos += 1
                case 1 => regenSize = (b0 >> 4) | (u8(pos + 1) << 4); pos += 2
                case _ =>
                  regenSize = (b0 >> 4) | (u8(pos + 1) << 4) | (u8(pos + 2) << 12)
                  pos += 3
              }
            case _ =>
              sizeFormat match {
                case 0 | 1 =>
                  streams4 = sizeFormat == 1
                  val h = b0 | (u8(pos + 1) << 8) | (u8(pos + 2) << 16)
                  regenSize = (h >> 4) & 0x3ff
                  compSize = (h >> 14) & 0x3ff
                  pos += 3
                case 2 =>
                  streams4 = true
                  val h = b0.toLong | (u8(pos + 1).toLong << 8) |
                    (u8(pos + 2).toLong << 16) | (u8(pos + 3).toLong << 24)
                  regenSize = ((h >> 4) & 0x3fff).toInt
                  compSize = ((h >> 18) & 0x3fff).toInt
                  pos += 4
                case _ =>
                  streams4 = true
                  val h = b0.toLong | (u8(pos + 1).toLong << 8) |
                    (u8(pos + 2).toLong << 16) | (u8(pos + 3).toLong << 24) |
                    (u8(pos + 4).toLong << 32)
                  regenSize = ((h >> 4) & 0x3ffff).toInt
                  compSize = ((h >> 22) & 0x3ffff).toInt
                  pos += 5
              }
          }
          if (regenSize > blockMax) bad()
          val literals = new Array[Byte](regenSize)
          litType match {
            case 0 =>
              if (pos + regenSize > blockEnd) bad()
              System.arraycopy(p, pos, literals, 0, regenSize)
              pos += regenSize
            case 1 =>
              java.util.Arrays.fill(literals, u8(pos).toByte); pos += 1
            case t =>
              val litEnd = pos + compSize
              if (litEnd > blockEnd) bad()
              var tree = prevHuf
              if (t == 2) {
                val hByte = u8(pos)
                if (hByte < 128) { // FSE-compressed weights
                  val wEnd = pos + 1 + hByte
                  if (wEnd > litEnd) bad()
                  val ws = fseWeights(p, pos + 1, wEnd).getOrElse(bad())
                  tree = hufBuild(ws).getOrElse(bad())
                  pos = wEnd
                } else { // direct 4-bit weights, high nibble first
                  val nw = hByte - 127
                  val wBytes = (nw + 1) / 2
                  if (pos + 1 + wBytes > litEnd) bad()
                  val ws = new Array[Int](nw)
                  var i = 0
                  while (i < nw) {
                    val by = u8(pos + 1 + i / 2)
                    ws(i) = if (i % 2 == 0) by >> 4 else by & 0x0f
                    i += 1
                  }
                  tree = hufBuild(ws).getOrElse(bad())
                  pos += 1 + wBytes
                }
              }
              if (tree == null) bad() // treeless with no prior tree
              prevHuf = tree
              if (!streams4) {
                if (!hufDecodeStream(tree, p, pos, litEnd, literals, 0, regenSize))
                  bad()
              } else {
                if (pos + 6 > litEnd) bad()
                val s1 = u8(pos) | (u8(pos + 1) << 8)
                val s2 = u8(pos + 2) | (u8(pos + 3) << 8)
                val s3 = u8(pos + 4) | (u8(pos + 5) << 8)
                val dataStart = pos + 6
                val s4 = litEnd - dataStart - s1 - s2 - s3
                if (s4 <= 0) bad()
                val per = (regenSize + 3) / 4
                val last = regenSize - 3 * per
                if (last < 0) bad()
                val offs = Array(dataStart, dataStart + s1, dataStart + s1 + s2,
                  dataStart + s1 + s2 + s3)
                val lens = Array(s1, s2, s3, s4)
                val cnts = Array(per, per, per, last)
                var k = 0
                while (k < 4) {
                  if (!hufDecodeStream(tree, p, offs(k), offs(k) + lens(k),
                    literals, k * per, cnts(k))) bad()
                  k += 1
                }
              }
              pos = litEnd
          }
          // ---- sequences section -------------------------------------
          val sb0 = u8(pos)
          var nbSeq = 0
          if (sb0 == 0) { nbSeq = 0; pos += 1 }
          else if (sb0 < 128) { nbSeq = sb0; pos += 1 }
          else if (sb0 < 255) { nbSeq = ((sb0 - 128) << 8) | u8(pos + 1); pos += 2 }
          else { // byte0 == 255: nbSeq = byte1 + (byte2<<8) + 0x7f00 (ADD)
            nbSeq = (u8(pos + 1) | (u8(pos + 2) << 8)) + 0x7f00; pos += 3
          }

          val blockStart = outLen
          ensure(blockStart + blockMax) // block content is capped by blockMax
          var litPos = 0
          if (nbSeq > 0) {
            val scm = u8(pos); pos += 1
            if ((scm & 3) != 0) bad()
            def loadTable(m: Int, maxSym: Int, maxLog: Int, defT: FseTable,
                          prevT: FseTable): FseTable = m match {
              case 0 => defT
              case 1 =>
                val sSym = u8(pos); pos += 1
                if (sSym > maxSym) bad()
                // reference ZSTD_buildSeqTable(set_rle): a one-cell
                // table (accuracyLog 0) that always yields sSym with
                // 0-bit state reads — and it IS the Repeat_Mode
                // target for the next block, like any built table.
                new FseTable(0, Array(sSym), Array(0), Array(0))
              case 2 =>
                val (t, n) = fseParse(p, pos, blockEnd, maxSym, maxLog)
                  .getOrElse(bad())
                pos += n; t
              case _ => if (prevT == null) bad(); prevT
            }
            val tLL = loadTable((scm >> 6) & 3, 35, 9, llDefaultT, prevLL)
            val tOF = loadTable((scm >> 4) & 3, 31, 8, ofDefaultT, prevOF)
            val tML = loadTable((scm >> 2) & 3, 52, 9, mlDefaultT, prevML)
            prevLL = tLL; prevOF = tOF; prevML = tML
            val bs = new BackBits(p, pos, blockEnd)
            if (bs.bad) bad()
            var stLL = bs.read(tLL.accuracyLog)
            var stOF = bs.read(tOF.accuracyLog)
            var stML = bs.read(tML.accuracyLog)
            if (bs.overread) bad()
            var si = 0
            while (si < nbSeq) {
              val llCode = tLL.symbol(stLL)
              val ofCode = tOF.symbol(stOF)
              val mlCode = tML.symbol(stML)
              if (llCode > 35 || mlCode > 52 || ofCode > 31 || ofCode < 0) bad()
              // extra bits: offset, then match, then literals (§3.1.1.4)
              val ofVal = (1L << ofCode) + bs.read(ofCode)
              val ml = mlBase(mlCode) + bs.read(mlBits(mlCode))
              val ll = llBase(llCode) + bs.read(llBits(llCode))
              if (bs.overread) bad()
              // repeat-offset resolution (§3.1.1.5)
              var offset = 0
              if (ofVal > 3) {
                offset = (ofVal - 3).toInt
                reps(2) = reps(1); reps(1) = reps(0); reps(0) = offset
              } else if (ll == 0 && ofVal == 3) {
                offset = reps(0) - 1
                if (offset <= 0) bad()
                reps(2) = reps(1); reps(1) = reps(0); reps(0) = offset
              } else {
                val idx = if (ll == 0) ofVal.toInt else ofVal.toInt - 1
                offset = reps(idx)
                if (idx == 1) {
                  reps(1) = reps(0); reps(0) = offset
                } else if (idx == 2) {
                  reps(2) = reps(1); reps(1) = reps(0); reps(0) = offset
                }
              }
              // literals copy
              if (litPos + ll > literals.length ||
                  outLen - blockStart + ll > blockMax) bad()
              System.arraycopy(literals, litPos, outBuf, outLen, ll)
              litPos += ll; outLen += ll
              // match copy (forward byte-by-byte: overlap-correct),
              // source may reach into prior blocks' output — the same
              // buffer, indexed directly
              if (outLen - blockStart + ml > blockMax) bad()
              var srcIdx = outLen - offset
              if (srcIdx < 0) bad()
              var k = 0
              while (k < ml) {
                outBuf(outLen) = outBuf(srcIdx)
                outLen += 1; srcIdx += 1; k += 1
              }
              si += 1
              if (si < nbSeq) { // state updates: LL, ML, OF (§4.1.2)
                stLL = tLL.newStateBase(stLL) + bs.read(tLL.nbBits(stLL))
                stML = tML.newStateBase(stML) + bs.read(tML.nbBits(stML))
                stOF = tOF.newStateBase(stOF) + bs.read(tOF.nbBits(stOF))
                if (bs.overread) bad()
              }
            }
            if (!bs.finished) bad()
            pos = blockEnd
          } else {
            if (pos != blockEnd) bad() // literals-only block ends here
          }
          // trailing literals
          val tail = literals.length - litPos
          if (tail > 0) {
            if (outLen - blockStart + tail > blockMax) bad()
            System.arraycopy(literals, litPos, outBuf, outLen, tail)
            outLen += tail
          }
          if (outLen > maxOut) bad()
        case _ => bad() // reserved block type
      }
    }
    if (fcs >= 0 && outLen.toLong != fcs) bad()
    val result = java.util.Arrays.copyOf(outBuf, outLen)
    if (hasChecksum) {
      val want = u8(pos).toLong | (u8(pos + 1).toLong << 8) |
        (u8(pos + 2).toLong << 16) | (u8(pos + 3).toLong << 24)
      if ((xxh64(result) & 0xffffffffL) != want) bad()
      pos += 4
    }
    (result, pos)
  }

}
