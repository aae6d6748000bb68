package graft.operators

/** Hand-written bzip2 decoder — the third classic general-purpose
  * codec real text corpora arrive in after gzip (t25) and zstd (t30):
  * Wikipedia dumps, many academic corpora and long-tail archive
  * mirrors ship `.bz2`. Implements the public bzip2 stream format
  * (the de-facto spec fixed by the reference implementation and the
  * published format documentation):
  *
  *   - MSB-first bit stream; blocks are NOT byte-aligned (the magic
  *     of block k+1 starts mid-byte — a byte-aligned reader cannot
  *     walk a multi-block file at all);
  *   - stream header `BZh` + level digit (block size 100k–900k),
  *     48-bit block magic 0x314159265359 / end magic 0x177245385090;
  *   - per block: stored CRC, the deprecated `randomized` flag
  *     REJECTED (fail-closed: no modern encoder emits it), 24-bit
  *     BWT origin pointer, the two-level used-byte map, 2–6 Huffman
  *     groups with delta-coded code lengths (1–20), unary+MTF coded
  *     group selectors switching tables every 50 symbols;
  *   - the symbol stream: MTF over the used-byte list with RUNA/RUNB
  *     zero-run symbols in bijective base 2, EOB terminator;
  *   - inverse BWT via the counting/link-vector walk from origPtr,
  *     then the outer RLE (4 equal bytes + count byte);
  *   - per-block CRC-32 (bzip2's non-reflected 0x04c11db7 variant,
  *     MSB-first) verified over the fully decoded plain bytes, and
  *     the stream-combined CRC (rotate-left-xor) verified at the end
  *     marker; trailing garbage after the stream is a malformation.
  *
  * Deliberate boundary: exactly ONE stream per payload (the
  * warehouse framing here) — `cat a.bz2 b.bz2` concatenation is
  * t27's member-walk story and is rejected, counted by callers.
  *
  * Bzip2Spec cross-validates against TWO independent real
  * implementations: commons-compress (the fixture encoder — every
  * decoded byte in t40's oracle path comes from its writer) and the
  * system bzip2(1) binary, plus a malformation per layer.
  *
  * Scale: one linear pass per block (the BWT walk is O(n) with two
  * int arrays of block size), used from mapPartitions — map-only,
  * never throws.
  */
object Bzip2 {

  private val BlockMagic = 0x314159265359L
  private val EosMagic = 0x177245385090L

  private lazy val crcTab: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 24
    var k = 0
    while (k < 8) {
      c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1
      k += 1
    }
    c
  }

  private final class Bits(p: Array[Byte]) {
    var pos = 0L
    val end: Long = p.length.toLong * 8
    def bit(): Int = {
      if (pos >= end) throw Bad
      val b = (p((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1
      b
    }
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    def bitsL(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
  }

  private object Bad extends scala.util.control.ControlThrowable

  /** One group's canonical Huffman decode tables, bzip2 style:
    * codes assigned by ascending length, symbol order within. */
  private final class Huff(lens: Array[Int]) {
    val minLen: Int = lens.min
    val maxLen: Int = lens.max
    // limit(l) = largest code of length l; base/perm as in the
    // published decode algorithm
    val limit = new Array[Int](maxLen + 2)
    val base = new Array[Int](maxLen + 2)
    val perm = new Array[Int](lens.length)
    locally {
      var pp = 0
      var l = minLen
      while (l <= maxLen) {
        var s = 0
        while (s < lens.length) {
          if (lens(s) == l) { perm(pp) = s; pp += 1 }
          s += 1
        }
        l += 1
      }
      val cnt = new Array[Int](maxLen + 2)
      lens.foreach(l0 => cnt(l0 + 1) += 1)
      var i = 1
      while (i < cnt.length) { cnt(i) += cnt(i - 1); i += 1 }
      var vec = 0
      l = minLen
      while (l <= maxLen) {
        vec += cnt(l + 1) - cnt(l)
        limit(l) = vec - 1
        vec <<= 1
        l += 1
      }
      l = minLen + 1
      while (l <= maxLen) {
        base(l) = ((limit(l - 1) + 1) << 1) - cnt(l)
        l += 1
      }
      // base(minLen) pairs with code offset cnt(minLen) (== 0 codes
      // below minLen)
      base(minLen) = 0 - cnt(minLen)
    }
    def decode(br: Bits): Int = {
      var l = minLen
      var v = br.bits(minLen)
      while (l <= maxLen && v > limit(l)) {
        v = (v << 1) | br.bit()
        l += 1
      }
      if (l > maxLen) throw Bad
      // index into perm: v - base(l), base folding the cumulative
      // count (base(minLen) = 0 — no codes below minLen)
      val k = v - base(l)
      if (k < 0 || k >= perm.length) throw Bad
      perm(k)
    }
  }

  def decompress(p: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] = {
    try {
      if (p.length < 10) return None
      if (p(0) != 'B' || p(1) != 'Z' || p(2) != 'h') return None
      val level = p(3) - '0'
      if (level < 1 || level > 9) return None
      val maxBlock = level * 100000
      val br = new Bits(p)
      br.pos = 32
      val out = new java.io.ByteArrayOutputStream(math.min(p.length * 4, 1 << 20))
      var combined = 0
      var done = false
      while (!done) {
        val magic = br.bitsL(48)
        if (magic == EosMagic) {
          val storedCombined = br.bits(32)
          if (storedCombined != combined) return None
          // remaining bits to byte boundary must be padding; nothing
          // may follow the stream
          if ((br.end - br.pos) >= 8) return None
          done = true
        } else if (magic == BlockMagic) {
          val storedCrc = br.bits(32)
          if (br.bit() != 0) return None // randomized: rejected
          val origPtr = br.bits(24)
          // used-byte map
          val used16 = br.bits(16)
          val inUse = new Array[Boolean](256)
          var i = 0
          while (i < 16) {
            if ((used16 & (0x8000 >> i)) != 0) {
              val m = br.bits(16)
              var j = 0
              while (j < 16) {
                if ((m & (0x8000 >> j)) != 0) inUse(i * 16 + j) = true
                j += 1
              }
            }
            i += 1
          }
          val seqToUnseq = (0 until 256).filter(inUse).toArray
          val nInUse = seqToUnseq.length
          if (nInUse == 0) return None
          val alphaSize = nInUse + 2
          val nGroups = br.bits(3)
          if (nGroups < 2 || nGroups > 6) return None
          val nSelectors = br.bits(15)
          if (nSelectors < 1) return None
          // selectors: unary, then MTF over group ids
          val selMtf = new Array[Int](nSelectors)
          i = 0
          while (i < nSelectors) {
            var j = 0
            while (br.bit() == 1) {
              j += 1
              if (j >= nGroups) return None
            }
            selMtf(i) = j
            i += 1
          }
          val gOrder = Array.tabulate(nGroups)(identity)
          val selectors = new Array[Int](nSelectors)
          i = 0
          while (i < nSelectors) {
            val v = selMtf(i)
            val g = gOrder(v)
            var k = v
            while (k > 0) { gOrder(k) = gOrder(k - 1); k -= 1 }
            gOrder(0) = g
            selectors(i) = g
            i += 1
          }
          // code lengths per group
          val huffs = new Array[Huff](nGroups)
          var g = 0
          while (g < nGroups) {
            val lens = new Array[Int](alphaSize)
            var curr = br.bits(5)
            var s = 0
            while (s < alphaSize) {
              var cont = true
              while (cont) {
                if (curr < 1 || curr > 20) return None
                if (br.bit() == 0) cont = false
                else { if (br.bit() == 0) curr += 1 else curr -= 1 }
              }
              lens(s) = curr
              s += 1
            }
            huffs(g) = new Huff(lens)
            g += 1
          }
          // MTF + RLE2 decode into the BWT buffer
          val bwt = new Array[Byte](maxBlock)
          var nBwt = 0
          val mtf = seqToUnseq.clone()
          var groupNo = -1
          var groupPos = 0
          var huff: Huff = null
          def nextSym(): Int = {
            if (groupPos == 0) {
              groupNo += 1
              if (groupNo >= nSelectors) throw Bad
              groupPos = 50
              huff = huffs(selectors(groupNo))
            }
            groupPos -= 1
            huff.decode(br)
          }
          val eob = alphaSize - 1
          var sym = nextSym()
          var run = 0L
          var runBit = 0
          while (sym != eob) {
            if (sym == 0 || sym == 1) {
              run += (if (sym == 0) 1L else 2L) << runBit
              runBit += 1
              if (run > maxBlock) return None
            } else {
              if (run > 0) {
                if (nBwt + run > maxBlock) return None
                java.util.Arrays.fill(bwt, nBwt, nBwt + run.toInt, mtf(0).toByte)
                nBwt += run.toInt
                run = 0; runBit = 0
              }
              val pos0 = sym - 1
              if (pos0 >= mtf.length) return None
              val v = mtf(pos0.toInt)
              var k = pos0.toInt
              while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
              mtf(0) = v
              if (nBwt >= maxBlock) return None
              bwt(nBwt) = v.toByte
              nBwt += 1
            }
            sym = nextSym()
          }
          if (run > 0) {
            if (nBwt + run > maxBlock) return None
            java.util.Arrays.fill(bwt, nBwt, nBwt + run.toInt, mtf(0).toByte)
            nBwt += run.toInt
          }
          if (origPtr >= nBwt) return None
          // inverse BWT: counting + link vector
          val cftab = new Array[Int](257)
          i = 0
          while (i < nBwt) { cftab((bwt(i) & 0xff) + 1) += 1; i += 1 }
          i = 1
          while (i < 257) { cftab(i) += cftab(i - 1); i += 1 }
          val tt = new Array[Int](nBwt)
          i = 0
          while (i < nBwt) {
            val b = bwt(i) & 0xff
            tt(cftab(b)) = i
            cftab(b) += 1
            i += 1
          }
          // walk + outer RLE decode + CRC in one pass
          var crc = 0xffffffff
          var tPos = tt(origPtr)
          var emitted = 0
          var last = -1
          var runLen = 0
          var outThis = 0
          def emit(b: Int): Boolean = {
            crc = (crc << 8) ^ crcTab(((crc >>> 24) ^ b) & 0xff)
            out.write(b)
            outThis += 1
            out.size() <= maxOut
          }
          var ok = true
          while (emitted < nBwt && ok) {
            val b = bwt(tPos) & 0xff
            tPos = tt(tPos)
            emitted += 1
            if (runLen == 4) {
              // b is the repeat count byte for the preceding run
              var r = 0
              while (r < b && ok) { ok = emit(last); r += 1 }
              runLen = 0
              last = -1
            } else {
              if (b == last) runLen += 1
              else { runLen = 1; last = b }
              ok = emit(b)
            }
          }
          if (!ok) return None
          if (runLen == 4) return None // dangling run without its count byte
          val blockCrc = ~crc
          if (blockCrc != storedCrc) return None
          combined = ((combined << 1) | (combined >>> 31)) ^ blockCrc
        } else return None
      }
      Some(out.toByteArray)
    } catch {
      case Bad => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}
