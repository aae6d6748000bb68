package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Brotli

/** Hand-written RFC 7932 decoder — full spec as of round 16 (static
  * dictionary, all context modes). The certificate: (a) 87
  * CROSS-VALIDATION fixtures produced by the REAL brotli encoder
  * (library v1.2.0; qualities 0–11, text/generic/font modes, window
  * 10–24, inputs from ASCII prose to UTF-8 multilingual to binary —
  * src/test/resources/brotli) must decode byte-exactly: real
  * quality-11 text streams carry dictionary references, transforms,
  * and UTF8/Signed context modeling, so one wrong table entry in
  * [[graft.operators.BrotliTables]] breaks them; (b) exact
  * round-trips against our conforming fixture encoder across stream
  * shapes and variants (UTF8 two-tree context coding, dictionary
  * references, metadata / last-metadata / uncompressed meta-blocks);
  * (c) the reference encoder's KNOWN empty-stream byte (0x3B) and the
  * WBITS=16 form 0x06; (d) hand-assembled streams from the RFC's bit
  * layout exercising block switching, context maps, NPOSTFIX/NDIRECT,
  * the distance ring ±1 forms, implicit distance-zero commands and
  * dictionary-word selection; (e) a malformation per structural
  * layer, None never throw. */
class BrotliSpec extends AnyFunSuite {

  private val textLike: Array[Byte] = {
    val sb = new StringBuilder
    val words = Seq("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "pack", "my", "box", "with", "five", "dozen")
    val rnd = new scala.util.Random(0x7932)
    (0 until 8000).foreach { _ =>
      sb.append(words(rnd.nextInt(words.length))).append(' ')
      if (rnd.nextInt(12) == 0) sb.append('\n')
    }
    sb.toString.getBytes("UTF-8")
  }

  private def shapes: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(0xB807)
    Seq(
      ("empty", Array.emptyByteArray),
      ("one", Array[Byte](42)),
      ("tiny", "hello brotli".getBytes("UTF-8")),
      ("run", Array.fill[Byte](9000)(7)),
      ("random", Array.fill[Byte](6000)(rnd.nextInt(256).toByte)),
      ("byte-cycle", Array.tabulate[Byte](60000)(i => (i % 251).toByte)),
      ("text", textLike),
      ("text-x3", textLike ++ textLike ++ textLike), // > one meta-block
      ("seg-edge", Array.tabulate[Byte](50000)(i => (i % 7).toByte)),
      ("seg-edge+1", Array.tabulate[Byte](50001)(i => (i % 7).toByte)))
  }

  test("round-trips across shapes and stream variants (metadata, uncompressed, UTF8-context, dictionary, last-metadata)") {
    for ((name, raw) <- shapes; v <- 0L until 12L) {
      val z = Brotli.compress(raw, v)
      val got = Brotli.decompress(z)
        .getOrElse(fail(s"decode None: $name variant $v (${z.length} bytes)"))
      assert(java.util.Arrays.equals(got, raw), s"drift: $name variant $v")
    }
  }

  test("real-encoder streams decode byte-exactly (the cross-validation corpus)") {
    val dir = new java.io.File("src/test/resources/brotli")
    val cases = dir.listFiles().filter(_.getName.endsWith(".br")).sortBy(_.getName)
    assert(cases.length >= 80, "fixture corpus missing")
    for (br <- cases) {
      val z = java.nio.file.Files.readAllBytes(br.toPath)
      val in = java.nio.file.Files.readAllBytes(new java.io.File(dir,
        br.getName.stripSuffix(".br") + ".in").toPath)
      val got = Brotli.decompress(z, maxOut = in.length max 16)
        .getOrElse(fail(s"decode None: ${br.getName} (${z.length} bytes)"))
      assert(java.util.Arrays.equals(got, in), s"drift: ${br.getName}")
    }
    // the dictionary-word probe (157 bytes of pure dictionary words,
    // cased and plain) compresses to 80 bytes at quality 11 — only
    // dictionary references with ferment transforms get there, so its
    // exact decode above certifies §8 against the real encoder
    assert(cases.exists(_.getName == "dictheavy_q11.br"))
  }

  test("the reference encoder's known empty-stream bytes decode (0x3B; WBITS16 form 0x06)") {
    // `brotli < /dev/null` emits the single byte 0x3B (WBITS=22,
    // ISLAST, ISLASTEMPTY) — our encoder produces it bit-for-bit
    assert(java.util.Arrays.equals(Brotli.compress(Array.emptyByteArray), Array(0x3b.toByte)))
    assert(Brotli.decompress(Array(0x3b.toByte)).exists(_.isEmpty))
    assert(Brotli.decompress(Array(0x06.toByte)).exists(_.isEmpty))
    // 0x3B plus any trailing byte is no longer a valid stream
    assert(Brotli.decompress(Array(0x3b.toByte, 0x00.toByte)).isEmpty)
  }

  /** Tiny LSB-first writer for hand-assembled streams. */
  private final class W {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
        i += 1
      }
    }
    def putCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((code >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      if (n > 0) { buf += cur.toByte; cur = 0; n = 0 }
      buf.toArray
    }
  }

  test("crafted stream: block switching, block counts, context map with RLE, two literal trees") {
    val w = new W
    w.put(0, 1) // WBITS = 16
    w.put(1, 1) // ISLAST
    w.put(0, 1) // ISLASTEMPTY = 0
    w.put(0, 2) // MNIBBLES = 4
    w.put(15, 16) // MLEN = 16
    // NBLTYPESL = 2, with its block-type and block-count codes
    w.put(1, 1); w.put(0, 3)
    w.put(1, 2); w.put(0, 2); w.put(1, 2) // type code: simple, 1 sym: 1 (=next)
    w.put(1, 2); w.put(0, 2); w.put(0, 5) // count code: simple, 1 sym: 0 (1..4)
    w.put(3, 2) // first literal block count = 4
    w.put(0, 1) // NBLTYPESI = 1
    w.put(0, 1) // NBLTYPESD = 1
    w.put(0, 2) // NPOSTFIX = 0
    w.put(0, 4) // NDIRECT = 0
    w.put(0, 2); w.put(0, 2) // context modes: LSB6, LSB6
    w.put(1, 1); w.put(0, 3) // NTREESL = 2
    // literal context map (128 entries): 64 zeros (RLE run), 64 ones
    w.put(1, 1) // RLE used
    w.put(5, 4) // RLEMAX = 6
    w.put(1, 2); w.put(1, 2); w.put(6, 3); w.put(7, 3) // cmap code {6,7}
    w.putCode(0, 1); w.put(0, 6) // sym 6: zero-run of 64
    (0 until 64).foreach(_ => w.putCode(1, 1)) // sym 7 -> tree 1
    w.put(0, 1) // IMTF = 0
    w.put(0, 1) // NTREESD = 1
    w.put(1, 2); w.put(0, 2); w.put(65, 8) // literal tree 0: only 'A'
    w.put(1, 2); w.put(0, 2); w.put(66, 8) // literal tree 1: only 'B'
    w.put(1, 2); w.put(0, 2); w.put(264, 10) // command code: insert16+copy
    w.put(1, 2); w.put(0, 2); w.put(0, 6) // distance code (unused)
    // one command: 0-bit symbol, insert extra (16 = 14+2), copy ignored
    w.put(2, 2)
    // 16 literals, all 0-bit; block switches before literals 5, 9, 13
    // read the 2 count-extra bits each
    w.put(3, 2); w.put(3, 2); w.put(3, 2)
    val got = Brotli.decompress(w.bytes).getOrElse(fail("crafted A None"))
    assert(new String(got, "UTF-8") == "AAAABBBBAAAABBBB")
  }

  test("crafted stream: context map with inverse move-to-front") {
    // same output as the block-switching stream, but the context map
    // [0 x64, 1 x64] is transmitted MTF-transformed: [0 x64, 1, 0 x63]
    // with the IMTF bit set
    val w = new W
    w.put(0, 1) // WBITS = 16
    w.put(1, 1); w.put(0, 1) // ISLAST, not empty
    w.put(0, 2); w.put(15, 16) // MLEN = 16
    w.put(1, 1); w.put(0, 3) // NBLTYPESL = 2
    w.put(1, 2); w.put(0, 2); w.put(1, 2) // type code: always "next"
    w.put(1, 2); w.put(0, 2); w.put(0, 5) // count code: 1..4
    w.put(3, 2) // first literal block count = 4
    w.put(0, 1); w.put(0, 1) // NBLTYPESI/D = 1
    w.put(0, 2); w.put(0, 4) // NPOSTFIX, NDIRECT
    w.put(0, 2); w.put(0, 2) // context modes
    w.put(1, 1); w.put(0, 3) // NTREESL = 2
    w.put(1, 1) // RLE used
    w.put(5, 4) // RLEMAX = 6
    // cmap prefix code: simple 3-symbol {6 (len1), 5, 7 (len2)}
    w.put(1, 2); w.put(2, 2); w.put(6, 3); w.put(5, 3); w.put(7, 3)
    w.putCode(0, 1); w.put(0, 6) // sym 6: zero-run of 64
    w.putCode(3, 2) // sym 7: literal value 1 (moves to front)
    w.putCode(2, 2); w.put(31, 5) // sym 5: zero-run of 63
    w.put(1, 1) // IMTF = 1
    w.put(0, 1) // NTREESD = 1
    w.put(1, 2); w.put(0, 2); w.put(65, 8) // literal tree 0: 'A'
    w.put(1, 2); w.put(0, 2); w.put(66, 8) // literal tree 1: 'B'
    w.put(1, 2); w.put(0, 2); w.put(264, 10) // command: insert16
    w.put(1, 2); w.put(0, 2); w.put(0, 6) // distance code (unused)
    w.put(2, 2) // insert extra: 14 + 2 = 16
    w.put(3, 2); w.put(3, 2); w.put(3, 2) // 3 block-switch counts
    val got = Brotli.decompress(w.bytes).getOrElse(fail("IMTF stream None"))
    assert(new String(got, "UTF-8") == "AAAABBBBAAAABBBB")
  }

  test("crafted stream: complex prefix code with HSKIP = 2") {
    val w = new W
    w.put(0, 1) // WBITS = 16
    w.put(1, 1); w.put(0, 1) // ISLAST, not empty
    w.put(0, 2); w.put(1, 16) // MLEN = 2
    w.put(0, 1); w.put(0, 1); w.put(0, 1) // NBLTYPES all 1
    w.put(0, 2); w.put(0, 4) // NPOSTFIX, NDIRECT
    w.put(0, 2); w.put(0, 1); w.put(0, 1) // mode, NTREESL, NTREESD
    // literal code: flat-8 via the COMPLEX form with HSKIP = 2 — the
    // first two code-length slots (symbols 1, 2) are skipped
    w.put(2, 2) // kind = HSKIP = 2
    // order from i=2: 3,4,0,5,17,6 are zeros, then 16 -> 1, 7 -> 0, 8 -> 1
    (0 until 6).foreach(_ => w.put(0, 2))
    w.put(7, 4); w.put(0, 2); w.put(7, 4)
    // tokens: literal 8 once, then a 16-chain covering 255 repeats
    w.putCode(0, 1)
    w.putCode(1, 1); w.put(2, 2)
    w.putCode(1, 1); w.put(2, 2)
    w.putCode(1, 1); w.put(2, 2)
    w.putCode(1, 1); w.put(0, 2)
    w.put(1, 2); w.put(0, 2); w.put(144, 10) // command: insert 2 + copy
    w.put(1, 2); w.put(0, 2); w.put(0, 6) // distance code (unused)
    w.putCode(104, 8); w.putCode(105, 8) // "hi" through the flat-8 code
    val got = Brotli.decompress(w.bytes).getOrElse(fail("HSKIP stream None"))
    assert(new String(got, "UTF-8") == "hi")
  }

  test("crafted stream: NPOSTFIX/NDIRECT distances, ring +1 form, implicit distance zero") {
    val w = new W
    w.put(0, 1) // WBITS = 16
    w.put(1, 1) // ISLAST
    w.put(0, 1) // ISLASTEMPTY = 0
    w.put(0, 2) // MNIBBLES = 4
    w.put(20, 16) // MLEN = 21
    w.put(0, 1); w.put(0, 1); w.put(0, 1) // NBLTYPES all 1
    w.put(1, 2) // NPOSTFIX = 1
    w.put(2, 4) // NDIRECT = 2 << 1 = 4
    w.put(0, 2) // context mode
    w.put(0, 1) // NTREESL = 1
    w.put(0, 1) // NTREESD = 1
    // literal code: simple 4-symbol tree-select 0: a b c d, 2 bits each
    w.put(1, 2); w.put(3, 2)
    w.put(97, 8); w.put(98, 8); w.put(99, 8); w.put(100, 8)
    w.put(0, 1) // tree-select: (2,2,2,2)
    // command code: simple 4-symbol tree-select 1: lengths (1,2,3,3)
    // s1=130 (insert0+copy4), s2=131 (insert0+copy5), s3=2 (implicit
    // insert0+copy4), s4=162 (insert4+copy4)
    w.put(1, 2); w.put(3, 2)
    w.put(130, 10); w.put(131, 10); w.put(2, 10); w.put(162, 10)
    w.put(1, 1) // tree-select: (1,2,3,3)
    // distance code: simple 3-symbol: s1=19 (direct, distance 4),
    // then 5 (ring0+1), 21 (postfix form)
    w.put(1, 2); w.put(2, 2)
    w.put(19, 7); w.put(5, 7); w.put(21, 7) // alphabet 16+4+96=116 -> 7 bits
    // canonical codes: 130->0(1b), 131->10, 2->110, 162->111;
    //                  19->0(1b), 5->10, 21->11
    // cmd1: 162 = insert "abcd", copy 4 @ direct distance 4 (dcode 19)
    w.putCode(7, 3)
    w.putCode(0, 2); w.putCode(1, 2); w.putCode(2, 2); w.putCode(3, 2)
    w.putCode(0, 1)
    // cmd2: 130 = copy 4 @ postfix distance: dcode 21, 1 extra bit = 1
    // -> n=1 h=0 offset=0: ((0+1)<<1) + 1 + 4 + 1 = 8
    w.putCode(0, 1)
    w.putCode(3, 2); w.put(1, 1)
    // cmd3: 131 = copy 5 @ ring0+1 (dcode 5): 8+1 = 9
    w.putCode(2, 2)
    w.putCode(2, 2)
    // cmd4: 2 = implicit distance zero: copy 4 @ ring0 = 9
    w.putCode(6, 3)
    val got = Brotli.decompress(w.bytes).getOrElse(fail("crafted B None"))
    assert(new String(got, "UTF-8") == "abcdabcdabcddabcdabcd")
  }

  test("static-dictionary reference via the initial ring selects the §8 word") {
    // insert 3 literals then an implicit-distance copy of length 4:
    // the initial LAST distance is 4 > max distance 3, i.e. a
    // dictionary reference with word_id = 4 - 3 - 1 = 0 → length-4
    // word index 0 ("time"), transform 0 (Identity); no ring push
    val w = new W
    w.put(0, 1); w.put(1, 1); w.put(0, 1)
    w.put(0, 2); w.put(6, 16) // MLEN = 7
    w.put(0, 1); w.put(0, 1); w.put(0, 1)
    w.put(0, 2); w.put(0, 4)
    w.put(0, 2); w.put(0, 1); w.put(0, 1)
    w.put(1, 2); w.put(3, 2) // literal code: a b c d
    w.put(97, 8); w.put(98, 8); w.put(99, 8); w.put(100, 8); w.put(0, 1)
    w.put(1, 2); w.put(0, 2); w.put(26, 10) // command: implicit ins3+copy4
    w.put(1, 2); w.put(0, 2); w.put(0, 6) // distance code (unused)
    w.putCode(0, 2); w.putCode(1, 2); w.putCode(2, 2)
    val got = Brotli.decompress(w.bytes).getOrElse(fail("dictionary stream None"))
    assert(new String(got, "UTF-8") == "abctime")
  }

  test("the initial LAST distance is 4 (the spec lists the ring fourth-last to last)") {
    // insert 4 literals then an implicit-distance copy of length 4:
    // the last distance starts at 4, so the copy repeats the 4
    // literals — a reversed ring would read 16 and go to the
    // dictionary instead (pinned by the real-encoder fixtures too)
    val w = new W
    w.put(0, 1); w.put(1, 1); w.put(0, 1)
    w.put(0, 2); w.put(7, 16) // MLEN = 8
    w.put(0, 1); w.put(0, 1); w.put(0, 1)
    w.put(0, 2); w.put(0, 4)
    w.put(0, 2); w.put(0, 1); w.put(0, 1)
    w.put(1, 2); w.put(3, 2) // literal code: a b c d
    w.put(97, 8); w.put(98, 8); w.put(99, 8); w.put(100, 8); w.put(0, 1)
    w.put(1, 2); w.put(0, 2); w.put(34, 10) // command: implicit ins4+copy4
    w.put(1, 2); w.put(0, 2); w.put(0, 6) // distance code (unused)
    w.putCode(0, 2); w.putCode(1, 2); w.putCode(2, 2); w.putCode(3, 2)
    val got = Brotli.decompress(w.bytes).getOrElse(fail("initial-ring stream None"))
    assert(new String(got, "UTF-8") == "abcdabcd")
  }

  test("dictionary references with an invalid transform id are rejected") {
    // same stream but MLEN large enough to require a copy with an
    // explicit distance far past the word space: transform_id >= 121
    val w = new W
    w.put(0, 1); w.put(1, 1); w.put(0, 1)
    w.put(0, 2); w.put(7, 16) // MLEN = 8
    w.put(0, 1); w.put(0, 1); w.put(0, 1)
    w.put(0, 2); w.put(0, 4)
    w.put(0, 2); w.put(0, 1); w.put(0, 1)
    w.put(1, 2); w.put(3, 2) // literal code: a b c d
    w.put(97, 8); w.put(98, 8); w.put(99, 8); w.put(100, 8); w.put(0, 1)
    w.put(1, 2); w.put(0, 2); w.put(162, 10) // command: ins4+copy4, explicit
    w.put(1, 2); w.put(0, 2); w.put(63, 6) // distance code: largest explicit
    w.putCode(0, 2); w.putCode(1, 2); w.putCode(2, 2); w.putCode(3, 2)
    // dcode 63: n=24, h=1 → distance = (3<<24) - 4 + extra + 1: far past
    // 121 << 10 word ids for length 4
    w.put(0, 24)
    assert(Brotli.decompress(w.bytes).isEmpty)
  }

  test("input size cap is a deliberate guard, not an overflow artifact") {
    // 2^28 input bytes would overflow the Int bit cursor — rejected up
    // front (maxOut bounds output, not input)
    assert(Brotli.decompress(new Array[Byte](1 << 28)).isEmpty)
  }

  test("structural corruptions return None, never throw") {
    val z = Brotli.compress(textLike, 0)
    assert(Brotli.decompress(z).isDefined)
    // truncation at every layer
    for (cut <- Seq(0, 1, 2, 10, z.length / 2, z.length - 1))
      assert(Brotli.decompress(z.take(cut)).isEmpty, s"truncation at $cut")
    // trailing garbage
    assert(Brotli.decompress(z :+ 0x55.toByte).isEmpty)
    // large-window extension bit: "1 000 001" -> rejected
    val lw = new W
    lw.put(1, 1); lw.put(0, 3); lw.put(1, 3); lw.put(1, 1); lw.put(1, 1)
    assert(Brotli.decompress(lw.bytes).isEmpty)
    // metadata meta-block with the reserved bit set
    val md = new W
    md.put(1, 1); md.put(5, 3) // WBITS 22
    md.put(0, 1); md.put(3, 2); md.put(1, 1) // reserved bit = 1
    assert(Brotli.decompress(md.bytes).isEmpty)
    // simple code with duplicate symbols
    val dup = new W
    dup.put(0, 1); dup.put(1, 1); dup.put(0, 1)
    dup.put(0, 2); dup.put(0, 16) // MLEN 1
    dup.put(0, 1); dup.put(0, 1); dup.put(0, 1)
    dup.put(0, 2); dup.put(0, 4); dup.put(0, 2); dup.put(0, 1); dup.put(0, 1)
    dup.put(1, 2); dup.put(1, 2) // literal code: simple, 2 syms
    dup.put(65, 8); dup.put(65, 8) // duplicate
    assert(Brotli.decompress(dup.bytes).isEmpty)
    // mid-payload corruption sweep: every flip is caught or yields a
    // different VALID stream (no integrity layer in-format), never throws
    var caught = 0
    for (i <- 1 until math.min(z.length, 400) by 3) {
      val c = z.clone(); c(i) = (c(i) ^ 0x55).toByte
      Brotli.decompress(c) match {
        case None => caught += 1
        case Some(out) => assert(out.length <= (1 << 26))
      }
    }
    assert(caught > 0)
    // junk and empty
    assert(Brotli.decompress(Array.emptyByteArray).isEmpty)
    assert(Brotli.decompress(Array.fill[Byte](16)(0x7f)).isEmpty)
  }

  test("maxOut bounds allocation") {
    val z = Brotli.compress(Array.fill[Byte](100000)(9), 0)
    assert(Brotli.decompress(z, maxOut = 1024).isEmpty)
    assert(Brotli.decompress(z, maxOut = 100000).isDefined)
  }
}
