package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("parseMediaHeader reads real PNG IHDR and JPEG SOF headers, byte-exact") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // a genuine 2×1 RGBA PNG header (signature + IHDR as libpng writes it)
    val png = hx("89504E470D0A1A0A 0000000D 49484452 00000002 00000001 08 06 00 00 00")
    assert(Multimodal.parseMediaHeader(png) == Some(("png", 2, 1, 8, 4)))
    // greyscale 16-bit, huge dims (BE u32 read, not i16)
    val png2 = hx("89504E470D0A1A0A 0000000D 49484452 00010000 00020000 10 00 00 00 00")
    assert(Multimodal.parseMediaHeader(png2) == Some(("png", 65536, 131072, 16, 1)))
    // baseline JFIF: SOI, APP0, then SOF0 640×480×3 — the common camera shape
    val jpeg = hx("FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 00 00" +
      " FFC0 0011 08 01E0 0280 03 011100 021100 031100")
    assert(Multimodal.parseMediaHeader(jpeg) == Some(("jpeg", 640, 480, 8, 3)))
    // progressive (SOF2) behind APP1+COM segments and a fill byte:
    // the scan must skip by segment length, not fixed offsets
    val jpeg2 = hx("FFD8 FFE1 0006 45786966 FFFE 0005 414243 FF FFC2 000B 08 0002 0003 01 011100")
    assert(Multimodal.parseMediaHeader(jpeg2) == Some(("jpeg", 3, 2, 8, 1)))
    // negative space: wrong magic, truncated PNG, JPEG with SOS before
    // SOF, JPEG that runs out of bytes mid-scan
    assert(Multimodal.parseMediaHeader("not media".getBytes).isEmpty)
    assert(Multimodal.parseMediaHeader(png.take(20)).isEmpty)
    assert(Multimodal.parseMediaHeader(hx("FFD8 FFDA 0002")).isEmpty)
    assert(Multimodal.parseMediaHeader(hx("FFD8 FFE0 7FFF 00")).isEmpty)
    // a PNG whose first chunk is not IHDR is malformed for a header read
    assert(Multimodal.parseMediaHeader(
      hx("89504E470D0A1A0A 0000000D 69484452 00000002 00000001 08 06 00 00 00")).isEmpty)
  }

  test("parseWavHeader walks RIFF chunks: fmt fields, odd-size pad, unknown chunks") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // canonical mono 8 kHz 8-bit PCM, 4 data bytes
    val mono = hx("52494646 28000000 57415645" +
      " 666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800" +
      " 64617461 04000000 41424344")
    assert(Multimodal.parseWavHeader(mono) == Some((1, 8000, 8, 8000, 4L)))
    // stereo 44.1 kHz 16-bit behind an ODD-size LIST chunk: the walk
    // must advance 8 + size + pad; a fixed-offset read desyncs here
    val stereo = hx("52494646 00000000 57415645" +
      " 4C495354 03000000 414243 00" +
      " 666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
      " 64617461 02000000 ABAB")
    assert(Multimodal.parseWavHeader(stereo) == Some((2, 44100, 16, 176400, 2L)))
    // unknown chunk BETWEEN fmt and data is skipped, not fatal
    val gap = hx("52494646 00000000 57415645" +
      " 666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800" +
      " 69645820 02000000 FFFF" +
      " 64617461 01000000 41")
    assert(Multimodal.parseWavHeader(gap) == Some((1, 8000, 8, 8000, 1L)))
    // negative space: wrong magic, truncation, no data chunk, short fmt
    assert(Multimodal.parseWavHeader(
      hx("52494658 28000000 57415645")).isEmpty) // RIFX
    assert(Multimodal.parseWavHeader(mono.take(10)).isEmpty)
    assert(Multimodal.parseWavHeader(hx("52494646 18000000 57415645" +
      " 666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800")).isEmpty)
    assert(Multimodal.parseWavHeader(hx("52494646 18000000 57415645" +
      " 666D7420 0C000000 0100 0100 401F0000 401F0000" +
      " 64617461 00000000")).isEmpty) // fmt size 12 < 16
  }

  test("decodePcmWindows decodes HANDCRAFTED PCM byte-for-byte (not via encodeWavPcm)") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // stereo 16-bit behind an ODD-size LIST chunk (pad byte included):
    // frames (ch0, ch1) = (1,5) (−2,−6) (300,700) (−400,−32768),
    // little-endian two's complement, interleaved
    val stereo = hx("52494646 00000000 57415645" +
      " 4C495354 03000000 414243 00" +
      " 666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
      " 64617461 10000000" +
      " 0100 0500 FEFF FAFF 2C01 BC02 70FE 0080")
    val rows = Multimodal.decodePcmWindows(stereo, docId = 7L, framesPerWin = 2)
      .map(r => (r.channel, r.win) -> ((r.n_frames, r.energy, r.peak))).toMap
    assert(rows.size == 4)
    assert(rows((0, 0)) == ((2L, 5L, 2L)))          // 1² + (−2)²
    assert(rows((0, 1)) == ((2L, 250000L, 400L)))   // 300² + 400²
    assert(rows((1, 0)) == ((2L, 61L, 6L)))         // 5² + 6²
    assert(rows((1, 1)) == ((2L, 490000L + 1073741824L, 32768L))) // 700² + 32768²
    // mono 8-bit UNSIGNED: codes 00/80/FF → amplitudes −128/0/+127
    val mono = hx("52494646 00000000 57415645" +
      " 666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800" +
      " 64617461 03000000 0080FF")
    val m = Multimodal.decodePcmWindows(mono, docId = 1L, framesPerWin = 4)
    assert(m.length == 1 && m(0).n_frames == 3L)
    assert(m(0).energy == 128L * 128 + 0 + 127L * 127 && m(0).peak == 128L)
    // negative space: non-PCM format code, truncated data region
    val alaw = hx("52494646 00000000 57415645" +
      " 666D7420 10000000 0600 0100 401F0000 401F0000 0100 0800" +
      " 64617461 01000000 41")
    assert(Multimodal.decodePcmWindows(alaw, 1L, 4).isEmpty)
    val short = hx("52494646 00000000 57415645" +
      " 666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800" +
      " 64617461 10000000 4142")
    assert(Multimodal.decodePcmWindows(short, 1L, 4).isEmpty)
    // generator → decoder roundtrip at both widths matches the formula
    val s16 = Array.tabulate(8)(i => (i * 13007) % 65536)
    val g = Multimodal.decodePcmWindows(
      Multimodal.encodeWavPcm(2, 8000, 16, 5, s16), 2L, framesPerWin = 2)
    val amp = s16.map(u => if (u >= 32768) u - 65536 else u)
    assert(g.find(r => r.channel == 1 && r.win == 1).get.energy ==
      amp(5).toLong * amp(5) + amp(7).toLong * amp(7))
  }

  test("parseMp4Header walks ISO-BMFF boxes: containers, versions, largesize") {
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val matrix = "000100000000000000000000" +
      "000000000001000000000000" + "000000000000000040000000"
    val ftyp = "00000010 66747970 69736F6D 00000200"
    def mvhd0(ts: String, du: String) =
      s"0000006C 6D766864 00000000 00000000 00000000 $ts $du " +
        "00010000 0100" + "00" * 10 + matrix + "00" * 24 + "00000002"
    // minimal v0 file: ftyp + moov(mvhd) + mdat — no trak → dims 0
    val minimal = hx(ftyp +
      " 00000074 6D6F6F76 " + mvhd0("00000258", "000003E8") +
      " 0000000C 6D646174 AABBCCDD")
    assert(Multimodal.parseMp4Header(minimal) == Some((600, 1000L, 0, 0, 140, 4L)))
    // full shape: variable-length free box INSIDE moov before mvhd
    // (fixed offsets desync), trak/tkhd with 16.16 dims, and an mdat
    // whose declared size exceeds the probe's bytes (trusted)
    val tkhd = "0000005C 746B6864 00000007 00000000 00000000 00000001 " +
      "00000000 00057E40" + "00" * 8 + "0000000000000000" + matrix +
      "02800000 01E00000"
    val full = hx(ftyp +
      " 000000E3 6D6F6F76" +
      " 0000000B 66726565 414141 " + mvhd0("00015F90", "00057E40") +
      " 00000064 7472616B " + tkhd +
      " 00000010 6D646174 AB")
    assert(Multimodal.parseMp4Header(full) ==
      Some((90000, 360000L, 640, 480, 251, 8L)))
    // v1 mvhd (u64 times) and a largesize (size==1 → u64) mdat
    val mvhd1 = "00000078 6D766864 01000000" + "00" * 16 +
      "00000001" + "0000000000015F90" +
      "00010000 0100" + "00" * 10 + matrix + "00" * 24 + "00000002"
    val v1 = hx(ftyp +
      " 00000080 6D6F6F76 " + mvhd1 +
      " 00000001 6D646174 0000000000000018 4142")
    assert(Multimodal.parseMp4Header(v1) == Some((1, 90000L, 0, 0, 160, 8L)))
    // negative space: first box not ftyp, truncated mvhd, unknown
    // mvhd version, missing mdat, malformed (size < 8) box
    assert(Multimodal.parseMp4Header(
      hx("00000074 6D6F6F76 " + mvhd0("00000258", "000003E8"))).isEmpty)
    assert(Multimodal.parseMp4Header(minimal.take(40)).isEmpty)
    assert(Multimodal.parseMp4Header(hx(ftyp +
      " 00000074 6D6F6F76 " +
      mvhd0("00000258", "000003E8").replaceFirst("00000000", "02000000") +
      " 0000000C 6D646174 AABBCCDD")).isEmpty)
    assert(Multimodal.parseMp4Header(hx(ftyp +
      " 00000074 6D6F6F76 " + mvhd0("00000258", "000003E8"))).isEmpty)
    assert(Multimodal.parseMp4Header(hx(ftyp + " 00000005 6D646174")).isEmpty)
  }

  test("m06 parsed frame inverts the generator formulas on real table rows") {
    val out = graft.queries.Pipeline.queries("m06_video_meta")(spark, sfDir)
    val expected = graft.Tables.documents(spark, sfDir).selectExpr(
      "doc_id",
      "source",
      "cast(element_at(array(600, 1000, 30000, 90000), cast(doc_id % 4 as int) + 1) as int) as timescale",
      "cast((doc_id % 3600 + 1) * 100 as bigint) as duration_units",
      "cast(element_at(array(640, 1280, 1920, 3840), cast((doc_id div 4) % 4 as int) + 1) as int) as width",
      "cast(element_at(array(640, 1280, 1920, 3840), cast((doc_id div 4) % 4 as int) + 1) * 9 div 16 as int) as height",
      "cast(248 + doc_id % 9 as int) as mdat_offset",
      "cast(n_chars as bigint) as mdat_bytes",
      "((doc_id % 3600 + 1) * 100 * 1000) div element_at(array(600, 1000, 30000, 90000), cast(doc_id % 4 as int) + 1) as duration_ms")
      .orderBy("doc_id")
    assert(out.collect().toSeq == expected.collect().toSeq,
      "every parsed field must equal the generator's formula — no unknown rows")
  }

  test("parseHeaders maps partitions with the real parser; junk surfaces as unknown") {
    val pngHex = "89504E470D0A1A0A0000000D4948445200000002000000010806000000"
    val media = Seq(
        (1L, "s0", pngHex),
        (2L, "s1", "6E6F74206D65646961")) // "not media"
      .toDF("doc_id", "source", "hx")
      .select(col("doc_id"), col("source"), unhex(col("hx")).as("payload"))
      .as[Multimodal.MediaRecord]
    val out = Multimodal.parseHeaders(spark, media).collect().sortBy(_.doc_id)
    assert(out(0) == Multimodal.MediaHeader(1L, "png", 2, 1, 8, 4))
    assert(out(1) == Multimodal.MediaHeader(2L, "unknown", 0, 0, 0, 0))
  }

  test("parseBmp decodes a HANDCRAFTED 24bpp BMP byte-for-byte (not via encodeBmp)") {
    // 2×2 bottom-up image, stride 8 (6 pixel bytes + 2 pad). Pixels:
    // top row: (0,0)=pure red, (1,0)=pure green; bottom: (0,1)=blue, (1,1)=white.
    // File rows bottom-up → blue,white row FIRST. Hand-assembled hex:
    val hex =
      "424D" + "46000000" + "0000" + "0000" + "36000000" + // BM, size 70, offBits 54
      "28000000" + "02000000" + "02000000" + "0100" + "1800" + // hdr 40, w 2, h 2, planes, 24bpp
      "00000000" + "10000000" + "00000000" + "00000000" + "00000000" + "00000000" +
      "FF0000" + "FFFFFF" + "0000" + // file row 0 = image BOTTOM: blue(B=FF), white; pad
      "0000FF" + "00FF00" + "0000"   // file row 1 = image TOP: red(R=FF), green; pad
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val img = Multimodal.parseBmp(bytes).get
    assert(img.width == 2 && img.height == 2 && !img.topDown)
    assert(img.rgb(0, 0) == ((255, 0, 0)), "top-left must be red — bottom-up row order")
    assert(img.rgb(1, 0) == ((0, 255, 0)))
    assert(img.rgb(0, 1) == ((0, 0, 255)))
    assert(img.rgb(1, 1) == ((255, 255, 255)))
    // TOP-DOWN variant: height = -2 → file rows are already top-first
    val td = bytes.clone()
    td(22) = 0xfe.toByte; td(23) = 0xff.toByte; td(24) = 0xff.toByte; td(25) = 0xff.toByte
    val imgTd = Multimodal.parseBmp(td).get
    assert(imgTd.topDown && imgTd.rgb(0, 0) == ((0, 0, 255)),
      "negative height flips row order: file row 0 is now the image top (blue)")
    // malformed inputs: wrong magic, truncation, 8bpp, compressed
    assert(Multimodal.parseBmp("notabmp".getBytes).isEmpty)
    assert(Multimodal.parseBmp(bytes.take(53)).isEmpty)
    val bpp8 = bytes.clone(); bpp8(28) = 8; assert(Multimodal.parseBmp(bpp8).isEmpty)
    val rle = bytes.clone(); rle(30) = 1; assert(Multimodal.parseBmp(rle).isEmpty)
    val short = bytes.dropRight(1); assert(Multimodal.parseBmp(short).isEmpty,
      "declared raster exceeding the payload must be rejected")
  }

  test("encodeBmp/parseBmp honor bfOffBits across the header gap; blockLum grid is exact") {
    // 5×3 image with a 3-byte junk gap: decode must skip the junk.
    val img = Multimodal.parseBmp(Multimodal.encodeBmp(5, 3, 3,
      (x, y) => (10 * x + y, 20 * x, 30 + y))).get
    assert(img.width == 5 && img.height == 3)
    (0 until 3).foreach(y => (0 until 5).foreach { x =>
      assert(img.rgb(x, y) == ((10 * x + y, 20 * x, 30 + y)), s"pixel ($x,$y)")
    })
    // 4×4 image on a 4×4 grid: each block is exactly one pixel, so
    // the grid IS the luminance raster — sums and means check exactly
    val one = Multimodal.parseBmp(Multimodal.encodeBmp(4, 4, 0,
      (x, y) => (x * 60, y * 60, 128))).get
    val blocks = Multimodal.blockLum(7L, one, grid = 4)
    assert(blocks.length == 16)
    blocks.foreach { b =>
      val expected = Multimodal.lum601(b.bx * 60, b.by * 60, 128)
      assert(b.npx == 1L && b.lum_sum == expected && b.lum_mean == expected.toDouble,
        s"block (${b.by},${b.bx})")
      assert(b.doc_id == 7L && b.width == 4 && b.height == 4)
    }
  }

  test("embed derives the vector from DECODED PIXELS; identical rasters cosine to exactly 1") {
    def bmp(seed: Int) = Multimodal.encodeBmp(8, 6, seed % 5,
      (x, y) => ((seed + 11 * x + 13 * y) % 256, (2 * seed + 5 * x) % 256, (3 * seed + y) % 256))
    val media = Seq(
        (1L, "s0", bmp(3)), (2L, "s0", bmp(3)), // same raster, DIFFERENT gap bytes
        (3L, "s0", bmp(9)),
        (4L, "s0", "not a bmp".getBytes))
      .toDF("doc_id", "source", "payload").as[Multimodal.MediaRecord]
    val out = Multimodal.embed(spark, media).collect().sortBy(_.doc_id)
    assert(out.forall(_.hist.size == 16), "fixed 16-dim block-grid contract")
    assert(out(0).hist == out(1).hist,
      "identical rasters under different container gaps must embed identically — " +
        "the embedding is a function of pixels, not container bytes")
    assert(out(0).hist != out(2).hist, "different rasters must differ")
    assert(out(3).hist.forall(_ == 0.0), "undecodable payloads embed as the zero vector")
    assert(out(0).hist.sum > 0.0, "decoded content must be non-trivial")
    // the p05 composition finds exact-duplicate images at cosine exactly 1.0
    val pairs = SparkEntry.queries("p05_multimodal_dedup")(spark, sfDir)
    assert(pairs.columns.toSeq == Seq("a_id", "b_id", "source", "cosine"))
    val ones = pairs.filter(col("cosine") === 1.0).count()
    assert(pairs.count() > 0, "sf0.001 corpus must yield some near-dup pairs")
    assert(ones > 0, "equal doc_id%48 classes render pixel-identical images; " +
      "they must pair at cosine exactly 1.0 (the clamp contract)")
  }

  test("p05b cell blocking never loses an exact duplicate (incl. cross-source pairs)") {
    // NOTE: identical vectors cosine to 1.0-or-one-ulp-under (the
    // quotient can round BELOW 1 too; the clamp only caps the other
    // side) — both engines agree bitwise, but a === 1.0 filter would
    // be flaky, so the assertions run on pair MEMBERSHIP (any emitted
    // pair passed the 0.995 gate).
    val got = SparkEntry.queries("p05b_multimodal_dedup_cells")(spark, sfDir)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    // equal doc_id % 48 ⇒ identical raster ⇒ identical embedding ⇒
    // identical (deterministic) cell assignment: the pair CANNOT be lost
    val ids = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long].collect()
    val expected = (for { a <- ids; b <- ids if a < b && a % 48 == b % 48 }
      yield (a, b)).toSet
    assert(expected.subsetOf(got),
      s"cell blocking lost exact-dup pairs: ${(expected -- got).take(5)}")
    // the source-blocked p05 structurally misses cross-source duplicates;
    // the cell-blocked form is what the 100-TB corpus needs
    val p05pairs = SparkEntry.queries("p05_multimodal_dedup")(spark, sfDir)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert((expected -- p05pairs).nonEmpty,
      "fixture must contain cross-source duplicates for the claim to have teeth")
  }

  test("palette PNG round-trips with bpp=1 predictors; PLTE violations rejected") {
    val palette = Array.tabulate(200)(i => ((7 * i) % 256, (5 * i + 11) % 256, (3 * i + 1) % 256))
    def idx(x: Int, y: Int): Int = (5 * x + 11 * y) % palette.length
    // round-trip every deflate mode × filtered/unfiltered — the
    // filtered path is where a bpp=3 predictor would corrupt rows
    for (mode <- Seq(0, 1, 2); filt <- Seq(false, true)) {
      val png = Multimodal.encodePngPaletted(11, 7, gap = 3, palette, idx,
        deflateMode = mode, filtered = filt)
      val img = Multimodal.parsePng(png)
        .getOrElse(fail(s"palette parse None, mode=$mode filt=$filt"))
      for (y <- 0 until 7; x <- 0 until 11)
        assert(img.rgb(x, y) == palette(idx(x, y)),
          s"palette pixel drift at ($x,$y), mode=$mode filt=$filt")
    }
    val good = Multimodal.encodePngPaletted(11, 7, 0, palette, idx,
      deflateMode = 1, filtered = true)
    def findChunk(png: Array[Byte], typ: String): Int = {
      val t = typ.getBytes("US-ASCII")
      (0 until png.length - 4).find(i => png.slice(i, i + 4).sameElements(t)).get
    }
    // strip PLTE entirely: color type 3 without a palette is malformed
    val plteAt = findChunk(good, "PLTE") - 4
    val plteLen = java.nio.ByteBuffer.wrap(good, plteAt, 4).getInt
    val noPlte = good.take(plteAt) ++ good.drop(plteAt + 12 + plteLen)
    assert(Multimodal.parsePng(noPlte).isEmpty, "type 3 without PLTE must reject")
    // out-of-range index: shrink PLTE so the max index exceeds it —
    // easiest with a 2-entry palette and an index formula reaching 2
    val tiny = Array((1, 2, 3), (4, 5, 6))
    intercept[IllegalArgumentException] { // encoder refuses
      Multimodal.encodePngPaletted(4, 4, 0, tiny, (x, y) => (x + y) % 3)
    }
    // decoder-side: valid 3-entry image, then truncate PLTE to 2 entries
    // (recompute the chunk CRC so only the INDEX check can reject)
    val three = Array((1, 2, 3), (4, 5, 6), (7, 8, 9))
    val p3 = Multimodal.encodePngPaletted(4, 4, 0, three, (x, y) => (x + y) % 3)
    assert(Multimodal.parsePng(p3).isDefined)
    val at = findChunk(p3, "PLTE") - 4
    val shrunk = p3.take(at) ++ {
      val body = "PLTE".getBytes("US-ASCII") ++ p3.slice(at + 8, at + 8 + 6)
      val crc = new java.util.zip.CRC32
      crc.update(body); val c = crc.getValue
      Array[Byte](0, 0, 0, 6) ++ body ++ Array(
        ((c >> 24) & 0xff).toByte, ((c >> 16) & 0xff).toByte,
        ((c >> 8) & 0xff).toByte, (c & 0xff).toByte)
    } ++ p3.drop(at + 12 + 9)
    assert(Multimodal.parsePng(shrunk).isEmpty,
      "index beyond the (shrunk) palette must be rejected, not clamped")
    // truecolor images still decode exactly as before (type-2 path)
    val rgbPng = Multimodal.encodePng(5, 4, 0, (x, y) => (x, y, x + y),
      deflateMode = 2, filtered = true)
    assert(Multimodal.parsePng(rgbPng).isDefined)
  }

  test("hot-cell salting emits EXACTLY the unsalted pair set (sf0.1, forcing cap)") {
    // The round-12 verdict's #6, pinned: the salted join must be a
    // pure memory-shape change. At sf0.1 the quantizer cells hold
    // ~40+ members, so cap = 8 forces real multi-salt splitting
    // (nsalt up to ~6) on every cell — and the pair set must still
    // equal the unsalted join's bit for bit (ids AND cosines).
    val sf01 = "/root/testdata/sf0.1"
    import graft.operators.Multimodal
    val n = Tables.documentsCount(spark, sf01)
    val kk = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    val emb = Multimodal.embed(spark, graft.queries.Pipeline.framedRaster(spark, sf01)).toDF()
      .transform(graft.CacheScope.cached)
    val cents = graft.operators.IntLloyd.fit(
      emb, "doc_id", "hist", n, numSub = 1, subLen = 16, k = kk,
      cap = math.max(2048L, 64L * kk), iters = 5, salt = "bmpcell")(0)
      .map(_.map(_.toDouble))
    val cells = emb.withColumn("cell", element_at(
      graft.functions.GraftColumns.nearestClusters(col("hist"), cents, 1), 1))
      .transform(graft.CacheScope.cached)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("a_id"), col("b_id"), col("cosine"))
        .as[(Long, Long, Double)].collect().toSet
    val unsalted = pairSet(graft.queries.Pipeline.blockedCosinePairs(cells, "cell", "doc_id", "hist", 0.995))
    val salted = pairSet(graft.queries.Pipeline.saltedBlockedCosinePairs(cells, "cell", "doc_id", "hist", 0.995, cap = 8))
    graft.CacheScope.drain()
    assert(salted == unsalted,
      s"salting changed the pair set: extra=${(salted -- unsalted).take(3)} " +
        s"missing=${(unsalted -- salted).take(3)}")
    assert(unsalted.nonEmpty, "fixture must emit pairs for the pin to have teeth")
    info(s"sf0.1 pair set ${unsalted.size} pairs, identical under cap=8 salting")
  }

  test("mixed BMP/PNG corpus: identical rasters dedup ACROSS containers (decodeRaster dispatch)") {
    // the round-10 gap: embed decoded parseBmp only, so a PNG payload
    // embedded as the zero vector and every cross-container duplicate
    // pair was structurally lost. decodeRaster sniffs the magic and
    // lands both containers on one Raster contract.
    def px(x: Int, y: Int): (Int, Int, Int) =
      ((x * 9 + 2 * y) % 256, (3 * x + y) % 256, (x + 7 * y) % 256)
    val bmp = Multimodal.encodeBmp(10, 7, gap = 2, px)
    val png = Multimodal.encodePng(10, 7, gap = 4, px)
    assert(Multimodal.decodeRaster(bmp).exists(_.isInstanceOf[Multimodal.BmpImage]))
    assert(Multimodal.decodeRaster(png).exists(_.isInstanceOf[Multimodal.PngImage]))
    assert(Multimodal.decodeRaster("neither".getBytes).isEmpty)
    val media = Seq((1L, "s0", bmp), (2L, "s1", png))
      .toDF("doc_id", "source", "payload").as[Multimodal.MediaRecord]
    val out = Multimodal.embed(spark, media).collect().sortBy(_.doc_id)
    assert(out(0).hist.sum > 0.0, "both must decode to real content")
    assert(out(0).hist == out(1).hist,
      "one raster, two containers — the embedding must be container-blind")
    // end-to-end on the registered query: framedRaster frames doc_id
    // and doc_id + 48 with IDENTICAL pixels in DIFFERENT containers
    // ((id/48) % 2 flips); the cell-blocked near-dup must pair them
    val got = SparkEntry.queries("p05b_multimodal_dedup_cells")(spark, sfDir)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    val ids = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long].collect()
    val cross = (for {
      a <- ids; b <- ids
      if a < b && a % 48 == b % 48 && (a / 48) % 2 != (b / 48) % 2
    } yield (a, b)).toSet
    assert(cross.nonEmpty, "fixture must contain cross-container identical pairs")
    assert(cross.subsetOf(got),
      s"cross-container duplicates lost: ${(cross -- got).take(5)}")
  }

  test("approx sketches track exact values (q33/q34 self-check)") {
    val d33 = SparkEntry.queries("q33_approx_distinct")(spark, sfDir)
      .select("approx_students", "exact_students").as[(Double, Long)].collect()
    d33.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) <= math.max(2.0, exact * 0.1),
        s"approx $approx too far from exact $exact")
    }
    val d34 = SparkEntry.queries("q34_approx_percentile")(spark, sfDir)
    Seq("p25", "p50", "p75", "p95").foreach { p =>
      d34.select(s"approx_$p", s"exact_$p").as[(Double, Double)].collect()
        .foreach { case (a, e) =>
          assert(math.abs(a - e) <= math.max(1.0, e * 0.05), s"$p approx $a vs exact $e")
        }
    }
  }

  test("PNG channel types 0/4/6: bpp-aware round-trip, alpha plane, PLTE rejection") {
    def gray(x: Int, y: Int) = Array((3 + 7 * x + 11 * y) % 256)
    def ga(x: Int, y: Int) = Array((5 + 4 * x + 3 * y) % 256, (2 + 6 * x + 5 * y) % 256)
    def rgba(x: Int, y: Int) = Array((5 + 7 * x + 11 * y) % 256,
      (9 + 4 * x + 3 * y) % 256, (2 + 6 * x + 5 * y) % 256, (7 + 2 * x + 9 * y) % 256)
    for (mode <- 0 to 2; filt <- Seq(false, true)) {
      val w = 9; val h = 7
      val g = Multimodal.parsePng(
        Multimodal.encodePngSamples(w, h, 3, 0, gray, mode, filt))
        .getOrElse(fail(s"gray None mode=$mode filt=$filt"))
      for (x <- 0 until w; y <- 0 until h) {
        val v = gray(x, y)(0)
        assert(g.rgb(x, y) == ((v, v, v)) && g.alphaAt(x, y) == 255)
      }
      val a4 = Multimodal.parsePng(
        Multimodal.encodePngSamples(w, h, 0, 4, ga, mode, filt))
        .getOrElse(fail(s"gray+alpha None mode=$mode filt=$filt"))
      for (x <- 0 until w; y <- 0 until h) {
        val Array(v, a) = ga(x, y)
        assert(a4.rgb(x, y) == ((v, v, v)) && a4.alphaAt(x, y) == a)
      }
      val a6 = Multimodal.parsePng(
        Multimodal.encodePngSamples(w, h, 5, 6, rgba, mode, filt))
        .getOrElse(fail(s"rgba None mode=$mode filt=$filt"))
      for (x <- 0 until w; y <- 0 until h) {
        val Array(r, gg, b, a) = rgba(x, y)
        assert(a6.rgb(x, y) == ((r, gg, b)) && a6.alphaAt(x, y) == a)
      }
    }
    // PLTE is rejected on every non-palette type (strict profile):
    // splice a valid PLTE chunk into a grayscale image before IDAT
    val base = Multimodal.encodePngSamples(8, 6, 0, 0, gray, 0, false)
    val ihdrEnd = 8 + 12 + 13 // signature + IHDR chunk
    val plteData = Array.tabulate(9)(i => (i * 11 % 256).toByte)
    val crc = { val c = new java.util.zip.CRC32
      c.update("PLTE".getBytes("US-ASCII") ++ plteData); c.getValue }
    val plteChunk = Array[Byte](0, 0, 0, 9) ++
      "PLTE".getBytes("US-ASCII") ++ plteData ++
      Array(((crc >> 24) & 0xff).toByte, ((crc >> 16) & 0xff).toByte,
        ((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
    val spliced = base.take(ihdrEnd) ++ plteChunk ++ base.drop(ihdrEnd)
    assert(Multimodal.parsePng(spliced).isEmpty, "PLTE on gray must reject")
  }

  test("PNG encode/decode cross-validates against the JDK ImageIO codec, all five color types") {
    import java.awt.image.BufferedImage
    def check(png: Array[Byte]): Unit = {
      val ours = Multimodal.parsePng(png).getOrElse(fail("our parse None"))
      val ref: BufferedImage = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(ref != null, "ImageIO rejected our encoder's bytes")
      assert(ref.getWidth == ours.width && ref.getHeight == ours.height)
      // gray PNGs land in a linear-gray color space where getRGB
      // applies an sRGB transfer curve — compare RAW raster samples
      // there; RGB/RGBA/indexed color models pass getRGB through
      val grayCs = ref.getColorModel.getColorSpace.getType ==
        java.awt.color.ColorSpace.TYPE_GRAY
      for (x <- 0 until ours.width; y <- 0 until ours.height) {
        val (r, g, b) = ours.rgb(x, y)
        if (grayCs) {
          val v = ref.getRaster.getSample(x, y, 0)
          assert(v == r && v == g && v == b, s"gray drift at ($x,$y): $v vs $r")
          val a = if (ref.getColorModel.hasAlpha)
            ref.getRaster.getSample(x, y, 1) else 255
          assert(a == ours.alphaAt(x, y), s"alpha drift at ($x,$y)")
        } else {
          val argb = ref.getRGB(x, y)
          assert(((argb >> 16) & 0xff) == r && ((argb >> 8) & 0xff) == g &&
            (argb & 0xff) == b, s"rgb drift at ($x,$y)")
          assert(((argb >> 24) & 0xff) == ours.alphaAt(x, y), s"alpha drift at ($x,$y)")
        }
      }
    }
    for (mode <- 0 to 2) {
      check(Multimodal.encodePngSamples(11, 8, 4, 0,
        (x, y) => Array((3 + 7 * x + 11 * y) % 256), mode, filtered = true))
      check(Multimodal.encodePng(11, 8, 4, (x, y) => (
        (5 + 7 * x + 11 * y) % 256, (9 + 4 * x + 3 * y) % 256,
        (2 + 6 * x + 5 * y) % 256), mode, filtered = true))
      check(Multimodal.encodePngPaletted(11, 8, 4,
        Array.tabulate(19)(i => ((7 * i + 3) % 256, (5 * i + 11) % 256, (3 * i + 7) % 256)),
        (x, y) => (13 + 5 * x + 11 * y) % 19, mode, filtered = true))
      check(Multimodal.encodePngSamples(11, 8, 4, 4,
        (x, y) => Array((5 + 4 * x + 3 * y) % 256, (2 + 6 * x + 5 * y) % 256),
        mode, filtered = true))
      check(Multimodal.encodePngSamples(11, 8, 4, 6,
        (x, y) => Array((5 + 7 * x + 11 * y) % 256, (9 + 4 * x + 3 * y) % 256,
          (2 + 6 * x + 5 * y) % 256, (7 + 2 * x + 9 * y) % 256),
        mode, filtered = true))
    }
  }

  test("encodePng/parsePng roundtrip both IDAT layouts; every validation layer rejects") {
    import graft.operators.Multimodal
    def px(x: Int, y: Int): (Int, Int, Int) = ((x * 7 + y) % 256, (y * 5) % 256, (x + 3 * y) % 256)
    // small raster → single-IDAT path; larger → split-IDAT + multi-block
    for ((w, h) <- Seq((4, 3), (17, 11))) {
      val bytes = Multimodal.encodePng(w, h, gap = 5, px)
      val img = Multimodal.parsePng(bytes).getOrElse(fail(s"parsePng None at $w x $h"))
      assert(img.width == w && img.height == h)
      for (x <- 0 until w; y <- 0 until h)
        assert(img.rgb(x, y) == px(x, y), s"pixel drift at ($x,$y) in $w x $h")
      // single-IDAT when the zlib stream is short, split otherwise
      val idatCount = bytes.sliding(4).count(_.sameElements("IDAT".getBytes("US-ASCII")))
      if (h * (1 + 3 * w) <= 40) assert(idatCount == 1) else assert(idatCount == 2)
    }
    val good = Multimodal.encodePng(9, 7, gap = 3, px)
    // every single-byte corruption of the payload is REJECTED, never
    // mis-decoded: chunk CRCs cover types+data, adler covers the
    // raster, LEN/NLEN covers the framing
    for (i <- Seq(9, 20, 40, good.length / 2, good.length - 6)) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x41).toByte
      val parsed = Multimodal.parsePng(bad)
      assert(parsed.isEmpty, s"corruption at byte $i must be rejected")
    }
    assert(Multimodal.parsePng(good.take(good.length - 9)).isEmpty, "truncation")
    assert(Multimodal.parsePng(Array.fill(64)(0x7f.toByte)).isEmpty, "junk")
    // cross-format: the BMP parser rejects PNG bytes and vice versa
    assert(Multimodal.parseBmp(good).isEmpty)
    val bmp = Multimodal.encodeBmp(6, 5, gap = 2, px)
    assert(Multimodal.parsePng(bmp).isEmpty)
    // one Raster contract: both decoders feed the same blockLum and
    // agree on the grid for the same pixel function and dims
    val gPng = Multimodal.blockLum(1L, Multimodal.parsePng(
      Multimodal.encodePng(12, 9, 0, px)).get, grid = 4)
    val gBmp = Multimodal.blockLum(1L, Multimodal.parseBmp(
      Multimodal.encodeBmp(12, 9, 0, px)).get, grid = 4)
    assert(gPng.toSeq == gBmp.toSeq, "two containers, one embedding")
  }

  test("GIF round-trips; ImageIO cross-validation BOTH directions; interlace, sub-blocks, frames") {
    import graft.operators.Gif
    // 1) our encoder -> our decoder, exercising every rotation arm
    for (seed <- 0 until 40) {
      val g = seed % 40
      val w = 4 + seed % 13; val h = 4 + seed % 9
      val npal = 4 + (seed * 17) % 250
      val pal = Array.tabulate(npal)(i =>
        ((11 * i + 5 * g) % 256, (7 * i + 3 * g) % 256, (5 * i + 13 * g) % 256))
      def idx(x: Int, y: Int): Int = (9 * g + 7 * x + 5 * y) % npal
      val z = Gif.encodeGif(w, h, pal, idx, interlace = seed % 2 == 1,
        version89 = seed % 3 != 0, gce = seed % 3 != 0 && seed % 5 == 0,
        comment = if (seed % 3 != 0 && seed % 7 == 2) Some(s"c$seed") else None,
        chunk = 3 + seed % 253, extraFrame = seed % 4 == 1)
      val pr = Gif.parseGif(z).getOrElse(fail(s"parse None: seed $seed"))
      assert(pr.raster.width == w && pr.raster.height == h)
      assert(pr.nFrames == (if (seed % 4 == 1) 2 else 1))
      assert(pr.interlaced == (seed % 2 == 1))
      for (y <- 0 until h; x <- 0 until w) {
        assert(pr.raster.index(x, y) == idx(x, y), s"seed $seed px ($x,$y)")
        assert(pr.raster.rgb(x, y) == pal(idx(x, y)))
      }
      // 2) our encoder -> ImageIO (pixel-exact). Two verified JDK
      //    reader quirks are avoided in THIS direction only (both
      //    inputs are spec-valid and our decoder handles them):
      //    tiny sub-blocks corrupt its bit refill (chunk=3 drifts
      //    from pixel 7), and an EMPTY interlace pass (h <= 4)
      //    mis-assigns rows (it advances passes with a single `if`,
      //    not a loop — giflib and our schedule skip the empty pass)
      val zIo = Gif.encodeGif(w, h, pal, idx,
        interlace = seed % 2 == 1 && h >= 5,
        version89 = seed % 3 != 0, gce = seed % 3 != 0 && seed % 5 == 0,
        comment = if (seed % 3 != 0 && seed % 7 == 2) Some(s"c$seed") else None,
        chunk = 255, extraFrame = seed % 4 == 1)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(zIo))
      assert(ref != null, s"ImageIO rejected seed $seed")
      assert(ref.getWidth == w && ref.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, gg, b) = pal(idx(x, y))
        val got = ref.getRGB(x, y)
        assert(((got >> 16) & 0xff, (got >> 8) & 0xff, got & 0xff) == ((r, gg, b)),
          s"ImageIO drift seed $seed at ($x,$y)")
      }
    }
    // 3) ImageIO writer -> our decoder (pixel-exact), image large
    //    enough to cross several LZW width boundaries
    val big = new java.awt.image.BufferedImage(101, 83,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 83; x <- 0 until 101)
      big.setRGB(x, y, ((x * 31 + y * 57) % 255) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(big, "gif", bos))
    val mine = Gif.parseGif(bos.toByteArray)
      .getOrElse(fail("our decoder rejected ImageIO's GIF"))
    assert(mine.raster.width == 101 && mine.raster.height == 83)
    for (y <- 0 until 83; x <- 0 until 101) {
      val want = big.getRGB(x, y) & 0xffffff
      val (r, g, b) = mine.raster.rgb(x, y)
      assert(((r << 16) | (g << 8) | b) == want, s"decode drift at ($x,$y)")
    }
  }

  test("GIF malformations return None, never throw") {
    import graft.operators.Gif
    val pal = Array.tabulate(16)(i => (i * 16, 255 - i * 16, i * 7))
    val good = Gif.encodeGif(10, 8, pal, (x, y) => (x + y) % 16,
      interlace = true, gce = true, comment = Some("x"), extraFrame = true)
    assert(Gif.parseGif(good).isDefined)
    // truncations at every layer
    for (cut <- Seq(0, 5, 12, 20, good.length / 2, good.length - 1))
      assert(Gif.parseGif(good.take(cut)).isEmpty, s"truncation at $cut")
    // trailing garbage after the trailer
    assert(Gif.parseGif(good :+ 0x00.toByte).isEmpty)
    // bad signature
    val sig = good.clone(); sig(0) = 'J'.toByte
    assert(Gif.parseGif(sig).isEmpty)
    // reserved block label
    val lbl = good.clone()
    val extAt = good.indexOf(0x21.toByte)
    lbl(extAt + 1) = 0x42.toByte
    assert(Gif.parseGif(lbl).isEmpty)
    // image without ANY color table
    val noGct = Gif.encodeGif(4, 4, pal, (_, _) => 0)
    val cut = noGct.clone(); cut(10) = (cut(10) & 0x7f).toByte // GCT flag off
    // (table bytes now misparse as blocks -> must reject, not throw)
    assert(Gif.parseGif(cut).isEmpty)
    // corruption sweep over the LZW body: reject or decode clean
    var caught = 0
    for (i <- 13 until good.length - 1) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      Gif.parseGif(bad) match {
        case None => caught += 1
        case Some(pr) => assert(pr.raster.width <= 65535)
      }
    }
    assert(caught > 0)
    assert(Gif.parseGif(Array.fill[Byte](32)(0x11)).isEmpty)
    assert(Gif.parseGif(Array.emptyByteArray).isEmpty)
  }
}
