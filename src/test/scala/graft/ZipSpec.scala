package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Zip

/** ZIP archive walk: round-trips against our own encoder across the
  * full rotation space, cross-validates BOTH directions against the
  * JDK's java.util.zip (a parser tested only against its sibling
  * encoder can share the same misreading of APPNOTE), and drives a
  * malformation per validation layer — index level (None) vs member
  * level (counted) per the class contract. No Spark involved. */
class ZipSpec extends AnyFunSuite {

  private def members(seed: Int): Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    Seq(
      "empty.txt" -> Array.emptyByteArray,
      "a/b.txt" -> "hello zip world, hello zip world".getBytes("UTF-8"),
      "runs.bin" -> Array.fill(2000)(0x42.toByte),
      "rand.bin" -> { val a = new Array[Byte](1500); rnd.nextBytes(a); a },
      "utf8-näme.txt" -> "päyload ©".getBytes("UTF-8"))
  }

  test("encoder → our parser: all rotations, byte-exact members") {
    for (dd <- Seq(false, true); utf8 <- Seq(false, true);
         extra <- Seq(None, Some(Array[Byte](1, 2, 3)));
         comment <- Seq(None, Some("a zip comment"))) {
      val ms = members(7).filter { case (n, _) =>
        utf8 || n.getBytes("UTF-8").forall(b => (b & 0xff) < 0x80)
      }
      val z = Zip.encodeZip(ms, methods = j => j % 3, dd = dd,
        utf8Names = utf8, extra = extra, comment = comment)
      val got = Zip.parseZip(z).getOrElse(fail(s"parse None dd=$dd utf8=$utf8"))
      assert(got.length == ms.length)
      got.zip(ms).foreach { case (m, (name, raw)) =>
        assert(m.ok, s"member $name not ok")
        assert(m.name == name)
        assert(m.data.sameElements(raw), s"member $name drift")
      }
    }
  }

  test("non-UTF8-flagged high-byte name is a counted member, not mojibake") {
    val ms = members(7) // includes utf8-näme.txt
    val z = Zip.encodeZip(ms, methods = _ => 0, utf8Names = false)
    val got = Zip.parseZip(z).getOrElse(fail("parse None"))
    assert(got.count(!_.ok) == 1)
    assert(got.filter(_.ok).map(_.name) == ms.map(_._1).filterNot(_.contains("ä")))
  }

  test("our encoder's bytes read identically by java.util.zip.ZipInputStream") {
    for (dd <- Seq(false, true); utf8 <- Seq(true, false)) {
      val ms = members(11).filter { case (n, _) =>
        utf8 || n.getBytes("UTF-8").forall(b => (b & 0xff) < 0x80)
      }
      val z = Zip.encodeZip(ms, methods = j => (j + 1) % 3, dd = dd,
        utf8Names = utf8, comment = Some("jdk-check"))
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(z))
      val got = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .map { e =>
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var n = zin.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = zin.read(buf) }
          (e.getName, bos.toByteArray)
        }.toVector
      zin.close()
      assert(got.map(_._1) == ms.map(_._1).toVector, s"dd=$dd utf8=$utf8")
      got.zip(ms).foreach { case ((n, b), (_, raw)) =>
        assert(b.sameElements(raw), s"JDK read drift on $n dd=$dd")
      }
    }
  }

  test("java.util.zip.ZipOutputStream's bytes (stored + deflated) decode identically by ours") {
    for (stored <- Seq(false, true)) {
      val ms = members(13)
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      zos.setComment("made by the JDK")
      ms.foreach { case (name, raw) =>
        val e = new java.util.zip.ZipEntry(name)
        if (stored) {
          e.setMethod(java.util.zip.ZipEntry.STORED)
          e.setSize(raw.length.toLong)
          e.setCompressedSize(raw.length.toLong)
          val c = new java.util.zip.CRC32; c.update(raw, 0, raw.length)
          e.setCrc(c.getValue)
        }
        zos.putNextEntry(e); zos.write(raw); zos.closeEntry()
      }
      zos.close()
      val got = Zip.parseZip(bos.toByteArray)
        .getOrElse(fail(s"parse None on JDK zip stored=$stored"))
      assert(got.length == ms.length)
      got.zip(ms).foreach { case (m, (name, raw)) =>
        assert(m.ok && m.name == name && m.data.sameElements(raw),
          s"drift on $name stored=$stored ok=${m.ok}")
      }
    }
  }

  test("member-level malformations are counted, index stays walkable") {
    val ms = members(17).take(4) // ASCII names only
    // a perturbed recorded CRC (the encoder's corrupt hook)
    val z1 = Zip.encodeZip(ms, methods = j => j % 3, corrupt = 2)
    val g1 = Zip.parseZip(z1).getOrElse(fail("index must survive"))
    assert(g1.count(!_.ok) == 1 && !g1(2).ok && g1(2).name == ms(2)._1)
    // an encrypted member (general-purpose bit 0)
    val z2 = Zip.encodeZip(ms, methods = _ => 0)
    z2(6) = (z2(6) | 1).toByte // first local header's flag field
    // and its central-directory copy (find the first CD entry by
    // forward signature scan — test-only convenience)
    var first = -1
    var j = 0
    while (first < 0 && j < z2.length - 4) {
      if (z2(j) == 0x50 && z2(j + 1) == 0x4b && z2(j + 2) == 1 && z2(j + 3) == 2)
        first = j
      j += 1
    }
    assert(first > 0)
    z2(first + 8) = (z2(first + 8) | 1).toByte
    val g2 = Zip.parseZip(z2).getOrElse(fail("index must survive encryption flag"))
    assert(!g2(0).ok && g2.drop(1).forall(_.ok))
    // a flipped data byte: CRC must catch it
    val z3 = Zip.encodeZip(ms, methods = _ => 0)
    // first member data starts after its 30-byte local header + name
    val d0 = 30 + ms.head._1.length
    val z3b = z3.clone(); z3b(d0 + 40) = (z3b(d0 + 40) ^ 0x7f).toByte
    val g3 = Zip.parseZip(z3b).getOrElse(fail("index must survive body flip"))
    assert(g3.count(!_.ok) >= 1)
  }

  test("index-level malformations return None") {
    val ms = members(19).take(3)
    val z = Zip.encodeZip(ms, methods = _ => 1)
    // truncated EOCD
    assert(Zip.parseZip(z.dropRight(3)).isEmpty)
    // flipped central-directory signature
    var first = -1
    var j = 0
    while (first < 0 && j < z.length - 4) {
      if (z(j) == 0x50 && z(j + 1) == 0x4b && z(j + 2) == 1 && z(j + 3) == 2)
        first = j
      j += 1
    }
    val zc = z.clone(); zc(first + 2) = 9
    assert(Zip.parseZip(zc).isEmpty)
    // entry-count lie (EOCD total += 1): CD walk must not tile
    val ze = z.clone()
    val eocd = ze.length - 22
    ze(eocd + 10) = (ms.length + 1).toByte
    ze(eocd + 8) = (ms.length + 1).toByte
    assert(Zip.parseZip(ze).isEmpty)
    // garbage, empty, too-short
    assert(Zip.parseZip(Array.emptyByteArray).isEmpty)
    assert(Zip.parseZip(Array.fill(64)(0x33.toByte)).isEmpty)
  }

  test("EOCD scan is comment-tiling-safe: payload bytes spelling the signature cannot hijack") {
    // a stored member whose BODY contains a fake EOCD record image;
    // the real EOCD (with its correct comment tiling) must win
    val fake = Zip.encodeZip(Seq("x" -> Array[Byte](1, 2)), methods = _ => 0)
    val eocdImg = fake.takeRight(22)
    val ms = Seq("trap.bin" -> eocdImg, "ok.txt" -> "fine".getBytes("UTF-8"))
    val z = Zip.encodeZip(ms, methods = _ => 0, comment = Some("tail comment"))
    val got = Zip.parseZip(z).getOrElse(fail("real EOCD must be found"))
    assert(got.length == 2 && got.forall(_.ok))
    assert(got(0).data.sameElements(eocdImg))
  }
}
