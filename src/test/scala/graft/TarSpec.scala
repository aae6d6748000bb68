package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tar

/** ustar walk: round-trips against our own encoder, cross-validates
  * BOTH directions against GNU tar 1.34 (a parser tested only against
  * its sibling encoder can share the same misreading of the spec),
  * and drives the archive-level malformation sweep. No Spark. */
class TarSpec extends AnyFunSuite {

  private val tarBin = new java.io.File("/usr/bin/tar")

  private def files(seed: Int): Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    Seq(
      "data/empty.txt" -> Array.emptyByteArray,
      "data/a.txt" -> "hello tar world".getBytes("UTF-8"),
      ("data/" + "d" * 110 + "/long.txt") -> "behind a long name".getBytes("UTF-8"),
      "data/blob.bin" -> { val a = new Array[Byte](1500); rnd.nextBytes(a); a })
  }

  test("encoder → our parser: dir entry, longname, bodies byte-exact") {
    val fs = files(3)
    val t = Tar.encodeTar(fs, dir = Some("data/"))
    val got = Tar.parseTar(t).getOrElse(fail("parse None"))
    assert(got.head.kind == 5 && got.head.name == "data/")
    val regs = got.filter(_.kind == 0)
    assert(regs.map(_.name) == fs.map(_._1).toVector)
    regs.zip(fs).foreach { case (e, (_, raw)) =>
      assert(e.data.sameElements(raw), s"drift on ${e.name}")
    }
  }

  test("our encoder's bytes list and extract identically via GNU tar(1)") {
    assume(tarBin.exists)
    val fs = files(5)
    val t = Tar.encodeTar(fs, dir = Some("data/"))
    val tmp = java.nio.file.Files.createTempFile("graft-tar", ".tar")
    java.nio.file.Files.write(tmp, t)
    def run(args: String*): (Int, Array[Byte]) = {
      val pb = new ProcessBuilder((Seq("/usr/bin/tar") ++ args): _*)
      pb.redirectErrorStream(false)
      val p = pb.start()
      val out = p.getInputStream.readAllBytes()
      val rc = p.waitFor()
      (rc, out)
    }
    val (rc, listing) = run("-tf", tmp.toString)
    assert(rc == 0, "tar -tf failed on our bytes")
    assert(new String(listing, "UTF-8").split("\n").toSeq ==
      "data/" +: fs.map(_._1))
    fs.foreach { case (name, raw) =>
      val (rc2, body) = run("-xOf", tmp.toString, name)
      assert(rc2 == 0 && body.sameElements(raw), s"tar -xOf drift on $name")
    }
    java.nio.file.Files.delete(tmp)
  }

  test("GNU tar(1)-built archive (gnu format, >100-char path) decodes identically by ours") {
    assume(tarBin.exists)
    val root = java.nio.file.Files.createTempDirectory("graft-tarsrc")
    val deep = root.resolve("data").resolve("e" * 110)
    java.nio.file.Files.createDirectories(deep)
    val f1 = root.resolve("data/a.txt")
    java.nio.file.Files.write(f1, "from gnu tar".getBytes("UTF-8"))
    val f2 = deep.resolve("long.txt")
    java.nio.file.Files.write(f2, "long path body".getBytes("UTF-8"))
    val out = root.resolve("x.tar")
    val pb = new ProcessBuilder("/usr/bin/tar", "--format=gnu", "-cf",
      out.toString, "-C", root.toString,
      "data/a.txt", "data/" + "e" * 110 + "/long.txt")
    assert(pb.start().waitFor() == 0)
    val bytes = java.nio.file.Files.readAllBytes(out)
    val got = Tar.parseTar(bytes).getOrElse(fail("parse None on GNU tar bytes"))
    val regs = got.filter(_.kind == 0)
    assert(regs.map(_.name) ==
      Vector("data/a.txt", "data/" + "e" * 110 + "/long.txt"))
    assert(new String(regs(0).data, "UTF-8") == "from gnu tar")
    assert(new String(regs(1).data, "UTF-8") == "long path body")
  }

  test("archive-level malformations return None") {
    val fs = files(7).take(2)
    val good = Tar.encodeTar(fs)
    assert(Tar.parseTar(good).isDefined)
    // perturbed header checksum (the encoder's corrupt hook)
    assert(Tar.parseTar(Tar.encodeTar(fs, corruptHeader = 1)).isEmpty)
    // truncation: drop the end-of-archive blocks
    assert(Tar.parseTar(good.dropRight(1024)).isEmpty)
    // misaligned length
    assert(Tar.parseTar(good.dropRight(7)).isEmpty)
    // trailing garbage after the end marker
    assert(Tar.parseTar(good ++ Array.fill(512)(0x41.toByte)).isEmpty)
    // base-256 (binary) size field is a deliberate fail-closed boundary
    val b256 = good.clone()
    b256(124) = 0x80.toByte
    // re-stamp the checksum so ONLY the size form can fail
    locally {
      var s = 0L
      for (i <- 0 until 512) s += (if (i >= 148 && i < 156) ' '.toInt else b256(i) & 0xff)
      val d = new Array[Byte](6)
      var x = s
      for (i <- 0 until 6) { d(5 - i) = ('0' + (x % 8).toInt).toByte; x /= 8 }
      System.arraycopy(d, 0, b256, 148, 6)
      b256(154) = 0; b256(155) = ' '
    }
    assert(Tar.parseTar(b256).isEmpty)
    // empty / all-zero input: no entries is a VALID empty archive only
    // if the end marker is present
    assert(Tar.parseTar(Array.emptyByteArray).isEmpty)
    assert(Tar.parseTar(new Array[Byte](1024)).contains(Vector()))
  }
}
