package graft.sources

/** TAR archive read path — the other half of the corpus-drop
  * container story (t37's ZIP): source-code datasets, model drops and
  * academic corpora overwhelmingly ship as `.tar.gz`. Implements the
  * public POSIX.1-1988 ustar layout plus the GNU longname extension a
  * real tarball actually carries:
  *
  *   - 512-byte header blocks; name/prefix split, octal numeric
  *     fields tolerant of leading spaces and NUL/space terminators
  *     (the wire reality across GNU/BSD/busybox writers);
  *   - the header CHECKSUM verified per entry (unsigned sum with the
  *     checksum field read as spaces) — tar's only integrity device;
  *   - typeflags: '0'/NUL regular files (body bytes), '5' directories
  *     (no body), 'L' GNU longname (the NEXT entry takes the
  *     NUL-terminated data block as its name), 'x'/'g' pax headers
  *     SKIPPED as advisory metadata (size-governed, so the walk stays
  *     aligned), anything else counted as a special entry and its
  *     data skipped;
  *   - data rounded up to 512-byte blocks; end-of-archive = two zero
  *     blocks (trailing zero padding tolerated, trailing garbage is a
  *     malformation).
  *
  * Unlike ZIP there is no index and no per-member CRC: a header whose
  * checksum fails poisons everything after it (its size field cannot
  * be trusted, so the walk cannot resync) — so validation here is
  * ARCHIVE-level (e17's corrupt-shard semantics): None on the first
  * bad header / truncated data / base-256 size (GNU binary large
  * files — a deliberate fail-closed boundary; >8 GiB members want a
  * streaming read path) / non-UTF-8 name.
  *
  * Cross-validated BOTH directions against GNU tar 1.34 in TarSpec
  * (our encoder's bytes list and extract identically via tar(1); a
  * tar(1)-built archive — including a >100-char path — decodes
  * identically by this parser).
  *
  * Scale: one linear pass over archive bytes, used from mapPartitions
  * — map-only, no state, never throws.
  */
object Tar {

  /** One walked entry. kind: 0 = regular file, 5 = directory,
    * 9 = special (link/fifo/device/unknown — data skipped). */
  final case class TarEntry(name: String, kind: Int, data: Array[Byte])

  /** Parse an octal numeric field: leading spaces/NULs skipped,
    * terminated by space/NUL; returns -1 on any other byte or
    * overflow, -2 on a base-256 (high-bit) marker. */
  private def octal(p: Array[Byte], off: Int, len: Int): Long = {
    if ((p(off) & 0x80) != 0) return -2L // GNU base-256 binary form
    var i = off
    val end = off + len
    while (i < end && (p(i) == ' '.toByte || p(i) == 0)) i += 1
    var v = 0L
    var seen = false
    while (i < end) {
      val c = p(i) & 0xff
      if (c == ' ' || c == 0) {
        i = end // terminator: done (remaining bytes unchecked, per wire reality)
      } else if (c >= '0' && c <= '7') {
        v = v * 8 + (c - '0')
        if (v < 0) return -1L
        seen = true
        i += 1
      } else return -1L
    }
    if (seen) v else -1L
  }

  /** Unsigned header checksum with the chksum field (148..155) read
    * as ASCII spaces, per the spec. */
  private def checksum(p: Array[Byte], off: Int): Long = {
    var s = 0L
    var i = 0
    while (i < 512) {
      s += (if (i >= 148 && i < 156) ' '.toInt else p(off + i) & 0xff)
      i += 1
    }
    s
  }

  private def isZeroBlock(p: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < 512) { if (p(off + i) != 0) return false; i += 1 }
    true
  }

  /** NUL-terminated string field, strict UTF-8. None = embedded
    * malformation. */
  private def strField(p: Array[Byte], off: Int, len: Int): Option[String] = {
    var end = off
    val cap = off + len
    while (end < cap && p(end) != 0) end += 1
    Utf8.decodeStrict(java.util.Arrays.copyOfRange(p, off, end))
  }

  /** Walk a tar archive. None = archive-level malformation (bad
    * checksum, unparseable size, truncation, trailing garbage,
    * base-256 size, undecodable name, oversized member). */
  def parseTar(p: Array[Byte],
               maxMemberOut: Int = 1 << 26): Option[Vector[TarEntry]] = {
    if (p.length % 512 != 0) return None
    val out = Vector.newBuilder[TarEntry]
    var pos = 0
    var pendingLongName: Option[String] = None
    var ended = false
    while (pos < p.length && !ended) {
      if (isZeroBlock(p, pos)) {
        // end-of-archive: a second zero block then only zero padding
        if (pos + 512 > p.length || !isZeroBlock(p, pos + 512)) return None
        var t = pos + 1024
        while (t < p.length) {
          if (!isZeroBlock(p, t)) return None
          t += 512
        }
        ended = true
      } else {
        if (pos + 512 > p.length) return None
        val stored = octal(p, pos + 148, 8)
        if (stored < 0 || stored != checksum(p, pos)) return None
        val size = octal(p, pos + 124, 12)
        if (size < 0 || size > maxMemberOut) return None
        val dataEnd = pos + 512 + size.toInt
        val blockEnd = pos + 512 + ((size.toInt + 511) / 512) * 512
        if (blockEnd > p.length) return None
        val typeflag = p(pos + 156)
        val nameOpt = strField(p, pos, 100).flatMap { base =>
          strField(p, pos + 345, 155).map { prefix =>
            if (prefix.isEmpty) base else prefix + "/" + base
          }
        }
        if (nameOpt.isEmpty) return None
        typeflag match {
          case 'L' => // GNU longname: data block is the NEXT entry's name
            val raw = java.util.Arrays.copyOfRange(p, pos + 512, dataEnd)
            val end = { var e = raw.length; while (e > 0 && raw(e - 1) == 0) e -= 1; e }
            Utf8.decodeStrict(java.util.Arrays.copyOf(raw, end)) match {
              case Some(n) => pendingLongName = Some(n)
              case None => return None
            }
          case 'x' | 'g' => // pax extended headers: advisory, skipped
            pendingLongName = None
          case '0' | 0 =>
            val nm = pendingLongName.getOrElse(nameOpt.get)
            pendingLongName = None
            out += TarEntry(nm, 0,
              java.util.Arrays.copyOfRange(p, pos + 512, dataEnd))
          case '5' =>
            val nm = pendingLongName.getOrElse(nameOpt.get)
            pendingLongName = None
            if (size != 0) return None
            out += TarEntry(nm, 5, Array.emptyByteArray)
          case _ =>
            val nm = pendingLongName.getOrElse(nameOpt.get)
            pendingLongName = None
            out += TarEntry(nm, 9, Array.emptyByteArray)
        }
        pos = blockEnd
      }
    }
    if (!ended) return None // missing end-of-archive marker
    Some(out.result())
  }

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    // len-1 octal digits, zero-padded, NUL terminator (GNU style)
    var i = off + len - 2
    var x = v
    while (i >= off) {
      h(i) = ('0' + (x % 8).toInt).toByte
      x /= 8
      i -= 1
    }
    h(off + len - 1) = 0
  }

  private def header(name: String, size: Long, typeflag: Byte): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("UTF-8")
    require(nb.length <= 100, "encoder: name > 100 bytes needs the 'L' path")
    System.arraycopy(nb, 0, h, 0, nb.length)
    putOctal(h, 100, 8, 420) // mode 0644
    putOctal(h, 108, 8, 0); putOctal(h, 116, 8, 0) // uid, gid
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, 1704067200L) // fixed mtime (deterministic)
    h(156) = typeflag
    h(257) = 'u'; h(258) = 's'; h(259) = 't'; h(260) = 'a'; h(261) = 'r'; h(262) = 0
    h(263) = '0'; h(264) = '0' // POSIX ustar magic + version
    // checksum: 6 octal digits, NUL, space
    val sum = checksum(h, 0)
    var i = 0
    var x = sum
    val d = new Array[Byte](6)
    while (i < 6) { d(5 - i) = ('0' + (x % 8).toInt).toByte; x /= 8; i += 1 }
    System.arraycopy(d, 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }

  /** Fixture/encoder half: write a ustar archive of (name, body)
    * files, with an optional leading directory entry and GNU 'L'
    * longname records for >100-byte names. `corruptHeader` perturbs
    * that file index's stored checksum — the bit-rot class tar can
    * only detect, and (no index, no resync) an ARCHIVE-level
    * malformation per the parser contract. */
  def encodeTar(files: Seq[(String, Array[Byte])],
                dir: Option[String] = None,
                corruptHeader: Int = -1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    def pad(n: Int): Unit = {
      val r = n % 512
      if (r != 0) out.write(new Array[Byte](512 - r))
    }
    dir.foreach { d => out.write(header(d, 0, '5')) }
    files.zipWithIndex.foreach { case ((name, body), j) =>
      val nb = name.getBytes("UTF-8")
      if (nb.length > 100) {
        // GNU longname record: header name is a placeholder
        val data = java.util.Arrays.copyOf(nb, nb.length + 1) // NUL-terminated
        out.write(header("././@LongLink", data.length.toLong, 'L'))
        out.write(data); pad(data.length)
      }
      val h = header(if (nb.length > 100) s"longname-$j" else name,
        body.length.toLong, '0')
      if (j == corruptHeader) h(148) = (h(148) ^ 0x1).toByte
      out.write(h)
      out.write(body); pad(body.length)
    }
    out.write(new Array[Byte](1024)) // end-of-archive
    out.toByteArray
  }
}
