package graft.sources

import graft.operators.Inflate

/** ZIP archive read path — the container format the long tail of a
  * real crawl/corpus intake actually arrives in (site exports, DOCX/
  * EPUB/JAR payloads, dataset drops). Implements the public PKWARE
  * APPNOTE / ISO/IEC 21320-1 subset a batch reader needs, the way
  * real readers do it: the CENTRAL DIRECTORY is the index —
  *
  *   1. locate the end-of-central-directory record by scanning
  *      backward through the ≤65535-byte comment window, accepting
  *      only an EOCD whose comment length exactly tiles the file
  *      (a payload byte that happens to spell the signature cannot
  *      hijack the walk);
  *   2. walk the central directory (entry signatures, counted
  *      entries, the walk must exactly tile [cdOff, cdOff+cdSize));
  *   3. per member, seek to its local header and decode.
  *
  * Validation is two-level, mirroring the WARC reader's contract
  * (Warc.scala): an archive whose INDEX is unusable (no EOCD, bad CD
  * signature, CD overrun, multi-disk, zip64 directory markers)
  * returns None — there is nothing safe to enumerate; a MEMBER that
  * fails (encryption flag, unknown method, zip64 size markers, local
  * header mismatch, data overrun, inflate failure, CRC-32 mismatch,
  * data-descriptor disagreement, undecodable name) is returned with
  * ok=false and COUNTED by the caller, never killing the job and
  * never silently vanishing.
  *
  * Deliberate profile boundaries (documented, counted, fail-closed):
  *   - methods 0 (stored) and 8 (deflate) only — together >99% of
  *     real archives; others are counted per member;
  *   - zip64 is rejected (directory markers → None, per-member size
  *     markers → member counted): 4 GiB+ members want a streaming
  *     read path, not a byte-array one;
  *   - member names decode as UTF-8 when general-purpose bit 11 is
  *     set, else ASCII-only (the cp437 high repertoire has no
  *     cross-validation oracle here; a high byte without bit 11 is a
  *     counted member malformation, not a silent mojibake).
  *
  * Cross-validated BOTH directions against the JDK's java.util.zip
  * in ZipSpec: our encoder's bytes read identically by
  * ZipInputStream, and ZipOutputStream's bytes (stored + deflated)
  * decode identically by this parser.
  *
  * Scale: one pass over the archive bytes per member plus the O(64K)
  * EOCD scan; decode is linear in member bytes via the hand-written
  * Inflate substrate. Used from mapPartitions — map-only, no state.
  */
object Zip {

  /** One central-directory member after decode. `data` is empty when
    * !ok. `method` is the CD's compression method (readable even for
    * malformed members — the index survives a corrupt body). */
  final case class ZipMember(name: String, method: Int, ok: Boolean,
                             data: Array[Byte])

  private def u16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def u32(p: Array[Byte], i: Int): Long =
    (u16(p, i) | (u16(p, i + 2).toLong << 16)) & 0xffffffffL

  private val EocdSig = 0x06054b50L
  private val CdSig = 0x02014b50L
  private val LocalSig = 0x04034b50L
  private val DdSig = 0x08074b50L

  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32
    c.update(b, 0, b.length)
    c.getValue
  }

  /** Decode a member name per the bit-11 contract above. */
  private def decodeName(b: Array[Byte], utf8Flag: Boolean): Option[String] =
    if (utf8Flag) Utf8.decodeStrict(b)
    else if (b.forall(x => (x & 0xff) < 0x80)) Some(new String(b, "US-ASCII"))
    else None

  /** Parse a ZIP archive. None = unusable index (archive-level
    * malformation); Some(members) enumerates the central directory in
    * order, each member decoded-or-counted per the class contract.
    * `maxMemberOut` bounds per-member allocation (the uncompressed
    * size field is attacker-controlled in a crawl). */
  def parseZip(p: Array[Byte],
               maxMemberOut: Int = 1 << 26): Option[Vector[ZipMember]] = {
    if (p.length < 22) return None
    // EOCD scan: fixed part is 22 bytes; the comment may be ≤65535.
    var eocd = -1
    var i = p.length - 22
    val lo = math.max(0, p.length - 22 - 0xffff)
    while (eocd < 0 && i >= lo) {
      if (u32(p, i) == EocdSig && u16(p, i + 20) == p.length - (i + 22))
        eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    val diskNum = u16(p, eocd + 4); val cdDisk = u16(p, eocd + 6)
    val nHere = u16(p, eocd + 8); val nTotal = u16(p, eocd + 10)
    val cdSize = u32(p, eocd + 12); val cdOff = u32(p, eocd + 16)
    if (diskNum != 0 || cdDisk != 0 || nHere != nTotal) return None
    // zip64 directory markers: the 32-bit fields saturate
    if (nTotal == 0xffff || cdSize == 0xffffffffL || cdOff == 0xffffffffL)
      return None
    if (cdOff + cdSize > eocd) return None
    val cdEnd = (cdOff + cdSize).toInt
    val out = Vector.newBuilder[ZipMember]
    var pos = cdOff.toInt
    var n = 0
    while (n < nTotal) {
      if (pos + 46 > cdEnd || u32(p, pos) != CdSig) return None
      val flag = u16(p, pos + 8); val method = u16(p, pos + 10)
      val crc = u32(p, pos + 16)
      val csize = u32(p, pos + 20); val usize = u32(p, pos + 24)
      val nameLen = u16(p, pos + 28); val extraLen = u16(p, pos + 30)
      val cmtLen = u16(p, pos + 32); val diskStart = u16(p, pos + 34)
      val localOff = u32(p, pos + 42)
      if (pos + 46 + nameLen + extraLen + cmtLen > cdEnd) return None
      val nameBytes = java.util.Arrays.copyOfRange(p, pos + 46, pos + 46 + nameLen)
      pos += 46 + nameLen + extraLen + cmtLen
      n += 1
      val name = decodeName(nameBytes, (flag & 0x800) != 0)
      val member: ZipMember = name match {
        case None => ZipMember("", method, ok = false, Array.emptyByteArray)
        case Some(nm) =>
          def bad = ZipMember(nm, method, ok = false, Array.emptyByteArray)
          if (diskStart != 0 || (flag & 0x1) != 0 ||
              (method != 0 && method != 8) ||
              csize == 0xffffffffL || usize == 0xffffffffL ||
              usize > maxMemberOut) bad
          else decodeMember(p, localOff, flag, method, crc, csize, usize,
            nameBytes, cdOff) match {
            case Some(data) => ZipMember(nm, method, ok = true, data)
            case None => bad
          }
      }
      out += member
    }
    if (pos != cdEnd) return None
    Some(out.result())
  }

  /** Decode one member's body from its local header. None = any
    * member-level malformation. */
  private def decodeMember(p: Array[Byte], localOff: Long, flag: Int,
                           method: Int, crc: Long, csize: Long, usize: Long,
                           nameBytes: Array[Byte], cdOff: Long): Option[Array[Byte]] = {
    if (localOff + 30 > cdOff) return None
    val lo = localOff.toInt
    if (u32(p, lo) != LocalSig) return None
    val lNameLen = u16(p, lo + 26); val lExtraLen = u16(p, lo + 28)
    val dataOff = lo + 30 + lNameLen + lExtraLen
    if (dataOff + csize > cdOff) return None
    // the local name must agree with the index (a desynced local
    // header means the offset is wrong — fail the member, not trust it)
    if (lNameLen != nameBytes.length) return None
    var k = 0
    while (k < lNameLen) {
      if (p(lo + 30 + k) != nameBytes(k)) return None
      k += 1
    }
    val hasDd = (flag & 0x8) != 0
    if (!hasDd) {
      // local sizes/CRC must agree with the CD copy
      if (u32(p, lo + 14) != crc || u32(p, lo + 18) != csize ||
          u32(p, lo + 22) != usize) return None
    } else {
      // streaming writer: local copies are zero, truth follows the
      // data in the descriptor (JDK and zip(1) both emit the sig form)
      val dd = dataOff + csize.toInt
      if (dd + 16 > cdOff) return None
      if (u32(p, dd) != DdSig || u32(p, dd + 4) != crc ||
          u32(p, dd + 8) != csize || u32(p, dd + 12) != usize) return None
    }
    val raw: Option[Array[Byte]] =
      if (method == 0) {
        if (csize != usize) None
        else Some(java.util.Arrays.copyOfRange(p, dataOff, dataOff + csize.toInt))
      } else {
        Inflate.inflate(p, dataOff, dataOff + csize.toInt, exactOut = usize.toInt)
          .flatMap { case (buf, next) =>
            // the deflate stream must consume exactly the compressed span
            if (next == dataOff + csize.toInt) Some(buf) else None
          }
      }
    raw.filter(crc32(_) == crc)
  }

  /** Fixture/encoder half: write a ZIP archive. `methods(j)` picks
    * per member — 0 stored, 1 deflate-fixed, 2 deflate-dynamic (the
    * latter two both wire method 8; the mode only varies the
    * substrate's block layout, exactly t25's rotation). `dd` writes
    * streaming members (zeroed local sizes + signed data descriptor —
    * deflate only; a stored streaming member is unreadable without
    * the index, which is why real streaming writers deflate).
    * `utf8Names` sets general-purpose bit 11. `extra` adds an opaque
    * extra field to local + central headers. `corrupt` perturbs that
    * member index's recorded CRC-32 (consistently in local header /
    * descriptor / central directory, so only the CRC-vs-data check
    * can catch it — the member-level malformation the intake must
    * count, deterministic for any body including an empty one). */
  def encodeZip(members: Seq[(String, Array[Byte])],
                methods: Int => Int,
                dd: Boolean = false,
                utf8Names: Boolean = false,
                extra: Option[Array[Byte]] = None,
                comment: Option[String] = None,
                corrupt: Int = -1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    val flagBase = (if (utf8Names) 0x800 else 0) | (if (dd) 0x8 else 0)
    val extraBytes = extra.map { pay =>
      val b = new Array[Byte](4 + pay.length)
      b(0) = 0x47; b(1) = 0x52 // an opaque private extra-field id
      b(2) = (pay.length & 0xff).toByte; b(3) = ((pay.length >> 8) & 0xff).toByte
      System.arraycopy(pay, 0, b, 4, pay.length)
      b
    }.getOrElse(Array.emptyByteArray)
    val entries = members.zipWithIndex.map { case ((name, raw), j) =>
      val mode = if (dd) 1 + (methods(j) % 2) else methods(j) // dd ⇒ deflate
      val method = if (mode == 0) 0 else 8
      val body =
        if (mode == 0) raw
        else if (mode == 1) Inflate.deflateFixed(raw)
        else Inflate.deflateDynamic(raw)
      val crc = if (j == corrupt) crc32(raw) ^ 0x5aL else crc32(raw)
      val nameB = name.getBytes("UTF-8")
      val localOff = out.size()
      w32(LocalSig); w16(20); w16(flagBase); w16(method)
      w16(0x7c21); w16(0x5a21) // fixed DOS mod time/date (deterministic)
      if (dd) { w32(0); w32(0); w32(0) }
      else { w32(crc); w32(body.length.toLong); w32(raw.length.toLong) }
      w16(nameB.length); w16(extraBytes.length)
      out.write(nameB); out.write(extraBytes)
      out.write(body)
      if (dd) { w32(DdSig); w32(crc); w32(body.length.toLong); w32(raw.length.toLong) }
      (nameB, method, crc, body.length.toLong, raw.length.toLong, localOff.toLong)
    }
    val cdOff = out.size()
    entries.foreach { case (nameB, method, crc, csize, usize, localOff) =>
      w32(CdSig); w16(20); w16(20); w16(flagBase); w16(method)
      w16(0x7c21); w16(0x5a21)
      w32(crc); w32(csize); w32(usize)
      w16(nameB.length); w16(extraBytes.length); w16(0) // no member comment
      w16(0); w16(0); w32(0) // disk start, internal attrs, external attrs
      w32(localOff)
      out.write(nameB); out.write(extraBytes)
    }
    val cdSize = out.size() - cdOff
    val cmtB = comment.map(_.getBytes("US-ASCII")).getOrElse(Array.emptyByteArray)
    w32(EocdSig); w16(0); w16(0)
    w16(entries.length); w16(entries.length)
    w32(cdSize.toLong); w32(cdOff.toLong)
    w16(cmtB.length); out.write(cmtB)
    out.toByteArray
  }
}
