package graft.sources

/** Strict UTF-8 decoding for the intake paths (t26/t28/t30 and their
  * streaming twins). `new String(b, "UTF-8")` silently substitutes
  * U+FFFD for every invalid sequence — real crawls carry invalid
  * UTF-8 on every shard, and the repo's accounting discipline is
  * "counted, never silently wrong": an invalid byte sequence must
  * surface as a counted malformation, not mutate into a replacement
  * character that flows through gates and hashes as if it were data.
  *
  * [[decodeStrict]] returns None on ANY invalid input — truncated
  * multi-byte sequences, stray continuation bytes, overlong
  * encodings, surrogate code points (U+D800–U+DFFF), values past
  * U+10FFFF — via the JDK CharsetDecoder in REPORT mode (the same
  * class of substrate as java.util.zip.CRC32: a deterministic,
  * everywhere-identical primitive, not a parsing framework).
  */
object Utf8 {

  def decodeStrict(b: Array[Byte]): Option[String] =
    decodeStrict(b, 0, b.length)

  def decodeStrict(b: Array[Byte], off: Int, len: Int): Option[String] = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(b, off, len)).toString)
    catch {
      case _: java.nio.charset.CharacterCodingException => None
      case _: IndexOutOfBoundsException => None
    }
  }
}
