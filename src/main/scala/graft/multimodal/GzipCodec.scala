package graft.multimodal

/** GZIP (RFC 1952) member framing over the from-spec DEFLATE pair
  * ([[InflateCodec]]/[[DeflateCodec]]). The unit is the MEMBER — a gzip
  * file is one or more members back to back, and the big-crawl formats
  * lean on that: Common Crawl's `.warc.gz` compresses EVERY record as
  * its own member so a reader can seek to a record offset and inflate
  * just that record. `members` is the strict whole-stream walk (every
  * header field validated, CRC-32 and ISIZE trailers verified against
  * the inflated output, reserved flag bits rejected, trailing garbage
  * rejected); `buildMember` is the deterministic encoder the fixtures
  * use (and `java.util.zip.GZIPInputStream` reads — the differential
  * spec's independent decoder).
  *
  * Total on arbitrary bytes: any malformation → None.
  */
object GzipCodec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  /** One validated member: where it sits, what it carried, what it
    * declared.
    */
  final case class Member(
      offset: Int,
      compressedBytes: Int, // whole member incl. header + trailer
      name: Option[String], // FNAME, if present
      mtime: Long,          // MTIME field (seconds, unsigned)
      payload: Array[Byte])

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Strict multi-member walk. `maxMemberOut` bounds each member's
    * inflated size (decompression-bomb guard — RFC 1952 carries no
    * in-band size before the data, so the caller states its bound).
    */
  def members(bytes: Array[Byte], maxMemberOut: Int): Option[Seq[Member]] =
    try {
      if (bytes.isEmpty) fail()
      val out = Seq.newBuilder[Member]
      var off = 0
      while (off < bytes.length) {
        val start = off
        if (off + 10 > bytes.length) fail()
        if ((bytes(off) & 0xFF) != 0x1F || (bytes(off + 1) & 0xFF) != 0x8B)
          fail()                                  // ID1 ID2
        if ((bytes(off + 2) & 0xFF) != 8) fail()  // CM: deflate only
        val flg = bytes(off + 3) & 0xFF
        if ((flg & 0xE0) != 0) fail()             // reserved bits (§2.3.1)
        val mtime = u32(bytes, off + 4)
        off += 10                                  // XFL + OS: informational
        if ((flg & 4) != 0) {                      // FEXTRA
          if (off + 2 > bytes.length) fail()
          val xlen = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
          off += 2 + xlen
          if (off > bytes.length) fail()
        }
        var name: Option[String] = None
        if ((flg & 8) != 0) {                      // FNAME, zero-terminated
          val end = bytes.indexOf(0.toByte, off)
          if (end < 0) fail()
          name = Some(new String(bytes, off, end - off,
            java.nio.charset.StandardCharsets.ISO_8859_1))
          off = end + 1
        }
        if ((flg & 16) != 0) {                     // FCOMMENT
          val end = bytes.indexOf(0.toByte, off)
          if (end < 0) fail()
          off = end + 1
        }
        if ((flg & 2) != 0) {                      // FHCRC: CRC-16 of header
          if (off + 2 > bytes.length) fail()
          val stored = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
          val calc = DeflateCodec.crc32Range(bytes, start, off - start) & 0xFFFF
          if (stored != calc) fail()
          off += 2
        }
        val (payload, end) =
          InflateCodec.inflateUnknown(bytes, off, maxMemberOut).getOrElse(fail())
        if (end + 8 > bytes.length) fail()
        if (u32(bytes, end) != (DeflateCodec.crc32(payload) & 0xFFFFFFFFL))
          fail()                                   // CRC32 trailer
        if (u32(bytes, end + 4) != (payload.length & 0xFFFFFFFFL))
          fail()                                   // ISIZE trailer
        off = end + 8
        out += Member(start, off - start, name, mtime, payload)
      }
      Some(out.result())
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  /** One deterministic member: fixed header (no FEXTRA/FHCRC/FCOMMENT;
    * FNAME iff `name` is set), [[DeflateCodec.deflate]] body, CRC-32 +
    * ISIZE trailer. OS byte 255 = unknown (§2.3.1).
    */
  def buildMember(payload: Array[Byte], name: Option[String] = None,
      mtime: Long = 0L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 32)
    out.write(0x1F); out.write(0x8B); out.write(8)
    out.write(if (name.isDefined) 8 else 0)
    var k = 0
    while (k < 4) { out.write(((mtime >> (8 * k)) & 0xFF).toInt); k += 1 }
    out.write(0); out.write(255)
    name.foreach { n =>
      out.write(n.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.write(0)
    }
    out.write(DeflateCodec.deflate(payload))
    val crc = DeflateCodec.crc32(payload)
    k = 0
    while (k < 4) { out.write((crc >> (8 * k)) & 0xFF); k += 1 }
    k = 0
    while (k < 4) { out.write((payload.length >> (8 * k)) & 0xFF); k += 1 }
    out.toByteArray
  }
}
