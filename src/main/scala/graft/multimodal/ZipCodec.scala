package graft.multimodal

/** ZIP archive walker implemented from the public PKWARE APPNOTE layout:
  * locate the end-of-central-directory record (sig 0x06054b50, scanned
  * back through the ≤64 KiB comment tail), walk the central directory
  * (sig 0x02014b50 — the authoritative catalog: name, method, CRC-32,
  * sizes, local-header offset), then validate each member against its
  * local file header (sig 0x04034b50) and inflate/slice its data.
  * Methods: 0 (stored) and 8 (DEFLATE via the from-spec
  * [[InflateCodec]]); every member's CRC-32 is recomputed over the
  * extracted payload and checked against the directory. Flag bit 3
  * (data descriptor — what `java.util.zip.ZipOutputStream` emits for
  * DEFLATED entries) is supported by trusting the central directory's
  * sizes and verifying the descriptor copy after the data, so the walker
  * reads real-world streamed zips, not just its own output.
  *
  * Strict and total: any malformation (bad signature, central/local
  * disagreement, CRC mismatch, method we cannot verify, multi-disk,
  * overlapping garbage) → None.
  */
object ZipCodec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  final case class Entry(
      name: String,
      method: Int,          // 0 stored, 8 deflate
      crc32: Long,
      compressedSize: Int,
      uncompressedSize: Int,
      payload: Array[Byte])

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Strict whole-archive walk via the central directory. */
  def entries(bytes: Array[Byte]): Option[Seq[Entry]] =
    try {
      // EOCD: fixed 22 bytes + comment; scan back for the signature
      var eocd = -1
      var i = bytes.length - 22
      val stop = math.max(0, bytes.length - 22 - 65535)
      while (eocd < 0 && i >= stop) {
        if (u32(bytes, i) == 0x06054b50L &&
            i + 22 + u16(bytes, i + 20) == bytes.length) eocd = i
        else i -= 1
      }
      if (eocd < 0) fail()
      if (u16(bytes, eocd + 4) != 0 || u16(bytes, eocd + 6) != 0) fail() // multi-disk
      val n = u16(bytes, eocd + 10)
      if (u16(bytes, eocd + 8) != n) fail()
      val cdSize = u32(bytes, eocd + 12)
      val cdOff = u32(bytes, eocd + 16)
      if (cdOff + cdSize != eocd) fail()
      val out = Seq.newBuilder[Entry]
      var off = cdOff.toInt
      var k = 0
      while (k < n) {
        if (u32(bytes, off) != 0x02014b50L) fail()
        val flags = u16(bytes, off + 8)
        val method = u16(bytes, off + 10)
        val crc = u32(bytes, off + 16)
        val csize = u32(bytes, off + 20)
        val usize = u32(bytes, off + 24)
        val nameLen = u16(bytes, off + 28)
        val extraLen = u16(bytes, off + 30)
        val commentLen = u16(bytes, off + 32)
        val localOff = u32(bytes, off + 42).toInt
        val name = new String(bytes, off + 46, nameLen,
          java.nio.charset.StandardCharsets.UTF_8)
        if (csize > Int.MaxValue - 64 || usize > Int.MaxValue - 64) fail()
        if ((flags & 1) != 0) fail() // encrypted
        // local header: sig + the fields that must agree with the
        // directory (name, method); sizes/CRC may be zero there when
        // flag bit 3 deferred them to the data descriptor
        if (u32(bytes, localOff) != 0x04034b50L) fail()
        if (u16(bytes, localOff + 8) != method) fail()
        val lNameLen = u16(bytes, localOff + 26)
        val lExtraLen = u16(bytes, localOff + 28)
        if (new String(bytes, localOff + 30, lNameLen,
          java.nio.charset.StandardCharsets.UTF_8) != name) fail()
        val dataOff = localOff + 30 + lNameLen + lExtraLen
        val hasDescriptor = (flags & 8) != 0
        if (!hasDescriptor) {
          if (u32(bytes, localOff + 14) != crc ||
            u32(bytes, localOff + 18) != csize ||
            u32(bytes, localOff + 22) != usize) fail()
        }
        if (dataOff + csize > bytes.length) fail()
        val payload = method match {
          case 0 =>
            if (csize != usize) fail()
            java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + usize.toInt)
          case 8 =>
            val p = InflateCodec.inflate(bytes, dataOff, usize.toInt)
              .getOrElse(fail())
            p
          case _ => fail() // methods we cannot verify end-to-end
        }
        if ((DeflateCodec.crc32(payload) & 0xFFFFFFFFL) != crc) fail()
        if (hasDescriptor) {
          // optional-signature descriptor after the data: crc,csize,usize
          var d = dataOff + csize.toInt
          if (u32(bytes, d) == 0x08074b50L) d += 4
          if (u32(bytes, d) != crc || u32(bytes, d + 4) != csize ||
            u32(bytes, d + 8) != usize) fail()
        }
        out += Entry(name, method, crc, csize.toInt, usize.toInt, payload)
        off += 46 + nameLen + extraLen + commentLen
        k += 1
      }
      if (off != eocd) fail() // directory must tile exactly to the EOCD
      Some(out.result())
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  /** Deterministic builder: full local headers (no data descriptors),
    * stored or DEFLATE per entry, one central directory, one EOCD.
    * `java.util.zip.ZipInputStream` reads the output — the differential
    * spec's independent decoder.
    */
  def build(files: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      var k = 0
      while (k < 4) { out.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
    }
    val central = files.map { case (name, data, deflated) =>
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val body = if (deflated) DeflateCodec.deflate(data) else data
      val crc = DeflateCodec.crc32(data) & 0xFFFFFFFFL
      val localOff = out.size()
      w32(0x04034b50L); w16(20); w16(0); w16(if (deflated) 8 else 0)
      w16(0); w16(0) // mod time/date: fixed zero (deterministic fixtures)
      w32(crc); w32(body.length.toLong); w32(data.length.toLong)
      w16(nb.length); w16(0)
      out.write(nb); out.write(body)
      (nb, deflated, crc, body.length, data.length, localOff)
    }
    val cdOff = out.size()
    central.foreach { case (nb, deflated, crc, csize, usize, localOff) =>
      w32(0x02014b50L); w16(20); w16(20); w16(0); w16(if (deflated) 8 else 0)
      w16(0); w16(0)
      w32(crc); w32(csize.toLong); w32(usize.toLong)
      w16(nb.length); w16(0); w16(0); w16(0); w16(0); w32(0L)
      w32(localOff.toLong)
      out.write(nb)
    }
    val cdSize = out.size() - cdOff
    w32(0x06054b50L); w16(0); w16(0); w16(files.length); w16(files.length)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    out.toByteArray
  }
}
