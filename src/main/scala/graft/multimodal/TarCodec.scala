package graft.multimodal

/** TAR (POSIX.1-1988 "ustar") archive walker implemented from the public
  * header layout: 512-byte header blocks (name[100] mode[8] uid[8]
  * gid[8] size[12] mtime[12] chksum[8] typeflag[1] linkname[100]
  * magic[6] version[2] uname[32] gname[32] devmajor[8] devminor[8]
  * prefix[155]), NUL/space-terminated octal numeric fields, data rounded
  * up to whole 512-byte blocks, and an end-of-archive marker of two
  * consecutive zero blocks. The checksum field is the unsigned byte sum
  * of the header with the checksum bytes themselves counted as spaces —
  * validated on every entry (it is the only integrity the format has).
  *
  * Scope: the ingest walk a crawl/dataset pipeline needs — enumerate
  * entries, slice payloads, catalog sizes/types. Strict and total:
  * any malformed header, bad checksum, truncated data, or missing
  * terminator → None.
  */
object TarCodec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  final case class Entry(
      name: String,
      size: Int,
      typeflag: Char, // '0' regular, '5' directory, ... (raw field)
      mtime: Long,
      dataOffset: Int)

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** NUL/space-terminated octal field (the ustar numeric encoding). */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = 0L
    var seen = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i)
      if (c < '0' || c > '7') fail()
      v = v * 8 + (c - '0')
      seen = true
      i += 1
    }
    if (!seen) fail()
    v
  }

  private def checksumOk(b: Array[Byte], off: Int): Boolean = {
    val stored = octal(b, off + 148, 8)
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else b(off + i) & 0xFF)
      i += 1
    }
    sum == stored
  }

  private def zeroBlock(b: Array[Byte], off: Int): Boolean = {
    if (off + 512 > b.length) return false
    var i = off
    while (i < off + 512) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Strict whole-archive walk: ustar magic + checksum on every header,
    * block-aligned data, terminated by two zero blocks (trailing zero
    * padding after them is accepted — tar writers pad to a blocking
    * factor).
    */
  def entries(bytes: Array[Byte]): Option[Seq[Entry]] =
    try {
      val out = Seq.newBuilder[Entry]
      var off = 0
      var terminated = false
      while (!terminated) {
        if (zeroBlock(bytes, off)) {
          if (!zeroBlock(bytes, off + 512)) fail()
          var t = off + 1024 // anything after the marker must be zeros
          while (t < bytes.length) { if (bytes(t) != 0) fail(); t += 1 }
          terminated = true
        } else {
          if (off + 512 > bytes.length) fail()
          if (str(bytes, off + 257, 6) != "ustar") fail()
          if (!checksumOk(bytes, off)) fail()
          val size = octal(bytes, off + 124, 12)
          if (size < 0 || size > Int.MaxValue - 1024) fail()
          val prefix = str(bytes, off + 345, 155)
          val base = str(bytes, off, 100)
          val name = if (prefix.isEmpty) base else prefix + "/" + base
          out += Entry(name, size.toInt, (bytes(off + 156) & 0xFF).toChar,
            octal(bytes, off + 136, 12), off + 512)
          val dataBlocks = ((size + 511) / 512).toInt
          off += 512 + dataBlocks * 512
          if (off > bytes.length) fail() // truncated data
        }
      }
      Some(out.result())
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException => None
    }

  /** Slice an entry's payload. */
  def payload(bytes: Array[Byte], e: Entry): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, e.dataOffset, e.dataOffset + e.size)

  /** Deterministic builder: regular-file entries, octal fields
    * zero-padded the way every tar writer emits them, correct checksum,
    * two-zero-block terminator.
    */
  def build(files: Seq[(String, Array[Byte])], mtime: Long = 0L): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def oct(v: Long, len: Int): Array[Byte] = {
      val s = java.lang.Long.toOctalString(v)
      val pad = "0" * (len - 1 - s.length) + s
      (pad + "\u0000").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    files.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      require(nb.length <= 100, "fixture names fit the base field")
      System.arraycopy(nb, 0, h, 0, nb.length)
      System.arraycopy(oct(420 /* 0644 */, 8), 0, h, 100, 8)
      System.arraycopy(oct(0, 8), 0, h, 108, 8)
      System.arraycopy(oct(0, 8), 0, h, 116, 8)
      System.arraycopy(oct(data.length.toLong, 12), 0, h, 124, 12)
      System.arraycopy(oct(mtime, 12), 0, h, 136, 12)
      h(156) = '0'
      System.arraycopy("ustar\u000000".getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1), 0, h, 257, 8)
      // checksum: spaces while summing, then octal + NUL + space
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      h.foreach(b => sum += (b & 0xFF))
      val cs = java.lang.Long.toOctalString(sum)
      val csb = ("0" * (6 - cs.length) + cs + "\u0000 ").getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)
      System.arraycopy(csb, 0, h, 148, 8)
      out.write(h)
      out.write(data)
      val rem = data.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }
}
