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

  /** Streamed-entry metadata: `size` is Long because the streaming walk
    * has no array bound — a ustar 12-digit octal size field reaches
    * 8 GiB − 1, and nothing here materializes the payload.
    */
  final case class StreamEntry(
      name: String,
      size: Long,
      typeflag: Char,
      mtime: Long)

  private def readFully(in: java.io.InputStream, b: Array[Byte]): Boolean = {
    var got = 0
    while (got < b.length) {
      val n = in.read(b, got, b.length - got)
      if (n < 0) return false
      got += n
    }
    true
  }

  private def skipFully(in: java.io.InputStream, n0: Long): Unit = {
    var n = n0
    val scratch = new Array[Byte](8192)
    while (n > 0) {
      val got = in.read(scratch, 0, math.min(n, scratch.length.toLong).toInt)
      if (got < 0) fail()
      n -= got
    }
  }

  /** Length-bounded payload view handed to the walk callback; valid
    * only during the call. A truncated archive surfaces as EOFException
    * (→ the walk's None), never as a silent short read.
    */
  private final class LimitStream(inner: java.io.InputStream,
      private var remaining: Long) extends java.io.InputStream {
    def left: Long = remaining
    override def read(): Int =
      if (remaining <= 0) -1
      else {
        val b = inner.read()
        if (b < 0) throw new java.io.EOFException("truncated tar data")
        remaining -= 1
        b
      }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      if (remaining <= 0) return -1
      val n = inner.read(b, off, math.min(len.toLong, remaining).toInt)
      if (n < 0) throw new java.io.EOFException("truncated tar data")
      remaining -= n
      n
    }
  }

  /** Streaming walk — the bounded-memory twin of [[entries]] for
    * archives bigger than a JVM array (the 10–100 GiB dataset-tarball
    * unit of a web-scale ingest; round-11 re-plumb). Reads strictly
    * forward in 512-byte blocks; per entry, `f` receives the metadata
    * and a length-bounded InputStream over the payload (valid only
    * during the call — unread bytes are skipped afterwards, so `f` can
    * catalog without touching data). Identical strictness to
    * [[entries]]: ustar magic + checksum on every header, block-aligned
    * data, two-zero-block terminator, all-zero tail to EOF; StreamingTarSpec
    * pins walk ≡ entries on the same bytes. Any malformation (or an
    * underlying I/O failure) → None.
    */
  def walk[A](in0: java.io.InputStream)(
      f: (StreamEntry, java.io.InputStream) => A): Option[Seq[A]] =
    try {
      val in = new java.io.BufferedInputStream(in0, 65536)
      val out = Seq.newBuilder[A]
      val h = new Array[Byte](512)
      var terminated = false
      while (!terminated) {
        if (!readFully(in, h)) fail() // EOF before the terminator
        if (zeroBlock(h, 0)) {
          if (!readFully(in, h) || !zeroBlock(h, 0)) fail()
          // anything after the marker must be zeros (blocking-factor pad)
          var b = in.read()
          while (b == 0) b = in.read()
          if (b >= 0) fail()
          terminated = true
        } else {
          if (str(h, 257, 6) != "ustar") fail()
          if (!checksumOk(h, 0)) fail()
          val size = octal(h, 124, 12)
          if (size < 0) fail()
          val prefix = str(h, 345, 155)
          val base = str(h, 0, 100)
          val name = if (prefix.isEmpty) base else prefix + "/" + base
          val body = new LimitStream(in, size)
          out += f(StreamEntry(name, size, (h(156) & 0xFF).toChar,
            octal(h, 136, 12)), body)
          skipFully(in, body.left)                  // unread payload
          skipFully(in, (512 - size % 512) % 512)   // block padding
        }
      }
      Some(out.result())
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
          _: java.io.IOException => None
    }

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
