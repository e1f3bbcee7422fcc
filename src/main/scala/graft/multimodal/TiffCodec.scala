package graft.multimodal

import graft.images.ImageOps.Image

/** Pure-JVM TIFF codec from the public TIFF 6.0 specification (Adobe,
  * 1992): 8-byte header in either byte order (`II*\0` / `MM\0*`), first
  * IFD, baseline tag set, strip-organized image data, and the three
  * baseline compressions — none (1), LZW (5, §13: MSB-first bit packing,
  * 9→12-bit codes with EARLY code-width change, Clear/EOI), and PackBits
  * (32773, §9). Pixel shapes: 8-bit grayscale (photometric 0/1 — §4's
  * WhiteIsZero inverts), 8-bit palette (photometric 3, 16-bit ColorMap
  * reduced by high byte), and 8×3 RGB (photometric 2), chunky planar,
  * with the horizontal-differencing predictor (tag 317 = 2, §14) in both
  * directions. The writer emits a deterministic subset (sorted IFD at the
  * end, strip data first, arrays between) so fixture trees are pinnable
  * by `read_blob` byte identity. TOTAL on arbitrary bytes.
  *
  * The engine treats TIFF like PNG/BMP/GIF/QOI: decode from spec here,
  * ImageIO only for the exotic residue (tiles, 16-bit, deflate, YCbCr).
  * Reference counterpart: the reference decodes images only via cv2/JPEG
  * (pyspark_dominant.py:35); TIFF support exceeds its surface.
  */
object TiffCodec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  def decode(bytes: Array[Byte]): Option[Image] =
    try Some(decodeOrThrow(bytes))
    catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }

  // -------------------------------------------------------------------
  // Byte-order-aware primitive reads
  // -------------------------------------------------------------------

  private final class Reader(b: Array[Byte], le: Boolean) {
    def u8(i: Int): Int = {
      if (i < 0 || i >= b.length) fail(); b(i) & 0xFF
    }
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) u16(i).toLong | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2).toLong
    def len: Int = b.length
    def raw: Array[Byte] = b
  }

  /** One IFD entry's values as longs (SHORT and LONG types only — the
    * baseline tags this codec reads never need RATIONAL).
    */
  private def entryValues(r: Reader, entryOff: Int): Array[Long] = {
    val typ = r.u16(entryOff + 2)
    val count = r.u32(entryOff + 4)
    if (count < 0 || count > 65536) fail()
    val n = count.toInt
    val width = typ match {
      case 3 => 2 // SHORT
      case 4 => 4 // LONG
      case 1 => 1 // BYTE
      case _ => fail()
    }
    val inline = width * n <= 4
    val base =
      if (inline) entryOff + 8
      else {
        val off = r.u32(entryOff + 8)
        if (off < 0 || off + width.toLong * n > r.len) fail()
        off.toInt
      }
    Array.tabulate(n) { i =>
      width match {
        case 1 => r.u8(base + i).toLong
        case 2 => r.u16(base + 2 * i).toLong
        case 4 => r.u32(base + 4 * i)
      }
    }
  }

  private def decodeOrThrow(b: Array[Byte]): Image = {
    if (b.length < 8) fail()
    val le =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else fail()
    val r = new Reader(b, le)
    if (r.u16(2) != 42) fail()
    val ifd = r.u32(4)
    if (ifd < 8 || ifd + 2 > r.len) fail()
    val nEntries = r.u16(ifd.toInt)
    if (nEntries == 0 || ifd + 2 + 12L * nEntries > r.len) fail()

    val tags = scala.collection.mutable.Map.empty[Int, Array[Long]]
    var e = 0
    while (e < nEntries) {
      val off = ifd.toInt + 2 + 12 * e
      val tag = r.u16(off)
      tag match {
        case 256 | 257 | 258 | 259 | 262 | 273 | 277 | 278 | 279 | 284 |
            317 | 320 =>
          tags(tag) = entryValues(r, off)
        case _ => // unknown/irrelevant tags are skipped per spec
      }
      e += 1
    }
    def one(tag: Int, default: Long = -1L): Long =
      tags.get(tag).map { v => if (v.isEmpty) fail(); v(0) }
        .getOrElse { if (default < 0) fail(); default }

    val w = one(256).toInt
    val h = one(257).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > 100000000L) fail()
    val compression = one(259, default = 1L).toInt
    val photometric = one(262).toInt
    val spp = one(277, default = 1L).toInt
    val predictor = one(317, default = 1L).toInt
    val rowsPerStrip = one(278, default = 0xFFFFFFFFL) min h.toLong
    if (one(284, default = 1L) != 1L) fail() // chunky only
    val bps = tags.getOrElse(258, Array(1L))
    val supported = photometric match {
      case 0 | 1 => spp == 1 && bps.sameElements(Array(8L))
      case 2 => spp == 3 && bps.sameElements(Array(8L, 8L, 8L))
      case 3 => spp == 1 && bps.sameElements(Array(8L)) && tags.contains(320)
      case _ => false
    }
    if (!supported) fail()
    if (predictor != 1 && predictor != 2) fail()

    val offs = tags.getOrElse(273, fail())
    val counts = tags.getOrElse(279, fail())
    if (offs.length != counts.length || offs.isEmpty) fail()
    val nStrips = ((h + rowsPerStrip - 1) / rowsPerStrip).toInt
    if (offs.length != nStrips) fail()

    val rowBytes = w * spp
    val out = new Array[Byte](rowBytes * h)
    var strip = 0
    var rowBase = 0
    while (strip < nStrips) {
      val rows = math.min(rowsPerStrip, h - rowBase.toLong).toInt
      val so = offs(strip); val sc = counts(strip)
      if (so < 0 || sc < 0 || so + sc > r.len) fail()
      val compressed = java.util.Arrays.copyOfRange(b, so.toInt, (so + sc).toInt)
      val data = compression match {
        case 1 => compressed
        case 5 => lzwDecode(compressed, rowBytes * rows)
        case 32773 => packBitsDecode(compressed, rowBytes * rows)
        case _ => fail()
      }
      if (data.length != rowBytes * rows) fail()
      System.arraycopy(data, 0, out, rowBase * rowBytes, data.length)
      rowBase += rows
      strip += 1
    }

    if (predictor == 2) {
      var y = 0
      while (y < h) {
        var i = y * rowBytes + spp
        val end = (y + 1) * rowBytes
        while (i < end) { out(i) = (out(i) + out(i - spp)).toByte; i += 1 }
        y += 1
      }
    }

    val px = new Array[Int](w * h)
    photometric match {
      case 0 | 1 =>
        var i = 0
        while (i < w * h) {
          val v0 = out(i) & 0xFF
          val v = if (photometric == 0) 255 - v0 else v0
          px(i) = (v << 16) | (v << 8) | v
          i += 1
        }
      case 2 =>
        var i = 0
        while (i < w * h) {
          px(i) = ((out(3 * i) & 0xFF) << 16) | ((out(3 * i + 1) & 0xFF) << 8) |
            (out(3 * i + 2) & 0xFF)
          i += 1
        }
      case 3 =>
        val cm = tags(320)
        if (cm.length != 3 * 256) fail()
        var i = 0
        while (i < w * h) {
          val j = out(i) & 0xFF
          // 16-bit ColorMap values reduce by high byte (the inverse of the
          // v*257 spread every writer uses)
          px(i) = (((cm(j) >> 8) & 0xFF) << 16).toInt |
            (((cm(256 + j) >> 8) & 0xFF) << 8).toInt |
            ((cm(512 + j) >> 8) & 0xFF).toInt
          i += 1
        }
    }
    Image(w, h, px)
  }

  // -------------------------------------------------------------------
  // PackBits (§9)
  // -------------------------------------------------------------------

  private[multimodal] def packBitsDecode(in: Array[Byte], expect: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(expect)
    var i = 0
    while (i < in.length && out.size < expect) {
      val n = in(i); i += 1
      if (n >= 0) { // literal run of n+1
        if (i + n + 1 > in.length) fail()
        out.write(in, i, n + 1); i += n + 1
      } else if (n != -128) { // repeat next byte 1-n times
        if (i >= in.length) fail()
        val v = in(i); i += 1
        var k = 1 - n
        while (k > 0) { out.write(v); k -= 1 }
      } // -128: no-op per spec
    }
    if (out.size != expect) fail()
    out.toByteArray
  }

  private[multimodal] def packBitsEncode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length + 16)
    var i = 0
    while (i < in.length) {
      // find run length at i
      var run = 1
      while (i + run < in.length && run < 128 && in(i + run) == in(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(in(i))
        i += run
      } else {
        // literal until the next run of >= 3 (2-byte runs inside literals
        // stay literal — the canonical packing) or 128 bytes
        var j = i + 1
        var lit = 1
        var break = false
        while (!break && j < in.length && lit < 128) {
          var r2 = 1
          while (j + r2 < in.length && r2 < 3 && in(j + r2) == in(j)) r2 += 1
          if (r2 >= 3) break = true
          else { j += 1; lit += 1 }
        }
        out.write(lit - 1)
        out.write(in, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // TIFF LZW (§13): MSB-first bits, 9→12-bit codes, EARLY change
  // -------------------------------------------------------------------

  private val ClearCode = 256
  private val EoiCode = 257

  private[multimodal] def lzwDecode(in: Array[Byte], expect: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(expect)
    // table as (prefix code, suffix byte) chains
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = 258
    var width = 9
    var bitPos = 0
    def readCode(): Int = {
      if (bitPos + width > in.length * 8) EoiCode // ran off the end: treat as EOI
      else {
        var v = 0
        var got = 0
        while (got < width) {
          val byte = in(bitPos >> 3) & 0xFF
          val avail = 8 - (bitPos & 7)
          val take = math.min(avail, width - got)
          v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
          bitPos += take
          got += take
        }
        v
      }
    }
    def emit(code: Int): Unit = {
      // walk the chain backwards into a small stack
      var stack = List.empty[Byte]
      var c = code
      while (c >= 258) { stack = suffix(c) :: stack; c = prefix(c) }
      out.write(c)
      stack.foreach(out.write(_))
    }
    var old = -1
    var done = false
    while (!done && out.size < expect) {
      val code = readCode()
      if (code == EoiCode) done = true
      else if (code == ClearCode) { next = 258; width = 9; old = -1 }
      else {
        if (old < 0) {
          if (code > 255) fail() // first code after clear must be literal
          out.write(code)
        } else if (code < next) {
          emit(code)
        } else if (code == next) {
          // cScSc corner: old's string + its own first byte
          emit(old)
          out.write(firstByte(prefix, suffix, old))
        } else fail()
        if (old >= 0 && next < 4096) {
          prefix(next) = old
          // the new entry's suffix is the first byte of the string just
          // written — for the cScSc corner that string starts with old's
          // first byte (the entry for `code` itself doesn't exist yet)
          suffix(next) =
            if (code < next) firstByte(prefix, suffix, code)
            else firstByte(prefix, suffix, old)
          next += 1
        }
        if (next == (1 << width) - 1 && width < 12) width += 1 // EARLY change
        old = code
      }
    }
    if (out.size != expect) fail()
    out.toByteArray
  }

  private def firstByte(prefix: Array[Int], suffix: Array[Byte], code: Int): Byte = {
    var c = code
    while (c >= 258) c = prefix(c)
    c.toByte
  }

  private[multimodal] def lzwEncode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xFF).toInt)
        bitCnt -= 8
      }
    }
    // (prefixCode << 8 | byte) -> code
    var table = scala.collection.mutable.HashMap.empty[Int, Int]
    var next = 258
    put(ClearCode)
    var omega = -1 // current prefix code; -1 = empty
    var i = 0
    while (i < in.length) {
      val k = in(i) & 0xFF
      if (omega < 0) omega = k
      else {
        val key = (omega << 8) | k
        table.get(key) match {
          case Some(c) => omega = c
          case None =>
            put(omega)
            table(key) = next
            next += 1
            // EARLY change, encoder side: the decoder lags the encoder's
            // table by exactly one entry (it adds on RECEIPT of the next
            // code), so the encoder widens one count later than the naive
            // mirror — at next == 2^w, which is the instant the decoder's
            // own count hits 2^w - 1. Pinned empirically against the JDK
            // ImageIO TIFF plugin in both directions (TiffCodecSpec).
            if (next == (1 << width) && width < 12) width += 1
            if (next == 4094) { // table nearly full: flush + reset (§13)
              put(ClearCode)
              table = scala.collection.mutable.HashMap.empty[Int, Int]
              next = 258
              width = 9
            }
            omega = k
        }
      }
      i += 1
    }
    if (omega >= 0) put(omega)
    put(EoiCode)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Writer: deterministic baseline TIFF (strip data, arrays, sorted IFD)
  // -------------------------------------------------------------------

  /** Compression selector for [[encode]]: 1 = none, 5 = LZW,
    * 32773 = PackBits.
    */
  final case class Layout(compression: Int = 1, predictor: Int = 1,
      bigEndian: Boolean = false, rowsPerStrip: Int = 4)

  /** Encode RGB pixels (photometric 2). */
  def encodeRgb(img: Image, layout: Layout = Layout()): Array[Byte] = {
    val rows = Array.tabulate(img.height) { y =>
      val row = new Array[Byte](img.width * 3)
      var x = 0
      while (x < img.width) {
        val p = img.pixels(y * img.width + x)
        row(3 * x) = ((p >> 16) & 0xFF).toByte
        row(3 * x + 1) = ((p >> 8) & 0xFF).toByte
        row(3 * x + 2) = (p & 0xFF).toByte
        x += 1
      }
      row
    }
    write(img.width, img.height, 3, photometric = 2, rows, layout, None)
  }

  /** Encode 8-bit grayscale (photometric 1, BlackIsZero). */
  def encodeGray(width: Int, height: Int, values: Array[Byte],
      layout: Layout = Layout()): Array[Byte] = {
    require(values.length == width * height)
    val rows = Array.tabulate(height)(y =>
      java.util.Arrays.copyOfRange(values, y * width, (y + 1) * width))
    write(width, height, 1, photometric = 1, rows, layout, None)
  }

  /** Encode 8-bit palette indices (photometric 3); `palette` is 256 packed
    * 0xRRGGBB entries, spread to 16-bit ColorMap values by v*257.
    */
  def encodePalette(width: Int, height: Int, indices: Array[Byte],
      palette: Array[Int], layout: Layout = Layout()): Array[Byte] = {
    require(indices.length == width * height && palette.length == 256)
    val rows = Array.tabulate(height)(y =>
      java.util.Arrays.copyOfRange(indices, y * width, (y + 1) * width))
    write(width, height, 1, photometric = 3, rows, layout, Some(palette))
  }

  private def write(w: Int, h: Int, spp: Int, photometric: Int,
      rows: Array[Array[Byte]], layout: Layout,
      palette: Option[Array[Int]]): Array[Byte] = {
    val le = !layout.bigEndian
    val rps = math.max(1, layout.rowsPerStrip)
    val nStrips = (h + rps - 1) / rps

    // per-strip payloads (predictor then compression)
    val strips = Array.tabulate(nStrips) { s =>
      val r0 = s * rps
      val r1 = math.min(h, r0 + rps)
      val raw = new java.io.ByteArrayOutputStream((r1 - r0) * w * spp)
      var y = r0
      while (y < r1) {
        val row =
          if (layout.predictor == 2) {
            val d = rows(y).clone()
            var i = d.length - 1
            while (i >= spp) { d(i) = (d(i) - d(i - spp)).toByte; i -= 1 }
            d
          } else rows(y)
        raw.write(row)
        y += 1
      }
      layout.compression match {
        case 1 => raw.toByteArray
        case 5 => lzwEncode(raw.toByteArray)
        case 32773 => packBitsEncode(raw.toByteArray)
        case c => throw new IllegalArgumentException(s"compression $c")
      }
    }

    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      else { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (le) { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
      else { w16(((v >> 16) & 0xFFFF).toInt); w16((v & 0xFFFF).toInt) }

    // header
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    w16(42); w32(0) // IFD offset patched below

    // strip data
    val stripOffs = new Array[Long](nStrips)
    var s = 0
    while (s < nStrips) {
      stripOffs(s) = out.size
      out.write(strips(s))
      s += 1
    }
    if (out.size % 2 == 1) out.write(0) // word-align per spec

    // out-of-line arrays
    val bpsOff = out.size
    if (spp == 3) { w16(8); w16(8); w16(8) }
    val soOff = out.size
    stripOffs.foreach(w32)
    val scOff = out.size
    strips.foreach(st => w32(st.length))
    val cmOff = out.size
    palette.foreach { pal =>
      for (shift <- Seq(16, 8, 0); j <- 0 until 256)
        w16(((pal(j) >> shift) & 0xFF) * 257)
    }

    // IFD (entries sorted by tag, per spec)
    case class Entry(tag: Int, typ: Int, count: Int, value: Long,
        inlineShort: Boolean = false)
    val entries = Seq.newBuilder[Entry]
    entries += Entry(256, 3, 1, w, inlineShort = true)
    entries += Entry(257, 3, 1, h, inlineShort = true)
    entries += (if (spp == 3) Entry(258, 3, 3, bpsOff)
                else Entry(258, 3, 1, 8, inlineShort = true))
    entries += Entry(259, 3, 1, layout.compression, inlineShort = true)
    entries += Entry(262, 3, 1, photometric, inlineShort = true)
    // count-1 LONG values are INLINE per spec (left-justified value field),
    // so a single-strip file stores the offset/count itself, not a pointer
    entries += (if (nStrips == 1) Entry(273, 4, 1, stripOffs(0))
                else Entry(273, 4, nStrips, soOff))
    entries += Entry(277, 3, 1, spp, inlineShort = true)
    entries += Entry(278, 3, 1, rps, inlineShort = true)
    entries += (if (nStrips == 1) Entry(279, 4, 1, strips(0).length)
                else Entry(279, 4, nStrips, scOff))
    entries += Entry(284, 3, 1, 1, inlineShort = true)
    if (layout.predictor == 2)
      entries += Entry(317, 3, 1, 2, inlineShort = true)
    palette.foreach(_ => entries += Entry(320, 3, 3 * 256, cmOff))
    val es = entries.result().sortBy(_.tag)

    val ifdOff = out.size
    w16(es.length)
    es.foreach { en =>
      w16(en.tag); w16(en.typ); w32(en.count)
      if (en.inlineShort) { w16(en.value.toInt); w16(0) }
      else w32(en.value)
    }
    w32(0) // no next IFD

    // patch the IFD offset in the header
    val bytes = out.toByteArray
    val io = ifdOff
    if (le) {
      bytes(4) = (io & 0xFF).toByte; bytes(5) = ((io >> 8) & 0xFF).toByte
      bytes(6) = ((io >> 16) & 0xFF).toByte; bytes(7) = ((io >> 24) & 0xFF).toByte
    } else {
      bytes(4) = ((io >> 24) & 0xFF).toByte; bytes(5) = ((io >> 16) & 0xFF).toByte
      bytes(6) = ((io >> 8) & 0xFF).toByte; bytes(7) = (io & 0xFF).toByte
    }
    bytes
  }
}
