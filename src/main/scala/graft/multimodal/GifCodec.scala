package graft.multimodal

import graft.images.ImageOps.Image
import scala.collection.mutable.ArrayBuffer

/** Pure-JVM GIF codec implemented from the PUBLIC GIF89a specification:
  * header + logical screen descriptor, global/local color tables,
  * graphic-control extensions (disposal, transparency), image
  * descriptors with the four-pass interlace order, and the GIF variant
  * of LZW (variable code width LSB-first, clear/EOI codes, 4096-entry
  * dictionary) — the remaining ImageIO image format after PNG
  * ([[PngCodec]]) and QOI ([[QoiCodec]]), and a second compression
  * family (dictionary LZW next to DEFLATE's LZ77+Huffman). Frames
  * compose onto the canvas per the spec's disposal methods (none/keep,
  * restore-background, restore-previous) with transparency holes
  * inheriting the composed canvas, so ANIMATED GIFs decode to full
  * frames — the third "video-ish" carriage next to AVI and Matroska.
  *
  * The encoder is a deterministic subset for fixtures: one global
  * 256-entry color table, full-canvas frames, real LZW compression
  * (dictionary reset on overflow), interlace on odd frames so both
  * row orders are always exercised. Decoder is TOTAL on arbitrary
  * bytes — the same contract as every codec here.
  */
object GifCodec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  // ----------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): Option[Seq[Image]] =
    try Some(decodeOrThrow(bytes))
    catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }

  /** First frame only — the image-tier view of a (possibly animated) GIF. */
  def decodeFirst(bytes: Array[Byte]): Option[Image] =
    decode(bytes).flatMap(_.headOption)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  private def decodeOrThrow(b: Array[Byte]): Seq[Image] = {
    if (b.length < 13) fail()
    val hdr = new String(b, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") fail()
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > 100000000L) fail()
    val flags = u8(b, 10)
    var pos = 13
    var gct: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 0x07)
      gct = readColorTable(b, pos, n)
      pos += 3 * n
    }

    val frames = new ArrayBuffer[Image]()
    val canvas = new Array[Int](w * h) // starts black (opaque composition)
    var disposal = 0
    var transparent = -1
    var done = false
    while (!done) {
      if (pos >= b.length) fail()
      u8(b, pos) match {
        case 0x3B => done = true
        case 0x21 => // extension: label + sub-blocks
          if (pos + 2 > b.length) fail()
          val label = u8(b, pos + 1)
          pos += 2
          if (label == 0xF9) { // graphic control
            if (pos + 1 > b.length || u8(b, pos) != 4) fail()
            val packed = u8(b, pos + 1)
            disposal = (packed >> 2) & 0x07
            transparent = if ((packed & 0x01) != 0) u8(b, pos + 4) else -1
            pos += 5
            if (pos >= b.length || u8(b, pos) != 0) fail()
            pos += 1
          } else {
            pos = skipSubBlocks(b, pos)
          }
        case 0x2C => // image descriptor
          if (pos + 10 > b.length) fail()
          val fx = le16(b, pos + 1); val fy = le16(b, pos + 3)
          val fw = le16(b, pos + 5); val fh = le16(b, pos + 7)
          val iflags = u8(b, pos + 9)
          pos += 10
          if (fw <= 0 || fh <= 0 || fx + fw > w || fy + fh > h) fail()
          var table = gct
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 0x07)
            table = readColorTable(b, pos, n)
            pos += 3 * n
          }
          if (table == null) fail()
          val interlaced = (iflags & 0x40) != 0
          if (pos >= b.length) fail()
          val minCode = u8(b, pos)
          pos += 1
          val (data, next) = concatSubBlocks(b, pos)
          pos = next
          val indices = lzwDecode(data, minCode, fw * fh)
          val before = if (disposal == 3) canvas.clone() else null
          val bgSnapshot = if (disposal == 2) canvas.clone() else null
          // compose (row order per interlace passes)
          var out = 0
          foreachRow(fh, interlaced) { y =>
            var x = 0
            while (x < fw) {
              val idx = indices(out); out += 1
              if (idx != transparent) {
                if (idx >= table.length) fail()
                canvas((fy + y) * w + (fx + x)) = table(idx)
              }
              x += 1
            }
          }
          frames += Image(w, h, canvas.clone())
          disposal match {
            case 2 => // restore to background: spec says bg color; every
              // mainstream renderer clears the frame REGION on the
              // pre-frame canvas — we clear to black (opaque semantics)
              var y = 0
              while (y < fh) {
                var x = 0
                while (x < fw) { canvas((fy + y) * w + (fx + x)) = 0; x += 1 }
                y += 1
              }
              val _ = bgSnapshot
            case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => ()
          }
          disposal = 0
          transparent = -1
        case _ => fail()
      }
    }
    if (frames.isEmpty) fail()
    frames.toSeq
  }

  /** The spec's four interlace passes (rows 0,8,16… / 4,12… / 2,6… / 1,3…). */
  private def foreachRow(h: Int, interlaced: Boolean)(f: Int => Unit): Unit =
    if (!interlaced) { var y = 0; while (y < h) { f(y); y += 1 } }
    else {
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var y = start
        while (y < h) { f(y); y += step }
      }
    }

  private def readColorTable(b: Array[Byte], pos: Int, n: Int): Array[Int] = {
    if (pos + 3 * n > b.length) fail()
    Array.tabulate(n)(j =>
      (u8(b, pos + 3 * j) << 16) | (u8(b, pos + 3 * j + 1) << 8) | u8(b, pos + 3 * j + 2))
  }

  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var pos = start
    while ({ if (pos >= b.length) fail(); u8(b, pos) != 0 }) {
      pos += 1 + u8(b, pos)
      if (pos > b.length) fail()
    }
    pos + 1
  }

  private def concatSubBlocks(b: Array[Byte], start: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = start
    while ({ if (pos >= b.length) fail(); u8(b, pos) != 0 }) {
      val n = u8(b, pos)
      if (pos + 1 + n > b.length) fail()
      out.write(b, pos + 1, n)
      pos += 1 + n
    }
    (out.toByteArray, pos + 1)
  }

  /** GIF-LZW decode: LSB-first variable-width codes, clear resets the
    * dictionary, EOI ends; emits exactly `need` indices.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int, need: Int): Array[Int] = {
    if (minCode < 2 || minCode > 11) fail()
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Int](need)
    var got = 0
    // dictionary as (prefix, last-char); roots are -1-prefixed
    val prefix = new Array[Int](4096)
    val char = new Array[Int](4096)
    var dictSize = eoi + 1
    var width = minCode + 1
    var bitPos = 0
    val totalBits = data.length * 8
    def read(): Int = {
      if (bitPos + width > totalBits) fail()
      var v = 0
      var k = 0
      while (k < width) {
        val bit = (data((bitPos + k) >> 3) >> ((bitPos + k) & 7)) & 1
        v |= bit << k
        k += 1
      }
      bitPos += width
      v
    }
    def emit(code: Int): Int = { // writes the string for code, returns first char
      var stack = List.empty[Int]
      var c = code
      while (c >= clear + 2) { stack = char(c) :: stack; c = prefix(c) }
      if (c >= clear) fail()
      stack = c :: stack
      stack.foreach { v =>
        if (got < need) { out(got) = v; got += 1 }
        else fail() // more pixels than the descriptor promised
      }
      c
    }
    var prev = -1
    var finished = false
    while (!finished) {
      val code = read()
      if (code == clear) {
        dictSize = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        finished = true
      } else if (prev == -1) {
        if (code >= clear) fail()
        emit(code)
        prev = code
      } else {
        val first =
          if (code < dictSize) emit(code)
          else if (code == dictSize) { // KwKwK: prev's string + its first char
            val f = emit(prev)
            if (got < need) { out(got) = f; got += 1 } else fail()
            f
          } else fail()
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          char(dictSize) = first
          dictSize += 1
          if (dictSize < 4096 && dictSize == (1 << width)) width += 1
        }
        prev = code
      }
      if (got == need && !finished) {
        // spec: an EOI (possibly after a clear) should follow; accept
        // either and stop consuming pixel data
        finished = true
      }
    }
    if (got != need) fail()
    out
  }

  // ----------------------------------------------------------------- encode

  /** Deterministic animated-GIF encoder (fixture tier): one global
    * 256-entry palette (256 rgb triples), full-canvas 8-bit frames,
    * real LZW, disposal "leave in place", interlace on odd frames so
    * decoders must exercise both row orders.
    */
  def encode(w: Int, h: Int, palette: Array[Byte], frames: Seq[Array[Byte]]): Array[Byte] = {
    require(palette.length == 768, "palette is 256 rgb triples")
    require(frames.nonEmpty && frames.forall(_.length == w * h), "full-canvas 8-bit frames")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xFF); out.write(w >> 8)
    out.write(h & 0xFF); out.write(h >> 8)
    out.write(0x80 | 0x07) // GCT present, 256 entries
    out.write(0) // background index
    out.write(0) // aspect
    out.write(palette)
    frames.zipWithIndex.foreach { case (px, fi) =>
      // graphic control: disposal=1 (leave), no transparency, delay 4/100s
      out.write(Array[Byte](0x21, 0xF9.toByte, 4, (1 << 2).toByte, 4, 0, 0, 0))
      val interlaced = fi % 2 == 1
      out.write(0x2C)
      out.write(Array[Byte](0, 0, 0, 0)) // left, top
      out.write(w & 0xFF); out.write(w >> 8)
      out.write(h & 0xFF); out.write(h >> 8)
      out.write(if (interlaced) 0x40 else 0x00)
      out.write(8) // LZW min code size
      val ordered = new Array[Byte](w * h)
      var o = 0
      foreachRow(h, interlaced) { y =>
        System.arraycopy(px, y * w, ordered, o, w)
        o += w
      }
      val data = lzwEncode(ordered, 8)
      var i = 0
      while (i < data.length) {
        val n = math.min(255, data.length - i)
        out.write(n)
        out.write(data, i, n)
        i += n
      }
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** GIF-LZW encode with a hash-map dictionary, clear on overflow.
    *
    * Code-width bookkeeping MIRRORS THE DECODER exactly: the decoder
    * adds one dictionary entry after every data code except the first
    * since a clear, and widens when its entry count reaches 2^width —
    * so the encoder keeps that same `dcount` and widens at the same
    * position in the code stream (including before the final EOI, where
    * an encoder that only counts its own dictionary adds goes one code
    * out of sync at a power-of-two boundary).
    */
  private def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var curBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += width
      while (curBits >= 8) { out.write((cur & 0xFF).toInt); cur >>= 8; curBits -= 8 }
    }
    def flush(): Unit = if (curBits > 0) { out.write((cur & 0xFF).toInt); cur = 0; curBits = 0 }
    val dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1 // encoder's next dictionary index to assign
    var dcount = eoi + 1 // the DECODER's entry count after each code we write
    var firstSinceClear = true
    def putData(code: Int): Unit = {
      put(code)
      if (firstSinceClear) firstSinceClear = false
      else if (dcount < 4096) {
        dcount += 1
        if (dcount == (1 << width) && width < 12) width += 1
      }
    }
    def putClear(): Unit = {
      put(clear)
      dict.clear()
      next = eoi + 1
      dcount = eoi + 1
      width = minCode + 1
      firstSinceClear = true
    }
    put(clear)
    var prev = -1
    indices.foreach { bv =>
      val c = bv & 0xFF
      if (prev == -1) prev = c
      else {
        val key = (prev.toLong << 12) | c
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          putData(prev)
          if (next < 4096) {
            dict.put(key, Integer.valueOf(next))
            next += 1
          } else putClear()
          prev = c
        }
      }
    }
    if (prev != -1) putData(prev)
    put(eoi)
    flush()
    out.toByteArray
  }
}
