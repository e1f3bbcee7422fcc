package graft.multimodal

import graft.images.ImageOps.Image

/** Pure-JVM BMP decoder from the public Windows bitmap format: BM file
  * header, BITMAPINFOHEADER (and its larger V4/V5 extensions — only the
  * first 40 bytes are read), bottom-up OR top-down rows padded to 4
  * bytes, 8-bit indexed with RGBQUAD palette, 24-bit BGR, 32-bit BGRX
  * (alpha ignored, matching the packed-RGB contract), and BI_RLE8
  * compression (delegated to [[MsRleCodec]] — the identical bitstream
  * the engine already decodes for AVI and MKV). Only the exotic
  * BI_BITFIELDS/RLE4 and 1/4/16-bit shapes fall back to ImageIO.
  * TOTAL on arbitrary bytes.
  */
object BmpCodec {

  private final class Malformed extends RuntimeException
  private def fail(): Nothing = throw new Malformed

  def decode(bytes: Array[Byte]): Option[Image] =
    try Some(decodeOrThrow(bytes))
    catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }

  /** Deterministic 24-bit BI_RGB writer (fixture/production tier):
    * plain bottom-up BGR rows with 4-byte padding — every byte a pure
    * function of the pixels, so fixture trees are pinnable by
    * `read_blob` byte identity like the PNG/QOI/GIF trees.
    */
  def encode(img: Image): Array[Byte] = {
    val w = img.width; val h = img.height
    val stride = (w * 3 + 3) & ~3
    val out = new java.io.ByteArrayOutputStream(54 + stride * h)
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write('B'); out.write('M')
    le32(54 + stride * h); le32(0); le32(54)
    le32(40); le32(w); le32(h); le16(1); le16(24)
    le32(0); le32(stride * h); le32(2835); le32(2835); le32(0); le32(0)
    var row = h - 1
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val p = img.pixels(row * w + x)
        out.write(p & 0xFF); out.write((p >> 8) & 0xFF); out.write((p >> 16) & 0xFF)
        x += 1
      }
      var pad = w * 3
      while (pad < stride) { out.write(0); pad += 1 }
      row -= 1
    }
    out.toByteArray
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def decodeOrThrow(b: Array[Byte]): Image = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') fail()
    val dataOffset = le32(b, 10)
    val headerSize = le32(b, 14)
    if (headerSize < 40) fail() // BITMAPCOREHEADER: not emitted by anything modern
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bitCount = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h <= 0 || w.toLong * h > 100000000L) fail()
    if (dataOffset < 14 + headerSize || dataOffset > b.length) fail()

    if (compression == 1) {
      // BI_RLE8: the identical bitstream [[MsRleCodec]] already decodes
      // for AVI (runs, absolute mode, EOL/EOB/delta escapes, bottom-up)
      if (bitCount != 8 || topDown) fail()
      val clrUsed = le32(b, 46)
      val n = if (clrUsed == 0) 256 else clrUsed
      if (n < 0 || n > 256) fail()
      val palOff = 14 + headerSize
      if (palOff + 4 * n > b.length) fail()
      val pal768 = new Array[Byte](768)
      var j = 0
      while (j < n) {
        pal768(3 * j) = b(palOff + 4 * j + 2) // RGBQUAD is BGRX
        pal768(3 * j + 1) = b(palOff + 4 * j + 1)
        pal768(3 * j + 2) = b(palOff + 4 * j)
        j += 1
      }
      val payload = java.util.Arrays.copyOfRange(b, dataOffset, b.length)
      val video = MsRleCodec.decode(w, h, pal768, Seq(payload)).getOrElse(fail())
      val f = video.frames.head
      val pixels = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, bb) = f.rgb(x, y)
          pixels(y * w + x) = (r << 16) | (g << 8) | bb
          x += 1
        }
        y += 1
      }
      return Image(w, h, pixels)
    }
    if (compression != 0) fail() // BI_BITFIELDS/RLE4 → ImageIO fallback

    val palette: Array[Int] =
      if (bitCount == 8) {
        val clrUsed = le32(b, 46)
        val n = if (clrUsed == 0) 256 else clrUsed
        if (n < 0 || n > 256) fail()
        val palOff = 14 + headerSize
        if (palOff + 4 * n > b.length) fail()
        Array.tabulate(n)(j =>
          (u8(b, palOff + 4 * j + 2) << 16) | (u8(b, palOff + 4 * j + 1) << 8) |
            u8(b, palOff + 4 * j))
      } else null

    val bytesPerPx = bitCount match {
      case 8 => 1
      case 24 => 3
      case 32 => 4
      case _ => fail() // 1/4/16-bit: ImageIO fallback
    }
    val stride = (w * bytesPerPx + 3) & ~3
    if (dataOffset.toLong + stride.toLong * h > b.length) fail()

    val pixels = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      val off = dataOffset + srcRow * stride
      var x = 0
      while (x < w) {
        pixels(row * w + x) = bitCount match {
          case 8 =>
            val idx = u8(b, off + x)
            if (idx >= palette.length) fail()
            palette(idx)
          case 24 =>
            (u8(b, off + 3 * x + 2) << 16) | (u8(b, off + 3 * x + 1) << 8) |
              u8(b, off + 3 * x)
          case 32 =>
            (u8(b, off + 4 * x + 2) << 16) | (u8(b, off + 4 * x + 1) << 8) |
              u8(b, off + 4 * x)
        }
        x += 1
      }
      row += 1
    }
    Image(w, h, pixels)
  }
}
