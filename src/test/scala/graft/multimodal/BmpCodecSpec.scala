package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.images.ImageOps

/** BmpCodec contract: differential pixel equality against ImageIO's
  * independent BMP writer across 24-bit and 8-bit-indexed sources (odd
  * widths exercise the 4-byte row padding), a hand-assembled top-down
  * 32-bit file (ImageIO never writes those), rejection of the
  * BI_RLE8-compressed subset (falls back to ImageIO), and totality.
  */
class BmpCodecSpec extends AnyFunSuite {

  test("differential vs ImageIO: 80 random BMPs (24-bit and 8-bit indexed, odd widths)") {
    val rnd = new scala.util.Random(0xB3B)
    val types = Seq(
      java.awt.image.BufferedImage.TYPE_INT_RGB,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (k <- 0 until 80) {
      val w = 1 + rnd.nextInt(41)
      val h = 1 + rnd.nextInt(30)
      val bi = new java.awt.image.BufferedImage(w, h, types(k % types.length))
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, rnd.nextInt() | 0xFF000000)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "bmp", bos)
      val bytes = bos.toByteArray
      val ours = BmpCodec.decode(bytes).getOrElse(fail(s"case $k rejected (${w}x$h)"))
      val ref = ImageOps.decodeImageIO(bytes).getOrElse(fail(s"case $k: ImageIO"))
      assert(ours.width == ref.width && ours.height == ref.height, s"case $k dims")
      assert(ours.pixels.sameElements(ref.pixels), s"case $k pixels")
      assert(ImageOps.decode(bytes).get.pixels.sameElements(ref.pixels), s"case $k wired")
    }
  }

  test("hand-assembled top-down 32-bit BMP (negative height) decodes in source order") {
    val w = 3; val h = 2
    val px = Array(0x112233, 0x445566, 0x778899, 0xAABBCC, 0xDDEEFF, 0x010203)
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    out.write('B'); out.write('M')
    le32(54 + w * h * 4); le32(0); le32(54)
    le32(40); le32(w); le32(-h) // negative height = top-down
    le16(1); le16(32); le32(0); le32(w * h * 4)
    le32(0); le32(0); le32(0); le32(0)
    px.foreach { p =>
      out.write(p & 0xFF); out.write((p >> 8) & 0xFF); out.write((p >> 16) & 0xFF); out.write(0x7F)
    }
    val img = BmpCodec.decode(out.toByteArray).getOrElse(fail("top-down rejected"))
    assert(img.width == w && img.height == h)
    assert(img.pixels.sameElements(px), "top-down rows must not be flipped; alpha byte ignored")
  }

  test("hand-assembled BI_RLE8 BMP decodes through the shared MsRleCodec bitstream") {
    // 8×3, palette entry j = (j, 2j, 3j); bottom-up rows:
    //   bottom row: run of 8 × idx 5
    //   middle row: absolute mode 4 bytes (1,2,3,4) then run 4 × idx 9
    //   top row: 2 × idx 7, delta skip (3,0), 3 × idx 8 (cols 5..7)
    val w = 8; val h = 3
    val rle = Array[Int](
      8, 5, 0, 0, // run, EOL
      0, 4, 1, 2, 3, 4, 4, 9, 0, 0, // absolute(4), run, EOL
      2, 7, 0, 2, 3, 0, 3, 8, 0, 1 // run, delta(3,0), run, EOB
    ).map(_.toByte)
    val hdr = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { hdr.write(v & 0xFF); hdr.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    hdr.write('B'); hdr.write('M')
    val dataOffset = 54 + 1024
    le32(dataOffset + rle.length); le32(0); le32(dataOffset)
    le32(40); le32(w); le32(h); le16(1); le16(8)
    le32(1); le32(rle.length); le32(2835); le32(2835); le32(256); le32(0)
    for (j <- 0 until 256) { // RGBQUAD = BGRX
      hdr.write((3 * j) % 256); hdr.write((2 * j) % 256); hdr.write(j); hdr.write(0)
    }
    hdr.write(rle)
    val img = BmpCodec.decode(hdr.toByteArray).getOrElse(fail("RLE8 rejected"))
    def pal(j: Int) = ((j % 256) << 16) | (((2 * j) % 256) << 8) | ((3 * j) % 256)
    val expected = Array(
      // top row (display y=0): 7 7 0 0 0 8 8 8 (delta-skipped = palette 0)
      Array(7, 7, 0, 0, 0, 8, 8, 8),
      // middle row: absolute 1 2 3 4 then run 9 9 9 9
      Array(1, 2, 3, 4, 9, 9, 9, 9),
      // bottom row: 5 × 8
      Array.fill(8)(5)).flatten.map(pal)
    assert(img.width == w && img.height == h)
    assert(img.pixels.sameElements(expected))
  }

  test("malformed streams are rejected, never thrown on") {
    val rnd = new scala.util.Random(0xBADB)
    val bi = new java.awt.image.BufferedImage(9, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 7; x <- 0 until 9) bi.setRGB(x, y, rnd.nextInt())
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "bmp", bos)
    val good = bos.toByteArray
    (0 until good.length by 3).foreach { k =>
      assert(BmpCodec.decode(good.take(k)).isEmpty, s"prefix $k")
    }
    for (_ <- 0 until 300) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
      BmpCodec.decode(m)
    }
    succeed
  }
}
