package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite
import graft.images.ImageOps.Image

/** TIFF codec proof set:
  *  1. ROUND-TRIP: random noise through every writer shape (3
  *     compressions × both predictors × both byte orders × gray/RGB/
  *     palette × multi-strip) decodes bit-identically.
  *  2. EARLY-CHANGE BOUNDARIES: an image large enough that the LZW code
  *     stream crosses the 9→10→11→12-bit widths round-trips — and is
  *     decoded identically by the JDK ImageIO TIFF plugin (the
  *     independent implementation pinning the early-change instants).
  *  3. CONFORMANCE, engine as decoder: streams ImageIO WRITES (its own
  *     LZW/PackBits/uncompressed encoders) decode identically here.
  *  4. PackBits and LZW unit pins on hand-built byte streams.
  *  5. TOTALITY: every prefix of a valid file and byte-mangled variants
  *     return None or a well-formed image, never throw.
  */
class TiffCodecSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def noiseRgb(w: Int, h: Int, seed: Long): Image = {
    val r = rng(seed)
    Image(w, h, Array.fill(w * h)(r.nextInt(1 << 24)))
  }

  private def layouts: Seq[TiffCodec.Layout] =
    for {
      comp <- Seq(1, 5, 32773)
      pred <- Seq(1, 2)
      be <- Seq(false, true)
    } yield TiffCodec.Layout(comp, pred, be, rowsPerStrip = 4)

  test("round-trip: RGB noise through every layout") {
    val img = noiseRgb(15, 9, 1)
    for (l <- layouts) {
      val got = TiffCodec.decode(TiffCodec.encodeRgb(img, l))
      assert(got.exists(g => g.width == 15 && g.height == 9 &&
        g.pixels.sameElements(img.pixels)), s"layout $l")
    }
  }

  test("round-trip: gray and palette noise through every layout") {
    val r = rng(2)
    val vals = Array.fill(15 * 9)(r.nextInt(256).toByte)
    val pal = Array.fill(256)(r.nextInt(1 << 24))
    for (l <- layouts) {
      val gray = TiffCodec.decode(TiffCodec.encodeGray(15, 9, vals, l))
      assert(gray.exists(g => (0 until 15 * 9).forall { i =>
        val v = vals(i) & 0xFF
        g.pixels(i) == ((v << 16) | (v << 8) | v)
      }), s"gray $l")
      val palImg = TiffCodec.decode(TiffCodec.encodePalette(15, 9, vals, pal, l))
      assert(palImg.exists(g => (0 until 15 * 9).forall { i =>
        g.pixels(i) == pal(vals(i) & 0xFF)
      }), s"palette $l")
    }
  }

  private def imageioDecode(bytes: Array[Byte]): Option[Image] =
    Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { bi =>
      Image(bi.getWidth, bi.getHeight,
        Array.tabulate(bi.getWidth * bi.getHeight)(i =>
          bi.getRGB(i % bi.getWidth, i / bi.getWidth) & 0xFFFFFF))
    }

  test("LZW early-change boundaries: big noise round-trips and ImageIO agrees") {
    // 96×60 RGB noise = 17280 bytes/strip-set: the LZW stream crosses the
    // 9/10/11/12-bit widths and (with rowsPerStrip = height) approaches the
    // table-reset region
    val img = noiseRgb(96, 60, 3)
    for (pred <- Seq(1, 2); be <- Seq(false, true)) {
      val l = TiffCodec.Layout(5, pred, be, rowsPerStrip = 60)
      val bytes = TiffCodec.encodeRgb(img, l)
      assert(TiffCodec.decode(bytes).exists(_.pixels.sameElements(img.pixels)),
        s"round-trip $l")
      val io = imageioDecode(bytes)
      assert(io.exists(_.pixels.sameElements(img.pixels)),
        s"ImageIO disagrees on the engine's LZW stream ($l)")
    }
  }

  test("conformance: engine decodes ImageIO-written TIFFs identically") {
    val img = noiseRgb(41, 23, 4)
    val bi = new java.awt.image.BufferedImage(41, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 23; x <- 0 until 41)
      bi.setRGB(x, y, img.pixels(y * 41 + x))
    for (comp <- Seq(None, Some("LZW"), Some("PackBits"))) {
      val out = new java.io.ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      comp.foreach { c =>
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType(c)
      }
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
      ios.close(); writer.dispose()
      val got = TiffCodec.decode(out.toByteArray)
      assert(got.exists(g => g.width == 41 && g.height == 23 &&
        g.pixels.sameElements(img.pixels)),
        s"engine cannot replay ImageIO's ${comp.getOrElse("none")} stream")
    }
  }

  test("PackBits unit pins (spec §9 examples)") {
    // the spec's worked example
    val enc = Array[Byte](-2, 0xAA.toByte, 2, 0x80.toByte, 0x00, 0x2A,
      -3, 0xAA.toByte, -128, 3, 0x80.toByte, 0x00, 0x2A, 0x22,
      -6, 0xAA.toByte)
    val want = Array[Byte](0xAA.toByte, 0xAA.toByte, 0xAA.toByte,
      0x80.toByte, 0x00, 0x2A, 0xAA.toByte, 0xAA.toByte, 0xAA.toByte,
      0xAA.toByte, 0x80.toByte, 0x00, 0x2A, 0x22,
      0xAA.toByte, 0xAA.toByte, 0xAA.toByte, 0xAA.toByte, 0xAA.toByte,
      0xAA.toByte, 0xAA.toByte)
    assert(TiffCodec.packBitsDecode(enc, want.length).sameElements(want))
    // encoder round-trips arbitrary data incl. 2-byte runs inside literals
    val r = rng(5)
    for (n <- Seq(1, 2, 3, 127, 128, 129, 300, 1000)) {
      val data = Array.fill(n)(r.nextInt(4).toByte) // small alphabet → runs
      val rt = TiffCodec.packBitsDecode(TiffCodec.packBitsEncode(data), n)
      assert(rt.sameElements(data), s"n=$n")
    }
  }

  test("LZW unit pin: cScSc corner and byte round-trips") {
    // classic cScSc stress: ababab... forces the code==next corner
    val ab = Array.tabulate(64)(i => if (i % 2 == 0) 'a'.toByte else 'b'.toByte)
    assert(TiffCodec.lzwDecode(TiffCodec.lzwEncode(ab), 64).sameElements(ab))
    val r = rng(6)
    for (n <- Seq(0, 1, 2, 255, 256, 4096, 20000)) {
      val data = Array.fill(n)(r.nextInt(256).toByte)
      assert(TiffCodec.lzwDecode(TiffCodec.lzwEncode(data), n).sameElements(data),
        s"n=$n")
      val runs = Array.fill(n)(r.nextInt(3).toByte)
      assert(TiffCodec.lzwDecode(TiffCodec.lzwEncode(runs), n).sameElements(runs),
        s"runs n=$n")
    }
  }

  test("totality: truncations and mangles never throw") {
    val img = noiseRgb(15, 9, 7)
    val bytes = TiffCodec.encodeRgb(img, TiffCodec.Layout(5, 2, false, 4))
    for (n <- 0 to bytes.length)
      TiffCodec.decode(java.util.Arrays.copyOf(bytes, n)) // must not throw
    val r = rng(8)
    for (_ <- 1 to 300) {
      val m = bytes.clone()
      m(r.nextInt(m.length)) = r.nextInt(256).toByte
      TiffCodec.decode(m) // must not throw
    }
  }
}
