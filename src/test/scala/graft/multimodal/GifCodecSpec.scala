package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.images.ImageOps

/** GifCodec contract: LZW + framing round-trips (random palettes and
  * dims, dictionary-overflow clears, KwKwK runs, interlace on odd
  * frames), DIFFERENTIAL decode of ImageIO-written GIFs (an independent
  * LZW encoder), hand-assembled animation semantics (transparency
  * inherits the composed canvas; disposal restore-previous) with codes
  * packed by this spec's own LSB-first bit packer, and totality.
  */
class GifCodecSpec extends AnyFunSuite {

  test("round-trip: 80 random animated GIFs (palette sizes, dims, overflow, runs)") {
    val rnd = new scala.util.Random(0x61F)
    for (k <- 0 until 80) {
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(40)
      val pal = Array.fill(768)(rnd.nextInt(256).toByte)
      val nF = 1 + rnd.nextInt(5)
      // mix full-random frames (dictionary pressure) with tiny-alphabet
      // frames (long runs → KwKwK) per clip
      val frames = (0 until nF).map { _ =>
        if (rnd.nextBoolean()) Array.fill(w * h)(rnd.nextInt(256).toByte)
        else Array.fill(w * h)(rnd.nextInt(3).toByte)
      }
      val gif = GifCodec.encode(w, h, pal, frames)
      val decoded = GifCodec.decode(gif).getOrElse(fail(s"case $k rejected (${w}x$h, $nF frames)"))
      assert(decoded.length == nF, s"case $k frame count")
      decoded.zip(frames).zipWithIndex.foreach { case ((img, idx), fi) =>
        assert(img.width == w && img.height == h, s"case $k frame $fi dims")
        for (o <- 0 until w * h) {
          val j = idx(o) & 0xFF
          val want = ((pal(3 * j) & 0xFF) << 16) | ((pal(3 * j + 1) & 0xFF) << 8) | (pal(3 * j + 2) & 0xFF)
          assert(img.pixels(o) == want, s"case $k frame $fi pixel $o")
        }
      }
    }
  }

  test("dictionary overflow: a 150x80 random frame forces the in-stream clear and survives") {
    val rnd = new scala.util.Random(0x0F10)
    val pal = Array.tabulate(768)(j => (j * 31 % 256).toByte)
    val px = Array.fill(150 * 80)(rnd.nextInt(256).toByte)
    val gif = GifCodec.encode(150, 80, pal, Seq(px))
    val img = GifCodec.decode(gif).get.head
    for (o <- 0 until 150 * 80) {
      val j = px(o) & 0xFF
      val want = ((pal(3 * j) & 0xFF) << 16) | ((pal(3 * j + 1) & 0xFF) << 8) | (pal(3 * j + 2) & 0xFF)
      assert(img.pixels(o) == want, s"pixel $o")
    }
  }

  test("differential vs ImageIO's writer: an independent LZW encoder we must decode to SOURCE truth") {
    // Ground truth is the SOURCE raster (via the image's own color
    // model), not ImageIO's reader: the JDK GIF reader misorders
    // interlace passes for small heights (its own write→read roundtrip
    // is not identity there — verified empirically), while its writer
    // follows the spec's pass order. Decoding the writer's interlaced
    // output back to the exact source pixels is the stronger check
    // anyway: their encoder, our decoder, bit-true result.
    val rnd = new scala.util.Random(0xD1F2)
    for (k <- 0 until 60) {
      val w = 1 + rnd.nextInt(50)
      val h = 1 + rnd.nextInt(40)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, rnd.nextInt() | 0xFF000000)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "gif", bos)
      val bytes = bos.toByteArray
      val ours = GifCodec.decodeFirst(bytes)
        .getOrElse(fail(s"case $k: rejected ImageIO's GIF"))
      val raster = bi.getRaster
      val cm = bi.getColorModel
      val truth = Array.tabulate(w * h)(o =>
        cm.getRGB(raster.getSample(o % w, o / w, 0)) & 0xFFFFFF)
      assert(ours.width == w && ours.height == h, s"case $k dims")
      assert(ours.pixels.sameElements(truth), s"case $k pixels")
    }
  }

  // ---- hand-assembled animation semantics (own LSB-first bit packer)

  private def packCodes(codes: Seq[(Int, Int)]): Array[Byte] = { // (code, width)
    var cur = 0L; var bits = 0
    val out = new java.io.ByteArrayOutputStream()
    codes.foreach { case (c, w) =>
      cur |= c.toLong << bits
      bits += w
      while (bits >= 8) { out.write((cur & 0xFF).toInt); cur >>= 8; bits -= 8 }
    }
    if (bits > 0) out.write((cur & 0xFF).toInt)
    out.toByteArray
  }

  /** GCE + descriptor + minCode-2 LZW data for a sub-rect frame. */
  private def frame(x: Int, y: Int, w: Int, h: Int, disposal: Int,
      transparent: Int, codes: Seq[(Int, Int)]): Array[Byte] = {
    val packed = ((disposal & 7) << 2) | (if (transparent >= 0) 1 else 0)
    val data = packCodes(codes)
    Array[Byte](0x21, 0xF9.toByte, 4, packed.toByte, 0, 0,
      (if (transparent >= 0) transparent else 0).toByte, 0,
      0x2C, x.toByte, 0, y.toByte, 0, w.toByte, 0, h.toByte, 0, 0, 2,
      data.length.toByte) ++ data ++ Array[Byte](0)
  }

  test("hand-assembled animation: transparency inherits the canvas; disposal=3 restores it") {
    // canvas 2x1, 4-color GCT; minCode 2 → clear=4, eoi=5, width starts 3
    val gct = Array[Byte](
      10, 20, 30, // c0
      40, 50, 60, // c1
      70, 80, 90, // c2
      100, 110, 120) // c3
    val header = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 1, 0, (0x80 | 0x01).toByte, 0, 0) ++ gct
    val f1 = frame(0, 0, 2, 1, disposal = 1, transparent = -1,
      Seq((4, 3), (1, 3), (2, 3), (5, 3))) // paint [c1, c2]
    // frame 2: paints c0 at x=0 but disposal=3 → restored afterwards
    val f2 = frame(0, 0, 1, 1, disposal = 3, transparent = -1,
      Seq((4, 3), (0, 3), (5, 3)))
    // frame 3: fully transparent sub-rect at x=1 → canvas unchanged
    val f3 = frame(1, 0, 1, 1, disposal = 0, transparent = 3,
      Seq((4, 3), (3, 3), (5, 3)))
    val gif = header ++ f1 ++ f2 ++ f3 ++ Array[Byte](0x3B)
    val frames = GifCodec.decode(gif).getOrElse(fail("hand-assembled rejected"))
    assert(frames.length == 3)
    def rgb(i: Int) = ((gct(3 * i) & 0xFF) << 16) | ((gct(3 * i + 1) & 0xFF) << 8) | (gct(3 * i + 2) & 0xFF)
    assert(frames(0).pixels.toSeq == Seq(rgb(1), rgb(2)), "frame 1 paints c1,c2")
    assert(frames(1).pixels.toSeq == Seq(rgb(0), rgb(2)), "frame 2 shows its paint")
    assert(frames(2).pixels.toSeq == Seq(rgb(1), rgb(2)),
      "frame 3: disposal=3 restored frame 2's paint, transparency left the canvas alone")
  }

  test("interlaced frames (odd index from the encoder) decode to the same pixels") {
    val rnd = new scala.util.Random(0x17AC)
    val w = 23; val h = 17 // not multiples of 8: all four passes partial
    val pal = Array.fill(768)(rnd.nextInt(256).toByte)
    val frames = (0 until 2).map(_ => Array.fill(w * h)(rnd.nextInt(256).toByte))
    val decoded = GifCodec.decode(GifCodec.encode(w, h, pal, frames)).get
    // frame 1 was written interlaced; identical recovery proves the pass order
    for (fi <- 0 until 2; o <- 0 until w * h) {
      val j = frames(fi)(o) & 0xFF
      val want = ((pal(3 * j) & 0xFF) << 16) | ((pal(3 * j + 1) & 0xFF) << 8) | (pal(3 * j + 2) & 0xFF)
      assert(decoded(fi).pixels(o) == want, s"frame $fi pixel $o")
    }
  }

  test("malformed streams are rejected, never thrown on") {
    val rnd = new scala.util.Random(0xBAD6)
    val pal = Array.fill(768)(3.toByte)
    val good = GifCodec.encode(10, 8, pal, Seq(Array.fill(80)(7.toByte)))
    (0 until good.length by 3).foreach { k =>
      assert(GifCodec.decode(good.take(k)).isEmpty, s"prefix $k")
    }
    for (_ <- 0 until 300) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
      GifCodec.decode(m)
    }
    assert(GifCodec.decode("GIF89a".getBytes("US-ASCII") ++ Array.fill[Byte](20)(0x11)).isEmpty)
    succeed
  }

  test("wired: ImageOps.decode reads GIFs through the from-spec first-frame path") {
    val pal = Array.tabulate(768)(j => (j % 256).toByte)
    val px = Array.tabulate(24)(o => (o * 11 % 256).toByte)
    val gif = GifCodec.encode(6, 4, pal, Seq(px))
    val img = ImageOps.decode(gif).getOrElse(fail("wired decode rejected GIF"))
    for (o <- 0 until 24) {
      val j = px(o) & 0xFF
      val want = ((pal(3 * j) & 0xFF) << 16) | ((pal(3 * j + 1) & 0xFF) << 8) | (pal(3 * j + 2) & 0xFF)
      assert(img.pixels(o) == want, s"pixel $o")
    }
  }
}
