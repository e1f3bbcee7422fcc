package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.images.ImageOps.Image
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** JpegCodec contract, proven along four independent axes:
  *
  *  1. EXACTNESS CORNER (the hash-gate stance): block-constant even-gray
  *     images roundtrip IDENTICALLY through encode→decode — the closed
  *     form `q_jpeg_scan`'s oracle replays.
  *  2. IDCT DIFFERENTIAL: the 13-bit islow IDCT vs an exact
  *     double-precision IDCT with final rounding — within ±1 on random
  *     blocks (the accuracy class T.81 Annex A demands), exact on
  *     DC-only blocks.
  *  3. CONFORMANCE via ImageIO as the INDEPENDENT DECODER: ImageIO must
  *     accept and decode every stream the engine writes (incl. restart
  *     markers), agreeing within the ±1 a conforming-but-different IDCT
  *     may legally differ by.
  *  4. CONFORMANCE via ImageIO as the INDEPENDENT ENCODER: streams the
  *     JDK writes (4:2:0 color, single-component gray, progressive for
  *     the rejection path) decode through the engine within the same
  *     bound — or exactly, where the fixed-point pipelines coincide.
  *
  * Plus totality on mangled bytes.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, v: Int): Image =
    Image(w, h, Array.fill(w * h)((v << 16) | (v << 8) | v))

  private def twoTone(w: Int, h: Int, split: Int, a: Int, b: Int): Image =
    Image(w, h, Array.tabulate(w * h) { o =>
      val v = if (o % w < split) a else b
      (v << 16) | (v << 8) | v
    })

  private def rng(seed: Long) = new scala.util.Random(seed)

  // ---------------- 1. exactness corner

  test("even-gray constant images roundtrip identically at quality 50") {
    for (v <- 0 until 256 by 2) {
      val img = gray(16, 8, v)
      val decoded = JpegCodec.decode(JpegCodec.encode(img)).get
      assert(decoded.width == 16 && decoded.height == 8)
      assert(decoded.pixels.sameElements(img.pixels), s"gray $v drifted")
    }
  }

  test("even-gray two-tone at a block boundary roundtrips identically") {
    for (i <- 0 until 8) {
      val a = (2 * (17 * i + 30)) % 256
      val b = (2 * (41 * i + 90)) % 256
      val img = twoTone(32, 16, 16, a, b)
      val decoded = JpegCodec.decode(JpegCodec.encode(img)).get
      assert(decoded.pixels.sameElements(img.pixels), s"two-tone ($a,$b) drifted")
    }
  }

  test("odd gray values stay within the DC quantization bound") {
    // odd v: DC = 8(v-128) is not a multiple of 16 → off by at most
    // ceil(Q00/2)/8 = 1 after the round trip
    for (v <- 1 until 256 by 2) {
      val img = gray(8, 8, v)
      val d = JpegCodec.decode(JpegCodec.encode(img)).get
      val got = d.pixels(0) & 0xFF
      assert(math.abs(got - v) <= 1, s"gray $v -> $got")
      assert(d.pixels.forall(_ == d.pixels(0)), "constant block must stay constant")
    }
  }

  // ---------------- 2. IDCT differential

  /** Exact double-precision IDCT with the same final rounding contract:
    * out = clamp(round(sum) + 128). Shares nothing with the islow
    * fixed-point graph.
    */
  private def idctExact(coefZig: Array[Int], quant: Array[Int]): Array[Double] = {
    val f = new Array[Double](64)
    for (k <- 0 until 64) f(JpegCodec.Zigzag(k)) = coefZig(k).toDouble * quant(JpegCodec.Zigzag(k))
    val out = new Array[Double](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / StrictMath.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / StrictMath.sqrt(2) else 1.0
        s += cu * cv * f(v * 8 + u) *
          StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16) *
          StrictMath.cos((2 * y + 1) * v * StrictMath.PI / 16)
      }
      out(y * 8 + x) = s / 4.0 + 128.0
    }
    out
  }

  test("islow IDCT within 1 of the exact IDCT on random blocks") {
    val r = rng(0xDC7)
    val quant = JpegCodec.scaledQuant(JpegCodec.StdLumaQuant, 75)
    for (_ <- 0 until 200) {
      val coef = new Array[Int](64)
      coef(0) = r.nextInt(401) - 200
      for (_ <- 0 until r.nextInt(20)) coef(1 + r.nextInt(63)) = r.nextInt(41) - 20
      val got = JpegCodec.idctBlock(coef, quant)
      val want = idctExact(coef, quant)
      for (i <- 0 until 64) {
        val w = math.max(0.0, math.min(255.0, want(i)))
        assert(math.abs(got(i) - w) <= 1.0 + 1e-9,
          s"sample $i: islow ${got(i)} vs exact $w")
      }
    }
  }

  test("islow IDCT exact on DC-only blocks") {
    val quant = JpegCodec.scaledQuant(JpegCodec.StdLumaQuant, 50)
    for (dc <- -128 to 127) {
      val coef = new Array[Int](64)
      coef(0) = dc
      val got = JpegCodec.idctBlock(coef, quant)
      val want = math.max(0, math.min(255,
        ((dc * quant(0) + 4) >> 3) + 128)) // descale(dc*q, 3) + 128
      assert(got.forall(_ == want), s"dc=$dc: got ${got(0)}, want $want")
    }
  }

  // ---------------- 3. ImageIO as independent decoder

  private def imageIoDecode(bytes: Array[Byte]): Option[Image] =
    Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { bi =>
      Image(bi.getWidth, bi.getHeight,
        bi.getRGB(0, 0, bi.getWidth, bi.getHeight, null, 0, bi.getWidth).map(_ & 0xFFFFFF))
    }

  private def maxChannelDiff(a: Image, b: Image): Int = {
    assert(a.width == b.width && a.height == b.height)
    var worst = 0
    for (i <- a.pixels.indices; shift <- Seq(16, 8, 0)) {
      val d = math.abs(((a.pixels(i) >> shift) & 0xFF) - ((b.pixels(i) >> shift) & 0xFF))
      if (d > worst) worst = d
    }
    worst
  }

  test("ImageIO decodes engine streams; both decoders agree within 1") {
    val r = rng(0x1A6E)
    for (trial <- 0 until 6) {
      val w = 17 + r.nextInt(40); val h = 9 + r.nextInt(30)
      // smooth content (small AC energy) keeps quantization error small and
      // makes the comparison about the DECODERS, not the lossy encode
      val base = r.nextInt(200)
      val img = Image(w, h, Array.tabulate(w * h) { o =>
        val x = o % w; val y = o / w
        val v = math.max(0, math.min(255, base + x + y))
        (v << 16) | (v << 8) | v
      })
      val bytes = JpegCodec.encode(img, quality = 90)
      val ours = JpegCodec.decode(bytes).get
      val theirs = imageIoDecode(bytes).getOrElse(fail(s"trial $trial: ImageIO rejected engine stream"))
      // T.81 only demands ±1; empirically the shared islow formulation is
      // BIT-identical — assert the strong form so any drift is loud
      assert(maxChannelDiff(ours, theirs) == 0, s"trial $trial diverged")
    }
  }

  test("restart markers: engine roundtrip exact, ImageIO accepts the stream") {
    val img = twoTone(48, 24, 24, 100, 200) // 18 MCUs, restart every 5
    val bytes = JpegCodec.encode(img, quality = 50, restartInterval = 5)
    assert(bytes.containsSlice(Array(0xFF.toByte, 0xD0.toByte)))
    val decoded = JpegCodec.decode(bytes).get
    assert(decoded.pixels.sameElements(img.pixels))
    val theirs = imageIoDecode(bytes).getOrElse(fail("ImageIO rejected restart stream"))
    assert(maxChannelDiff(decoded, theirs) == 0)
  }

  // ---------------- 4. ImageIO as independent encoder

  private def imageIoEncode(img: Image, quality: Float, grayscale: Boolean): Array[Byte] = {
    val bi = new BufferedImage(img.width, img.height,
      if (grayscale) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
    if (grayscale) {
      val raster = bi.getRaster
      for (y <- 0 until img.height; x <- 0 until img.width)
        raster.setSample(x, y, 0, img.pixels(y * img.width + x) & 0xFF)
    } else bi.setRGB(0, 0, img.width, img.height, img.pixels, 0, img.width)
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), params)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("single-component (grayscale) JDK streams decode identically") {
    val r = rng(0x6A47)
    for (trial <- 0 until 6) {
      val w = 15 + r.nextInt(35); val h = 11 + r.nextInt(25)
      val img = Image(w, h, Array.tabulate(w * h) { _ =>
        val v = r.nextInt(256); (v << 16) | (v << 8) | v
      })
      val bytes = imageIoEncode(img, 0.85f, grayscale = true)
      val ours = JpegCodec.decode(bytes).getOrElse(fail(s"trial $trial: engine rejected JDK gray stream"))
      // compare RAW samples: getRGB on a gray BufferedImage applies a
      // linear-gray→sRGB color-space conversion that is not part of JPEG
      val bi = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(bi.getRaster.getNumBands == 1, "sanity: single-component stream")
      var worst = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(bi.getRaster.getSample(x, y, 0) - (ours.pixels(y * w + x) & 0xFF))
        if (d > worst) worst = d
      }
      assert(worst == 0, s"trial $trial: gray decode differs by $worst")
    }
  }

  test("4:2:0 color JDK streams decode within 1 of ImageIO") {
    val r = rng(0x420C)
    for (trial <- 0 until 6) {
      val w = 18 + r.nextInt(30); val h = 14 + r.nextInt(22)
      val img = Image(w, h, Array.tabulate(w * h) { o =>
        val x = o % w; val y = o / w
        val rr = math.min(255, 40 + 3 * x)
        val gg = math.min(255, 60 + 2 * y)
        val bb = math.min(255, 30 + x + y)
        (rr << 16) | (gg << 8) | bb
      })
      val bytes = imageIoEncode(img, 0.9f, grayscale = false)
      val ours = JpegCodec.decode(bytes).getOrElse(fail(s"trial $trial: engine rejected JDK color stream"))
      val theirs = imageIoDecode(bytes).get
      val diff = maxChannelDiff(ours, theirs)
      assert(diff == 0, s"trial $trial: color decode differs by $diff")
    }
  }

  test("bit-identity holds on random noise through both stream shapes") {
    // noise maximizes AC energy — the harshest content for IDCT drift
    val r = rng(0xB17)
    for (trial <- 0 until 8) {
      val w = 16 + r.nextInt(48); val h = 16 + r.nextInt(40)
      val img = Image(w, h, Array.fill(w * h)(r.nextInt(1 << 24)))
      val jdk = imageIoEncode(img, 0.8f, grayscale = false) // 4:2:0
      assert(maxChannelDiff(JpegCodec.decode(jdk).get, imageIoDecode(jdk).get) == 0,
        s"trial $trial: 4:2:0 JDK stream diverged")
      val eng = JpegCodec.encode(img, 80) // 4:4:4
      assert(maxChannelDiff(JpegCodec.decode(eng).get, imageIoDecode(eng).get) == 0,
        s"trial $trial: 4:4:4 engine stream diverged")
    }
  }

  private def imageIoEncodeProgressive(img: Image, quality: Float): Array[Byte] = {
    val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
    bi.setRGB(0, 0, img.width, img.height, img.pixels, 0, img.width)
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), params)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("progressive streams decode bit-identically to ImageIO") {
    val r = rng(0x50F2)
    for (trial <- 0 until 8) {
      val w = 17 + r.nextInt(40); val h = 13 + r.nextInt(30)
      // noise maximizes successive-approximation refinement activity
      val img = Image(w, h, Array.fill(w * h)(r.nextInt(1 << 24)))
      val bytes = imageIoEncodeProgressive(img, 0.8f)
      // sanity: the stream really is progressive (SOF2 present)
      assert((2 until bytes.length - 1).exists(i =>
        (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC2), "not SOF2")
      val ours = JpegCodec.decode(bytes)
        .getOrElse(fail(s"trial $trial: engine rejected progressive stream"))
      val theirs = imageIoDecode(bytes).get
      val diff = maxChannelDiff(ours, theirs)
      assert(diff == 0, s"trial $trial: progressive decode differs by $diff")
    }
  }

  test("quality 96-100 high-frequency content always yields a decodable stream") {
    // At quality >= ~96 the scaled quant entries clamp to 1, so AC
    // coefficients approach the exact-DCT extreme (~1020, category 10;
    // the Annex-K AC tables end at category 10 = +-1023). The encoder
    // clamps any coefficient beyond +-1023, guaranteeing every emitted
    // (run,size) symbol exists in the table — without the clamp a
    // category-11 coefficient would emit NO Huffman code but still write
    // its 11 magnitude bits, silently corrupting the stream. Worst-case
    // content: pixels set to the sign pattern of a single high-energy
    // DCT basis, which maximizes that basis's coefficient under quant 1.
    def basisSign(u: Int, v: Int): Image = Image(16, 16, Array.tabulate(256) { o =>
      val x = o % 16 % 8; val y = o / 16 % 8
      val c = math.cos((2 * x + 1) * u * math.Pi / 16) *
        math.cos((2 * y + 1) * v * math.Pi / 16)
      val p = if (c >= 0) 255 else 0
      (p << 16) | (p << 8) | p
    })
    val r = rng(0x96FF)
    val noisy = Image(24, 16, Array.tabulate(24 * 16) { _ =>
      val p = r.nextInt(256); (p << 16) | (p << 8) | p
    })
    for (q <- 96 to 100; img <- Seq(basisSign(4, 4), basisSign(7, 7), basisSign(0, 7), noisy)) {
      val bytes = JpegCodec.encode(img, quality = q)
      val ours = JpegCodec.decode(bytes)
        .getOrElse(fail(s"q=$q: engine rejected its own stream"))
      val theirs = imageIoDecode(bytes)
        .getOrElse(fail(s"q=$q: ImageIO rejected engine stream"))
      assert(maxChannelDiff(ours, theirs) <= 1, s"q=$q decoders diverged")
    }
  }

  // ---------------- totality

  test("decode is total on mangled and truncated bytes") {
    val r = rng(0xF027)
    val good = JpegCodec.encode(twoTone(24, 16, 8, 64, 180), quality = 75)
    for (_ <- 0 until 300) {
      val m = good.clone()
      for (_ <- 0 to r.nextInt(4)) m(r.nextInt(m.length)) = r.nextInt(256).toByte
      JpegCodec.decode(m) // must not throw
    }
    for (len <- 0 until math.min(good.length, 200)) JpegCodec.decode(good.take(len))
    JpegCodec.decode(Array.fill(64)(0xFF.toByte))
    JpegCodec.decode(Array[Byte]())
  }
}
