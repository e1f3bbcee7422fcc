package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Seeded cross-codec fuzz: many randomized round-trips per codec chain
  * (shapes the targeted specs don't enumerate), plus totality of every
  * decoder on adversarial bytes — truncations and bit flips of REAL
  * encodings, not just noise. All seeds fixed: failures reproduce.
  */
class CodecFuzzSpec extends AnyFunSuite {

  test("FLAC: 60 random streams round-trip bare AND through MP4 AND Ogg AND MKV") {
    val rnd = new scala.util.Random(0xF1AC)
    for (k <- 0 until 60) {
      val n = 1 + rnd.nextInt(9000)
      val nCh = 1 + rnd.nextInt(2)
      val chans = Array.fill(nCh)(Array.fill(n)(rnd.nextInt(65536) - 32768))
      val rate = 1000 + rnd.nextInt(90000)
      val mode =
        if (nCh == 2) Seq(FlacCodec.Independent, FlacCodec.LeftSide,
          FlacCodec.RightSide, FlacCodec.MidSide)(rnd.nextInt(4))
        else FlacCodec.Independent
      val flac = FlacCodec.encode(rate, chans, stereo = mode)
      val direct = FlacCodec.decode(flac).getOrElse(fail(s"case $k: bare decode"))
      chans.indices.foreach(c => assert(direct.channels(c).sameElements(chans(c)), s"case $k ch $c"))
      val mp4 = Mp4Codec.muxFlac(flac).getOrElse(fail(s"case $k: mux"))
      val viaMp4 = Mp4Codec.demux(mp4).flatMap(_.headOption)
        .flatMap(Mp4Codec.flacStream).flatMap(FlacCodec.decode)
        .getOrElse(fail(s"case $k: mp4 chain"))
      chans.indices.foreach(c => assert(viaMp4.channels(c).sameElements(chans(c)), s"case $k mp4 ch $c"))
      val ogg = OggCodec.muxFlac(flac).getOrElse(fail(s"case $k: ogg mux"))
      val viaOgg = OggCodec.flacStream(ogg).flatMap(FlacCodec.decode)
        .getOrElse(fail(s"case $k: ogg chain"))
      chans.indices.foreach(c => assert(viaOgg.channels(c).sameElements(chans(c)), s"case $k ogg ch $c"))
      // MKV: rel cluster ts can exceed int16 at low rates with long input
      // — muxFlac contracts to None there; only assert round-trip when it
      // accepts (the bound test lives in MkvCodecSpec)
      MkvCodec.muxFlac(flac).foreach { mkv =>
        val viaMkv = MkvCodec.demux(mkv).flatMap(_.find(_.codecId == "A_FLAC"))
          .flatMap(MkvCodec.flacStream).flatMap(FlacCodec.decode)
          .getOrElse(fail(s"case $k: mkv chain"))
        chans.indices.foreach(c => assert(viaMkv.channels(c).sameElements(chans(c)), s"case $k mkv ch $c"))
      }
    }
  }

  test("ZMBV: 60 random videos round-trip through the AVI container") {
    val rnd = new scala.util.Random(0x2B5D)
    for (k <- 0 until 60) {
      val w = 1 + rnd.nextInt(45)
      val h = 1 + rnd.nextInt(37)
      val fmt = Seq(ZmbvCodec.FmtPal8, ZmbvCodec.Fmt15, ZmbvCodec.Fmt16,
        ZmbvCodec.Fmt32)(rnd.nextInt(4))
      val bpp = if (fmt == ZmbvCodec.Fmt32) 4 else if (fmt == ZmbvCodec.FmtPal8) 1 else 2
      val nF = 1 + rnd.nextInt(6)
      val keyEvery = 1 + rnd.nextInt(4)
      val frames = (0 until nF).map { _ =>
        val pal = if (fmt == ZmbvCodec.FmtPal8)
          Array.fill(768)(rnd.nextInt(256).toByte) else Array.emptyByteArray
        (Array.fill(w * h * bpp)(rnd.nextInt(256).toByte), pal)
      }
      val avi = ZmbvCodec.encodeAvi(w, h, fmt, frames, keyEvery = keyEvery,
        search = rnd.nextInt(5))
      val (fcc, dw, dh) = AviCodec.videoInfo(avi).getOrElse(fail(s"case $k: header"))
      assert(fcc == "ZMBV" && dw == w && dh == h, s"case $k")
      val v = ZmbvCodec.decode(dw, dh,
        AviCodec.frames(avi).getOrElse(fail(s"case $k: demux")))
        .getOrElse(fail(s"case $k: decode (fmt=$fmt ${w}x$h keyEvery=$keyEvery)"))
      v.frames.zip(frames).zipWithIndex.foreach { case ((got, (px, pal)), i) =>
        assert(got.pixels.sameElements(px), s"case $k frame $i pixels")
        if (fmt == ZmbvCodec.FmtPal8)
          assert(got.palette.sameElements(pal), s"case $k frame $i palette")
      }
    }
  }

  test("ADPCM/G.711: 60 random clips round-trip with exact compander math") {
    val rnd = new scala.util.Random(0xADCC)
    for (k <- 0 until 60) {
      val n = 1 + rnd.nextInt(4000)
      val sig = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val rate = 1000 + rnd.nextInt(90000)
      rnd.nextInt(3) match {
        case 0 => // IMA: exact self-decode vs the step-machine replay
          val ba = 8 + 4 * rnd.nextInt(80) // blockAlign 8..324, 4-aligned
          val pcm = AdpcmCodec.decodePcm(
            AdpcmCodec.encodeImaWav(rate, sig, ba))
            .getOrElse(fail(s"case $k: ima decode (n=$n ba=$ba)"))
          assert(pcm.samples.length == n, s"case $k length")
          val spb = (ba - 4) * 2 + 1
          var pred = 0; var idx = 0
          sig.indices.foreach { t =>
            val e =
              if (t % spb == 0) { pred = sig(t); sig(t) }
              else {
                val (_, np, ni) = AdpcmCodec.imaEncodeStep(sig(t), pred, idx)
                pred = np; idx = ni; np
              }
            assert(pcm.samples(t) == e, s"case $k sample $t (ba=$ba)")
          }
        case m =>
          val mu = m == 1
          val pcm = AdpcmCodec.decodePcm(
            AdpcmCodec.encodeG711Wav(rate, sig, mu))
            .getOrElse(fail(s"case $k: g711 decode"))
          sig.indices.foreach { t =>
            val e = if (mu) AdpcmCodec.muDecode(AdpcmCodec.muEncode(sig(t)))
              else AdpcmCodec.aDecode(AdpcmCodec.aEncode(sig(t)))
            assert(pcm.samples(t) == e, s"case $k sample $t mu=$mu")
          }
      }
    }
  }

  test("MS-RLE: 60 random videos round-trip through the AVI container") {
    val rnd = new scala.util.Random(0x8135)
    for (k <- 0 until 60) {
      val w = 1 + rnd.nextInt(45)
      val h = 1 + rnd.nextInt(37)
      val nF = 1 + rnd.nextInt(6)
      val keyEvery = rnd.nextInt(5) // 0 = only frame 0 is a keyframe
      val pal = Array.fill(768)(rnd.nextInt(256).toByte)
      // mix dense-random frames with sparse edits (deltas + EOL skips)
      val frames = (0 until nF).scanLeft(
        Array.fill(w * h)(rnd.nextInt(256).toByte)) { (prev, _) =>
        if (rnd.nextBoolean()) Array.fill(w * h)(rnd.nextInt(256).toByte)
        else {
          val f = prev.clone()
          for (_ <- 0 to rnd.nextInt(5))
            f(rnd.nextInt(w * h)) = rnd.nextInt(256).toByte
          f
        }
      }.tail
      val avi = MsRleCodec.encodeAvi(w, h, pal, frames, keyEvery)
      val (fcc, dw, dh) = AviCodec.videoInfo(avi).getOrElse(fail(s"case $k: header"))
      assert(fcc == "MRLE" && dw == w && dh == h, s"case $k")
      assert(AviCodec.palette8(avi).exists(_.sameElements(pal)), s"case $k palette")
      val v = MsRleCodec.decode(dw, dh, pal,
        AviCodec.frames(avi).getOrElse(fail(s"case $k: demux")))
        .getOrElse(fail(s"case $k: decode (${w}x$h keyEvery=$keyEvery)"))
      v.frames.zip(frames).zipWithIndex.foreach { case ((got, px), i) =>
        assert(got.pixels.sameElements(px), s"case $k frame $i")
      }
    }
  }

  test("QOI: 60 random images round-trip exactly") {
    val rnd = new scala.util.Random(0x901F)
    for (k <- 0 until 60) {
      val w = 1 + rnd.nextInt(80)
      val h = 1 + rnd.nextInt(60)
      // mix op-pressure regimes: full-random (literals), tiny palettes
      // (index/run), smooth gradients (diff/luma)
      val pix = rnd.nextInt(3) match {
        case 0 => Array.fill(w * h)(rnd.nextInt(1 << 24))
        case 1 =>
          val pal = Array.fill(5)(rnd.nextInt(1 << 24))
          Array.fill(w * h)(pal(rnd.nextInt(pal.length)))
        case _ =>
          var c = rnd.nextInt(1 << 24)
          Array.fill(w * h) {
            val dr = rnd.nextInt(5) - 2; val dg = rnd.nextInt(5) - 2
            c = ((((c >> 16) + dr) & 0xFF) << 16) |
              ((((c >> 8) + dg) & 0xFF) << 8) | (((c & 0xFF) + dr) & 0xFF)
            c
          }
      }
      val q = QoiCodec.decode(QoiCodec.encode(w, h, pix))
        .getOrElse(fail(s"case $k: decode (${w}x$h)"))
      pix.indices.foreach { i =>
        val got = ((q.r(i) & 0xFF) << 16) | ((q.g(i) & 0xFF) << 8) | (q.b(i) & 0xFF)
        assert(got == pix(i), s"case $k pixel $i")
      }
    }
  }

  test("TIFF: 60 random images round-trip through random layouts") {
    val rnd = new scala.util.Random(0x71FF)
    for (k <- 0 until 60) {
      val w = 1 + rnd.nextInt(60)
      val h = 1 + rnd.nextInt(40)
      val layout = TiffCodec.Layout(
        compression = Seq(1, 5, 32773)(rnd.nextInt(3)),
        predictor = 1 + rnd.nextInt(2),
        bigEndian = rnd.nextBoolean(),
        rowsPerStrip = 1 + rnd.nextInt(h + 3))
      rnd.nextInt(3) match {
        case 0 =>
          val pix = Array.fill(w * h)(rnd.nextInt(1 << 24))
          val got = TiffCodec.decode(
            TiffCodec.encodeRgb(graft.images.ImageOps.Image(w, h, pix), layout))
            .getOrElse(fail(s"case $k rgb ($layout ${w}x$h)"))
          assert(got.pixels.sameElements(pix), s"case $k rgb")
        case 1 =>
          val v = Array.fill(w * h)(rnd.nextInt(256).toByte)
          val got = TiffCodec.decode(TiffCodec.encodeGray(w, h, v, layout))
            .getOrElse(fail(s"case $k gray ($layout ${w}x$h)"))
          assert((0 until w * h).forall { i =>
            val x = v(i) & 0xFF; got.pixels(i) == ((x << 16) | (x << 8) | x)
          }, s"case $k gray")
        case _ =>
          val idx = Array.fill(w * h)(rnd.nextInt(256).toByte)
          val pal = Array.fill(256)(rnd.nextInt(1 << 24))
          val got = TiffCodec.decode(
            TiffCodec.encodePalette(w, h, idx, pal, layout))
            .getOrElse(fail(s"case $k pal ($layout ${w}x$h)"))
          assert((0 until w * h).forall(i => got.pixels(i) == pal(idx(i) & 0xFF)),
            s"case $k pal")
      }
    }
  }

  test("JPEG: 60 random shapes round-trip the exactness corner and decode everywhere") {
    val rnd = new scala.util.Random(0x1CE6)
    for (k <- 0 until 60) {
      // block-constant even-gray tiling: every 8×8 block one even gray →
      // lossless by the codec's exactness-corner contract, any dims
      val bw = 1 + rnd.nextInt(6); val bh = 1 + rnd.nextInt(5)
      val w = bw * 8; val h = bh * 8
      val tiles = Array.fill(bh, bw)(2 * rnd.nextInt(128))
      val pix = Array.tabulate(w * h) { o =>
        val v = tiles(o / w / 8)((o % w) / 8)
        (v << 16) | (v << 8) | v
      }
      val q = 10 + rnd.nextInt(91)
      val ri = if (rnd.nextBoolean()) 1 + rnd.nextInt(7) else 0
      // tile-constant grays survive only at quality 50 (Q00=16 divides
      // 8·even); other qualities still must roundtrip within the DC
      // quantization step and decode identically through ImageIO
      val bytes = JpegCodec.encode(graft.images.ImageOps.Image(w, h, pix), 50, ri)
      val dec = JpegCodec.decode(bytes).getOrElse(fail(s"case $k: decode"))
      assert(dec.pixels.sameElements(pix), s"case $k: ${w}x$h ri=$ri drifted")
      val other = JpegCodec.encode(graft.images.ImageOps.Image(w, h, pix), q, ri)
      val viaEngine = JpegCodec.decode(other).getOrElse(fail(s"case $k: decode q=$q"))
      val viaImageIo = Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(other))).getOrElse(fail(s"case $k: ImageIO q=$q"))
      val theirs = viaImageIo.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xFFFFFF)
      assert(viaEngine.pixels.sameElements(theirs), s"case $k: q=$q diverged from ImageIO")
    }
  }

  test("decoders are total on truncations and bit flips of real encodings") {
    val rnd = new scala.util.Random(0x70701)
    val flac = FlacCodec.encode(8000, Array(Array.fill(5000)(rnd.nextInt(65536) - 32768)))
    val mp4 = Mp4Codec.muxFlac(flac).get
    val ogg = OggCodec.muxFlac(flac).get
    val mkv = MkvCodec.muxFlac(flac).get
    val avi = ZmbvCodec.encodeAvi(16, 16, ZmbvCodec.FmtPal8,
      Seq((Array.fill(256)(7.toByte), Array.fill(768)(3.toByte))))
    val ima = AdpcmCodec.encodeImaWav(8000, Array.tabulate(900)(t => t % 711))
    val ulaw = AdpcmCodec.encodeG711Wav(8000, Array.tabulate(500)(t => t * 31 % 40000 - 20000), mu = true)
    val pal768 = Array.fill(768)(5.toByte)
    val mrle = MsRleCodec.encodeAvi(16, 16, pal768,
      Seq(Array.fill(256)(9.toByte)))
    val qoi = QoiCodec.encode(16, 16, Array.tabulate(256)(_ * 65793 & 0xFFFFFF))
    val jpg = JpegCodec.encode(graft.images.ImageOps.Image(16, 16,
      Array.tabulate(256)(_ * 65793 & 0xFFFFFF)), 75)
    val tif = TiffCodec.encodeRgb(graft.images.ImageOps.Image(16, 16,
      Array.tabulate(256)(_ * 65793 & 0xFFFFFF)),
      TiffCodec.Layout(5, 2, bigEndian = false, 4))
    val aif = AiffCodec.encode(44100,
      Array(Array.tabulate(700)(t => t * 53 % 50000 - 25000)))
    for (_ <- 0 until 200) {
      def mangle(b: Array[Byte]): Array[Byte] = rnd.nextInt(3) match {
        case 0 => b.take(rnd.nextInt(b.length))
        case 1 =>
          val c = b.clone(); c(rnd.nextInt(c.length)) =
            (c(rnd.nextInt(c.length)) ^ (1 << rnd.nextInt(8))).toByte; c
        case _ => Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      }
      // none of these may throw — Option result is the entire contract
      FlacCodec.decode(mangle(flac))
      FlacCodec.streamLayout(mangle(flac))
      Mp4Codec.demux(mangle(mp4)).foreach(_.foreach(Mp4Codec.flacStream))
      OggCodec.packets(mangle(ogg))
      OggCodec.flacStream(mangle(ogg))
      MkvCodec.demux(mangle(mkv)).foreach(_.foreach(MkvCodec.flacStream))
      AviCodec.frames(mangle(avi))
      AviCodec.videoInfo(mangle(avi))
      ZmbvCodec.decode(16, 16, Seq(mangle(avi)))
      AdpcmCodec.decodePcm(mangle(ima))
      AdpcmCodec.decodePcm(mangle(ulaw))
      AviCodec.palette8(mangle(mrle))
      MsRleCodec.decode(16, 16, pal768, Seq(mangle(mrle)))
      QoiCodec.decode(mangle(qoi))
      JpegCodec.decode(mangle(jpg))
      TiffCodec.decode(mangle(tif))
      AiffCodec.decode(mangle(aif))
    }
    succeed
  }
}
