package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Seeded cross-codec fuzz: many randomized round-trips per codec chain
  * (shapes the targeted specs don't enumerate), plus totality of every
  * decoder on adversarial bytes — truncations and bit flips of REAL
  * encodings, not just noise. All seeds fixed: failures reproduce.
  */
class CodecFuzzSpec extends AnyFunSuite {

  test("FLAC: 60 random streams round-trip bare AND through MP4") {
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

  test("decoders are total on truncations and bit flips of real encodings") {
    val rnd = new scala.util.Random(0x70701)
    val flac = FlacCodec.encode(8000, Array(Array.fill(5000)(rnd.nextInt(65536) - 32768)))
    val mp4 = Mp4Codec.muxFlac(flac).get
    val avi = ZmbvCodec.encodeAvi(16, 16, ZmbvCodec.FmtPal8,
      Seq((Array.fill(256)(7.toByte), Array.fill(768)(3.toByte))))
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
      AviCodec.frames(mangle(avi))
      AviCodec.videoInfo(mangle(avi))
      ZmbvCodec.decode(16, 16, Seq(mangle(avi)))
    }
    succeed
  }
}
