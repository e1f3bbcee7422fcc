package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Mp4Codec contract: FLAC-in-MP4 mux → demux → FlacCodec round-trip,
  * sample-table generality (multi-chunk stsc/stco and 64-bit
  * largesize/co64 pinned by hand-assembled files, independent of the
  * muxer), MJPEG video tracks, totality on garbage, and Multimodal
  * routing (MP4-carried FLAC and MJPEG are REAL paths).
  */
class Mp4CodecSpec extends AnyFunSuite {

  private def pcm(i: Int, n: Int): Array[Int] =
    Array.tabulate(n)(t => ((i * 23 + t * 7) % 65536) - 32768)

  test("muxFlac → demux → flacStream → decode is lossless (multi-frame, real stts runs)") {
    val samples = pcm(3, 9001) // 3 FLAC frames: 4096+4096+809
    val flac = FlacCodec.encode(12000, Array(samples))
    val mp4 = Mp4Codec.muxFlac(flac).getOrElse(fail("muxFlac refused own encoder's stream"))
    val tracks = Mp4Codec.demux(mp4).getOrElse(fail("demux refused own mux"))
    assert(tracks.length == 1)
    val t = tracks.head
    assert(t.kind == "soun" && t.fourcc == "fLaC")
    assert(t.channels == 1 && t.sampleRate == 12000)
    assert(t.samples.length == 3, "one MP4 sample per FLAC frame")
    val rebuilt = Mp4Codec.flacStream(t).getOrElse(fail("no FLAC stream"))
    val decoded = FlacCodec.decode(rebuilt).getOrElse(fail("rebuilt stream undecodable"))
    assert(decoded.sampleRate == 12000)
    assert(decoded.channels(0).sameElements(samples))
  }

  test("mux is deterministic (byte-identical across calls)") {
    val flac = FlacCodec.encode(8000, Array(pcm(5, 5000)))
    val a = Mp4Codec.muxFlac(flac).get
    val b = Mp4Codec.muxFlac(flac).get
    assert(a.sameElements(b))
  }

  test("muxMjpeg → demux: vide track, dims, byte-identical samples") {
    val frames = (0 until 4).map(i => Array.tabulate(50 + i)(k => (k * 7 + i).toByte))
    val mp4 = Mp4Codec.muxMjpeg(32, 20, frames)
    val t = Mp4Codec.demux(mp4).getOrElse(fail("demux failed")).head
    assert(t.kind == "vide" && t.fourcc == "jpeg")
    assert(t.width == 32 && t.height == 20)
    assert(t.samples.length == 4)
    t.samples.zip(frames).foreach { case (got, want) => assert(got.sameElements(want)) }
    assert(Mp4Codec.flacStream(t).isEmpty, "video track must not masquerade as FLAC")
  }

  /** Minimal hand-assembled MP4 exercising paths the muxer never emits:
    * 4 samples split 3+1 across two chunks (two stsc runs), a 64-bit
    * largesize mdat, and co64 chunk offsets.
    */
  test("hand-assembled file pins multi-chunk stsc + co64 + largesize (independent of the muxer)") {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write((v >> 8) & 0xFF); bos.write(v & 0xFF) }
    def w32(v: Int): Unit = { w16(v >>> 16); w16(v & 0xFFFF) }
    def w64(v: Long): Unit = { w32((v >>> 32).toInt); w32((v & 0xFFFFFFFFL).toInt) }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    // ftyp (16 B at offset 0)
    w32(16); cc("ftyp"); cc("isom"); w32(0)
    // mdat with 64-bit largesize: header 16 B, payload = chunkA(3 samples
    // of 2 B) + 5 B gap + chunkB(1 sample of 4 B)
    val chunkA = 16 + 16 // file offset of first chunk payload
    w32(1); cc("mdat"); w64(16 + 6 + 5 + 4)
    Seq(1, 2, 3, 4, 5, 6).foreach(bos.write) // chunk A: samples [1,2],[3,4],[5,6]
    Seq(0, 0, 0, 0, 0).foreach(bos.write)    // dead gap (never referenced)
    val chunkB = chunkA + 6 + 5
    Seq(9, 8, 7, 6).foreach(bos.write)       // chunk B: sample [9,8,7,6]
    // moov: minimal trak with hand sample table, fourcc "xxxx"
    def fullbox(typ: String)(body: => Unit): Array[Byte] = {
      val inner = new java.io.ByteArrayOutputStream()
      val save = bos.toByteArray; bos.reset()
      body
      val payload = bos.toByteArray
      bos.reset(); bos.write(save, 0, save.length)
      inner.write(((payload.length + 8) >> 24) & 0xFF)
      inner.write(((payload.length + 8) >> 16) & 0xFF)
      inner.write(((payload.length + 8) >> 8) & 0xFF)
      inner.write((payload.length + 8) & 0xFF)
      inner.write(typ.getBytes("US-ASCII"))
      inner.write(payload)
      inner.toByteArray
    }
    val stsd = fullbox("stsd") {
      w32(0); w32(1)
      val e = fullbox("xxxx") { (0 until 6).foreach(_ => bos.write(0)); w16(1) }
      bos.write(e, 0, e.length)
    }
    val stsz = fullbox("stsz") { w32(0); w32(0); w32(4); w32(2); w32(2); w32(2); w32(4) }
    val stsc = fullbox("stsc") { w32(0); w32(2); w32(1); w32(3); w32(1); w32(2); w32(1); w32(1) }
    val co64 = fullbox("co64") { w32(0); w32(2); w64(chunkA.toLong); w64(chunkB.toLong) }
    val stbl = fullbox("stbl") { Seq(stsd, stsz, stsc, co64).foreach(b => bos.write(b, 0, b.length)) }
    val minf = fullbox("minf") { bos.write(stbl, 0, stbl.length) }
    val hdlr = fullbox("hdlr") { w32(0); w32(0); cc("soun"); w32(0); w32(0); w32(0); bos.write(0) }
    val mdia = fullbox("mdia") { Seq(hdlr, minf).foreach(b => bos.write(b, 0, b.length)) }
    val trak = fullbox("trak") { bos.write(mdia, 0, mdia.length) }
    val moov = fullbox("moov") { bos.write(trak, 0, trak.length) }
    bos.write(moov, 0, moov.length)

    val t = Mp4Codec.demux(bos.toByteArray).getOrElse(fail("hand-built file refused")).head
    assert(t.kind == "soun" && t.fourcc == "xxxx")
    assert(t.samples.map(_.toSeq) == Seq(Seq[Byte](1, 2), Seq[Byte](3, 4),
      Seq[Byte](5, 6), Seq[Byte](9, 8, 7, 6)),
      "3+1 samples across two co64 chunks, skipping the dead gap")
  }

  test("total on garbage: empty, truncated, no ftyp, crafted sizes") {
    assert(Mp4Codec.demux(Array[Byte]()).isEmpty)
    assert(Mp4Codec.demux("not an mp4 at all".getBytes).isEmpty)
    val good = Mp4Codec.muxFlac(FlacCodec.encode(8000, Array(pcm(1, 4097)))).get
    assert(Mp4Codec.demux(good.take(40)).isEmpty, "truncated moov")
    assert(Mp4Codec.demux(good.drop(16)).isEmpty, "missing ftyp")
    val evil = good.clone()
    evil(0) = 0x7F; evil(1) = 0xFF.toByte // ftyp size near 2^31
    assert(Mp4Codec.demux(evil).isEmpty)
  }

  test("Multimodal routes MP4-carried FLAC audio through the real spectral path") {
    val samples = pcm(9, 6000)
    val mp4 = Mp4Codec.muxFlac(FlacCodec.encode(16000, Array(samples))).get
    val row = Multimodal.MediaRow("a.m4a", "audio", "application/m4a", mp4, Map())
    val feats = new Multimodal.DefaultDecoder(strict = true).features(row)
    assert(feats.length == 1 && feats.head.feature_real)
    assert(feats.head.width == 16000 && feats.head.height == 1) // (rate, channels)
    // identical features to the same PCM arriving as a bare FLAC file
    val bare = new Multimodal.DefaultDecoder(strict = true)
      .features(Multimodal.MediaRow("a.flac", "audio", "application/flac",
        FlacCodec.encode(16000, Array(samples)), Map()))
    assert(feats.head.feature.sameElements(bare.head.feature))
  }

  test("Multimodal routes MP4-carried MJPEG video through the real frame path") {
    // real JPEGs via ImageIO so the decode step is genuine
    val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, 0x336699)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val mp4 = Mp4Codec.muxMjpeg(8, 6, Seq(jb.toByteArray, jb.toByteArray))
    val row = Multimodal.MediaRow("v.mp4", "video", "application/mp4", mp4, Map())
    val feats = new Multimodal.DefaultDecoder(strict = true).features(row)
    assert(feats.length == 2)
    assert(feats.forall(f => f.feature_real && f.width == 8 && f.height == 6))
  }

  test("strict mode still throws on video payloads no real codec handles") {
    val row = Multimodal.MediaRow("v.mp4", "video", "application/mp4",
      Array.fill(4096)(0x5A.toByte), Map())
    intercept[UnsupportedOperationException] {
      new Multimodal.DefaultDecoder(strict = true).features(row)
    }
  }
}
