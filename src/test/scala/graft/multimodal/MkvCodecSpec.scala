package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** MkvCodec contract: RFC 8794 EBML framing pinned by HAND-ASSEMBLED
  * elements (own VINT writer, sharing no code with the muxer under
  * test) — multi-byte element IDs and sizes, nested masters, multi-byte
  * block track numbers, Xiph lacing across a 255 boundary, fixed-size
  * lacing, BlockGroup/Block, float32 SamplingFrequency — plus
  * FLAC-in-MKV mux → demux → FlacCodec round-trip (the rebuilt native
  * stream is byte-identical to the encoder's), the documented rejection
  * subset (unknown-size elements, EBML lacing), totality on garbage,
  * the int16 cluster-timestamp bound (muxFlac returns None instead of
  * throwing), and Multimodal routing (MKV-carried FLAC and MJPEG are
  * REAL paths).
  */
class MkvCodecSpec extends AnyFunSuite {

  private def pcm(i: Int, n: Int): Array[Int] =
    Array.tabulate(n)(t => ((i * 37 + t * 13) % 65536) - 32768)

  // ---- independent EBML assembly (written from RFC 8794, not MkvCodec)

  /** Size VINT at a CHOSEN width (the codec must accept non-minimal). */
  private def sizeVint(v: Long, width: Int): Array[Byte] = {
    val out = new Array[Byte](width)
    var i = 0
    while (i < width) {
      out(width - 1 - i) = ((v >>> (8 * i)) & 0xFF).toByte
      i += 1
    }
    out(0) = (out(0) | (0x80 >> (width - 1))).toByte
    out
  }

  private def idBytes(id: Long): Array[Byte] = {
    var len = 1
    while ((id >>> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((id >>> (8 * (len - 1 - i))) & 0xFF).toByte)
  }

  private def el(id: Long, payload: Array[Byte], sizeWidth: Int = 0): Array[Byte] = {
    val w = if (sizeWidth > 0) sizeWidth else {
      var k = 1
      while (payload.length >= (1L << (7 * k)) - 1) k += 1
      k
    }
    idBytes(id) ++ sizeVint(payload.length.toLong, w) ++ payload
  }

  private def u(v: Long): Array[Byte] = {
    var len = 1
    while ((v >>> (8 * len)) != 0) len += 1
    Array.tabulate(len)(i => ((v >>> (8 * (len - 1 - i))) & 0xFF).toByte)
  }

  private def ebml(): Array[Byte] =
    el(0x1A45DFA3L, el(0x4282L, "matroska".getBytes("US-ASCII")))

  /** TrackEntry with float32 SamplingFrequency (the muxer only writes
    * float64, so this pins the 4-byte branch) and a 2-byte track number
    * in blocks.
    */
  private def audioTrack(num: Long, rate: Float, ch: Int, priv: Array[Byte]): Array[Byte] = {
    val f32 = java.lang.Float.floatToIntBits(rate)
    el(0xAEL,
      el(0xD7L, u(num)) ++
        el(0x83L, u(2)) ++
        el(0x86L, "A_FLAC".getBytes("US-ASCII")) ++
        el(0x63A2L, priv) ++
        el(0xE1L,
          el(0xB5L, Array.tabulate(4)(i => ((f32 >>> (8 * (3 - i))) & 0xFF).toByte)) ++
            el(0x9FL, u(ch.toLong))))
  }

  /** Block payload: track VINT (hand-encoded at any width), ts, flags,
    * frames under the requested lacing.
    */
  private def blockPayload(track: Long, flags: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    if (track < 0x80) out += (0x80 | track.toInt).toByte
    else { // 2-byte vint: 01xxxxxx xxxxxxxx
      out += (0x40 | (track >> 8).toInt).toByte
      out += (track & 0xFF).toByte
    }
    out += 0; out += 0 // relative timestamp
    out += flags.toByte
    (flags >> 1) & 0x03 match {
      case 0 =>
        require(frames.length == 1); out ++= frames.head
      case 2 => // Xiph
        out += (frames.length - 1).toByte
        frames.dropRight(1).foreach { f =>
          var s = f.length
          while (s >= 255) { out += 255.toByte; s -= 255 }
          out += s.toByte
        }
        frames.foreach(out ++= _)
      case 1 => // fixed
        out += (frames.length - 1).toByte
        frames.foreach(out ++= _)
      case _ => fail("EBML lacing not assembled here")
    }
    out.toArray
  }

  test("hand-assembled file: Xiph lacing (incl. a 255-multiple frame) + fixed lacing + BlockGroup") {
    val priv = Array.tabulate(50)(k => (k * 7 % 256).toByte)
    val fA = Array.tabulate(255)(k => (k % 97).toByte) // 255 → lacing 255,0
    val fB = Array[Byte](1, 2, 3)
    val fC = Array.tabulate(300)(k => (k % 89).toByte)
    val fD = Array.tabulate(4)(k => (k + 9).toByte)
    val fE = Array.tabulate(4)(k => (k + 40).toByte)
    val cluster = el(0x1F43B675L,
      el(0xE7L, u(0)) ++
        el(0xA3L, blockPayload(300, 0x04, Seq(fA, fB, fC))) ++ // Xiph
        el(0xA0L, el(0xA1L, blockPayload(300, 0x02, Seq(fD, fE))))) // fixed, in BlockGroup
    val seg = el(0x18538067L, el(0x1654AE6BL, audioTrack(300, 12345.0f, 2, priv)) ++ cluster)
    val tracks = MkvCodec.demux(ebml() ++ seg).getOrElse(fail("well-formed file rejected"))
    assert(tracks.length == 1)
    val t = tracks.head
    assert(t.kind == "soun" && t.codecId == "A_FLAC" && t.trackNumber == 300)
    assert(t.sampleRate == 12345 && t.channels == 2)
    assert(t.codecPrivate.sameElements(priv))
    assert(t.frames.length == 5)
    assert(t.frames(0).sameElements(fA) && t.frames(1).sameElements(fB) &&
      t.frames(2).sameElements(fC) && t.frames(3).sameElements(fD) &&
      t.frames(4).sameElements(fE))
  }

  test("non-minimal size VINTs are accepted (RFC 8794 allows any width)") {
    val frame = Array[Byte](5, 6, 7)
    val cluster = el(0x1F43B675L,
      el(0xE7L, u(0)) ++ el(0xA3L, blockPayload(1, 0x00, Seq(frame)), sizeWidth = 4),
      sizeWidth = 6)
    val seg = el(0x18538067L,
      el(0x1654AE6BL, audioTrack(1, 8000.0f, 1, Array[Byte](1)), sizeWidth = 3) ++ cluster,
      sizeWidth = 8)
    val tracks = MkvCodec.demux(ebml() ++ seg).getOrElse(fail("non-minimal sizes rejected"))
    assert(tracks.head.frames.length == 1)
    assert(tracks.head.frames.head.sameElements(frame))
  }

  test("documented rejection subset: unknown-size element, EBML lacing") {
    // unknown-size Segment (size byte 0xFF = all ones)
    val unknown = ebml() ++ idBytes(0x18538067L) ++ Array[Byte](0xFF.toByte) ++ Array[Byte](1, 2)
    assert(MkvCodec.demux(unknown).isEmpty, "unknown-size element must reject")
    // EBML lacing (flag bits 0b11 → 0x06)
    val lacedEbml = el(0x1F43B675L,
      el(0xE7L, u(0)) ++
        el(0xA3L, Array[Byte](0x81.toByte, 0, 0, 0x06, 1) ++ Array[Byte](9, 9)))
    val seg = el(0x18538067L, el(0x1654AE6BL, audioTrack(1, 8000.0f, 1, Array[Byte](1))) ++ lacedEbml)
    assert(MkvCodec.demux(ebml() ++ seg).isEmpty, "EBML lacing must reject")
  }

  test("malformed streams are rejected, never thrown on (truncation at every prefix)") {
    val flac = FlacCodec.encode(9000, Array(pcm(3, 9000)))
    val mkv = MkvCodec.muxFlac(flac).getOrElse(fail("mux refused"))
    (0 until mkv.length by 11).foreach { k =>
      assert(MkvCodec.demux(mkv.take(k)).isEmpty, s"prefix $k must reject")
    }
    // child overrunning its parent
    val badChild = el(0x18538067L, idBytes(0x1654AE6BL) ++ sizeVint(1000, 2) ++ Array[Byte](1))
    assert(MkvCodec.demux(ebml() ++ badChild).isEmpty)
  }

  test("totality: arbitrary bytes never throw") {
    var seed = 7L
    (0 until 200).foreach { k =>
      val b = Array.fill(k * 13 % 700) {
        seed = seed * 6364136223846793005L + 1442695040888963407L
        (seed >>> 40).toByte
      }
      MkvCodec.demux(b)
    }
    val nearMiss = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte) ++ Array.fill[Byte](40)(0x55)
    assert(MkvCodec.demux(nearMiss).isEmpty)
  }

  test("muxFlac → flacStream is byte-identical to the original native stream") {
    val flac = FlacCodec.encode(9000, Array(pcm(2, 9500))) // 3 frames
    val mkv = MkvCodec.muxFlac(flac).getOrElse(fail("muxFlac refused own encoder's stream"))
    val tracks = MkvCodec.demux(mkv).getOrElse(fail("own mux rejected"))
    val rebuilt = MkvCodec.flacStream(tracks.head).getOrElse(fail("no FLAC stream"))
    assert(rebuilt.sameElements(flac),
      "CodecPrivate carries fLaC + STREAMINFO(last); blocks carry whole frames — rebuild must be exact")
  }

  test("muxFlac: one SimpleBlock per FLAC frame, clusters split every 8; decode is lossless") {
    val samples = pcm(5, 40000) // 10 frames → clusters of 8 + 2
    val flac = FlacCodec.encode(9077, Array(samples))
    val mkv = MkvCodec.muxFlac(flac).get
    val t = MkvCodec.demux(mkv).get.head
    assert(t.frames.length == 10)
    assert(t.sampleRate == 9077 && t.channels == 1)
    val decoded = FlacCodec.decode(MkvCodec.flacStream(t).get)
      .getOrElse(fail("rebuilt stream undecodable"))
    assert(decoded.channels(0).sameElements(samples))
    // two clusters on the wire: count Cluster element IDs at top nesting
    val clusterId = Array[Byte](0x1F, 0x43, 0xB6.toByte, 0x75)
    val nClusters = mkv.sliding(4).count(_.sameElements(clusterId))
    assert(nClusters == 2, "10 frames at clusterEvery=8 must write 2 clusters")
  }

  test("mux is deterministic (byte-identical across calls)") {
    val flac = FlacCodec.encode(9000, Array(pcm(7, 12000)))
    val a = MkvCodec.muxFlac(flac).get
    val b = MkvCodec.muxFlac(flac).get
    assert(a.sameElements(b))
  }

  test("int16 cluster-timestamp bound: muxFlac returns None, never throws (ADVICE r7)") {
    // rate 1000 Hz → 4096 ms per frame; clusterEvery=100 puts frame 9 of
    // a cluster at rel ts 9*4096 = 36864 > 32767
    val flac = FlacCodec.encode(1000, Array(pcm(1, 41000)))
    assert(MkvCodec.muxFlac(flac, clusterEvery = 100).isEmpty,
      "out-of-int16 relative timestamp must yield None")
    assert(MkvCodec.muxFlac(flac, clusterEvery = 8).isDefined,
      "default clustering keeps rel ts in range for the same input")
  }

  test("Multimodal routes MKV-FLAC through the REAL audio path (identical features to bare FLAC)") {
    val samples = pcm(9, 8131)
    val flac = FlacCodec.encode(12000, Array(samples))
    val mkv = MkvCodec.muxFlac(flac).get
    val dec = new Multimodal.DefaultDecoder(strict = true) // must not hit the fake seam
    val viaMkv = dec.features(
      Multimodal.MediaRow("a1", "audio", "application/mka", mkv, Map.empty))
    val viaFlac = dec.features(
      Multimodal.MediaRow("a2", "audio", "application/flac", flac, Map.empty))
    assert(viaMkv.length == 1 && viaMkv.head.feature_real)
    assert(viaMkv.head.width == 12000 && viaMkv.head.height == 1)
    assert(viaMkv.head.feature.sameElements(viaFlac.head.feature),
      "container must not change the featurization")
  }

  test("VfW mapping: ZMBV payloads round-trip through muxVfw (BITMAPINFOHEADER CodecPrivate)") {
    val w = 12; val h = 10
    val frames = (0 until 4).map { f =>
      (Array.tabulate(w * h)(o => ((o * 3 + f * 11) % 256).toByte),
        Array.tabulate(768)(j => ((j * 7) % 256).toByte))
    }
    val payloads = ZmbvCodec.encode(w, h, ZmbvCodec.FmtPal8, frames, keyEvery = 2)
    val mkv = MkvCodec.muxVfw("ZMBV", w, h, 8, payloads)
    val t = MkvCodec.demux(mkv).getOrElse(fail("own vfw mux rejected")).head
    assert(t.codecId == "V_MS/VFW/FOURCC")
    assert(MkvCodec.vfwInfo(t).contains(("ZMBV", w, h)))
    val video = ZmbvCodec.decode(w, h, t.frames).getOrElse(fail("zmbv decode"))
    video.frames.zip(frames).zipWithIndex.foreach { case ((got, (px, _)), i) =>
      assert(got.pixels.sameElements(px), s"frame $i pixels")
    }
    // strict Multimodal routing: real, correct dims
    val dec = new Multimodal.DefaultDecoder(strict = true)
    val rows = dec.features(
      Multimodal.MediaRow("z1", "video", "application/mkv", mkv, Map.empty))
    assert(rows.length == 4 && rows.forall(r => r.feature_real && r.width == w && r.height == h))
  }

  test("VfW mapping: MS-RLE with its palette in CodecPrivate quads routes through the real path") {
    val w = 16; val h = 12
    val pal = Array.tabulate(768)(j => ((j * 11 + 5) % 256).toByte)
    val frames = (0 until 3).map(f =>
      Array.tabulate(w * h)(o => ((o + f * 17) % 256).toByte))
    // reuse the MS-RLE encoder's payloads by demuxing its own AVI
    val avi = MsRleCodec.encodeAvi(w, h, pal, frames, keyEvery = 2)
    val payloads = AviCodec.frames(avi).getOrElse(fail("avi demux"))
    val mkv = MkvCodec.muxVfw("MRLE", w, h, 8, payloads, pal)
    val t = MkvCodec.demux(mkv).getOrElse(fail("own vfw mux rejected")).head
    assert(MkvCodec.vfwInfo(t).contains(("MRLE", w, h)))
    assert(MkvCodec.vfwPalette8(t).exists(_.sameElements(pal)),
      "RGBQUAD palette after the header must round-trip to rgb triples")
    val video = MsRleCodec.decode(w, h, pal, t.frames).getOrElse(fail("mrle decode"))
    video.frames.zip(frames).zipWithIndex.foreach { case ((got, px), i) =>
      assert(got.pixels.sameElements(px), s"frame $i pixels")
    }
    val dec = new Multimodal.DefaultDecoder(strict = true)
    val rows = dec.features(
      Multimodal.MediaRow("m1", "video", "application/mkv", mkv, Map.empty))
    assert(rows.length == 3 && rows.forall(r => r.feature_real && r.width == w && r.height == h))
  }

  test("Multimodal routes MJPEG-in-MKV through the REAL video path (per-frame ImageIO decode)") {
    // three 8×6 solid JPEGs via ImageIO (the same encoder the decode
    // path uses), muxed as V_MJPEG
    val jpegs = (0 until 3).map { i =>
      val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(40 * i + 20, 40 * i + 30, 40 * i + 40))
      g.fillRect(0, 0, 8, 6)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mkv = MkvCodec.muxMjpeg(8, 6, jpegs)
    val t = MkvCodec.demux(mkv).getOrElse(fail("own mjpeg mux rejected")).head
    assert(t.kind == "vide" && t.codecId == "V_MJPEG" && t.width == 8 && t.height == 6)
    assert(t.frames.length == 3)
    val dec = new Multimodal.DefaultDecoder(strict = true)
    val rows = dec.features(
      Multimodal.MediaRow("v1", "video", "application/mkv", mkv, Map.empty))
    assert(rows.length == 3 && rows.forall(_.feature_real))
    assert(rows.forall(r => r.width == 8 && r.height == 6))
  }
}
