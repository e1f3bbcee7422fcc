package graft.multimodal

import graft.SparkSpec
import graft.images.ImageOps
import java.nio.file.{Files, Paths}

class MultimodalSpec extends SparkSpec {

  private lazy val mediaDir: String = {
    val root = Files.createTempDirectory("graft_media").toString
    val img = ImageOps.Image(10, 20, Array.fill(200)(0x00FF00))
    Files.write(Paths.get(root, "green.png"), ImageOps.encodePng(img))
    Files.write(Paths.get(root, "clip.wav"), Array.fill[Byte](2048)(3))
    Files.write(Paths.get(root, "movie.mp4"), Array.fill[Byte](48 * 1024)(5))
    root
  }

  test("scanMedia infers modality and keeps payload opaque") {
    val media = Multimodal.scanMedia(spark, mediaDir).collect()
    val byId = media.map(m => m.asset_id -> m).toMap
    assert(byId("green.png").modality == "image")
    assert(byId("clip.wav").modality == "audio")
    assert(byId("movie.mp4").modality == "video")
    assert(byId("movie.mp4").content.length == 48 * 1024)
    assert(byId("clip.wav").meta("length") == "2048")
  }

  test("extractFeatures: real image decode, stubbed audio/video, frame sampling") {
    val media = Multimodal.scanMedia(spark, mediaDir)
    val feats = Multimodal.extractFeatures(media).collect()
    val img = feats.filter(_.modality == "image")
    assert(img.length == 1 && img.head.width == 10 && img.head.height == 20)
    assert(img.head.feature(1) == 1.0f) // pure green → g channel 1.0
    val audio = feats.filter(_.modality == "audio")
    assert(audio.length == 1 && audio.head.feature.length == 5)
    // fake-codec rows are flagged; the real image decode is not
    assert(img.head.feature_real && !audio.head.feature_real)
    // 48 KiB video at 16 KiB stride → 3 sampled frames with distinct indices
    val video = feats.filter(_.modality == "video").sortBy(_.frame_index)
    assert(video.map(_.frame_index).toSeq == Seq(0, 1, 2))
    // stub features are deterministic
    val again = Multimodal.extractFeatures(media).collect()
      .filter(_.modality == "video").sortBy(_.frame_index)
    assert(video.zip(again).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("WavCodec: RIFF PCM16 roundtrip preserves rate/channels/length") {
    val bytes = WavCodec.synthesize(16000, Seq(440.0 -> 0.5), 0.25)
    val wav = WavCodec.decode(bytes).get
    assert(wav.sampleRate == 16000 && wav.channels == 1)
    assert(wav.samples.length == 4000)
    assert(wav.samples.forall(s => s >= -1f && s <= 1f))
    // non-WAV payloads refuse to decode (fall back to the fake path)
    assert(WavCodec.decode(Array.fill[Byte](512)(7)).isEmpty)
  }

  test("WavCodec band energies localize a pure tone in the right band") {
    // 5 bands over [0, 8 kHz): 1 kHz → band 0, 5 kHz → band 3
    val lo = WavCodec.decode(
      WavCodec.synthesize(16000, Seq(1000.0 -> 0.7), 1.0)).get
    val eLo = WavCodec.bandEnergies(lo)
    assert(eLo.indexOf(eLo.max) == 0, eLo.toSeq)
    assert(eLo(0) > 0.9f)
    val hi = WavCodec.decode(
      WavCodec.synthesize(16000, Seq(5000.0 -> 0.7), 1.0)).get
    val eHi = WavCodec.bandEnergies(hi)
    assert(eHi.indexOf(eHi.max) == 3, eHi.toSeq)
    assert(math.abs(eLo.sum - 1f) < 1e-3 && math.abs(eHi.sum - 1f) < 1e-3)
  }

  test("decoders are TOTAL on arbitrary bytes: never throw, refuse cleanly") {
    // a corpus-scale decoder sees every malformed payload eventually —
    // fuzz with deterministic pseudo-random bytes, truncations of valid
    // containers, and adversarial header fragments
    val rnd = new scala.util.Random(42)
    val wav = WavCodec.synthesize(8000, Seq(500.0 -> 0.5), 0.1)
    val avi = AviCodec.synthesize(Seq(Array[Byte](1, 2, 3)))
    val cases: Seq[Array[Byte]] =
      (0 until 200).map(_ => Array.fill(rnd.nextInt(256))(rnd.nextInt.toByte)) ++
        (0 until wav.length by 7).map(n => wav.take(n)) ++
        (0 until avi.length).map(n => avi.take(n)) ++
        Seq("RIFF".getBytes, "RIFFxxxxWAVE".getBytes, "RIFFxxxxAVI ".getBytes,
          Array.emptyByteArray)
    cases.foreach { bytes =>
      WavCodec.decode(bytes)       // Option result, must not throw
      AviCodec.frames(bytes)       // Option result, must not throw
    }
    // corrupted chunk length inside a valid container: refuse, don't read OOB
    val evil = avi.clone()
    evil(16) = 0x7F.toByte; evil(17) = 0x7F.toByte // huge LIST size
    AviCodec.frames(evil)
    val evilWav = wav.clone()
    evilWav(40) = 0xFF.toByte; evilWav(41) = 0x7F.toByte // huge data size
    WavCodec.decode(evilWav)
    // near-2^31 chunk length: `pos + 8 + len` wraps negative in Int and
    // would slip past the bound check — all 4 length bytes set
    def put32(b: Array[Byte], o: Int, v: Int): Unit =
      (0 until 4).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xFF).toByte)
    val ovAvi = avi.clone(); put32(ovAvi, 16, 0x7FFFFFF0)
    assert(AviCodec.frames(ovAvi).exists(_.isEmpty)) // refuses the chunk, no throw
    val ovAvi2 = avi.clone(); put32(ovAvi2, 28, 0x7FFFFFF0) // frame chunk len
    AviCodec.frames(ovAvi2)
    val ovWav = wav.clone(); put32(ovWav, 40, 0x7FFFFFF0) // data chunk len
    assert(WavCodec.decode(ovWav).isEmpty)
    val ovWav2 = wav.clone(); put32(ovWav2, 16, 0x7FFFFFF0) // fmt chunk len
    assert(WavCodec.decode(ovWav2).isEmpty)
  }

  test("strict mode fails loudly on fake-codec payloads, passes real ones") {
    import spark.implicits._
    val mp3ish = Multimodal.MediaRow("song.mp3", "audio", "application/mp3",
      Array.fill[Byte](512)(9), Map.empty[String, String])
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeaturesStrict(Seq(mp3ish).toDS()).collect()
    }
    assert(ex.getMessage.contains("strict mode") ||
      Option(ex.getCause).exists(_.getMessage.contains("strict mode")))
    // real WAV path is unchanged under strict
    val wavRow = Multimodal.MediaRow("tone.wav", "audio", "application/wav",
      WavCodec.synthesize(8000, Seq(500.0 -> 0.5), 0.2), Map.empty[String, String])
    val ok = Multimodal.extractFeaturesStrict(Seq(wavRow).toDS()).collect()
    assert(ok.length == 1 && ok.head.feature_real)
    // and so is the real MJPEG-AVI path
    val avi = AviCodec.synthesize(Seq(ImageOps.encodePng(
      ImageOps.Image(4, 4, Array.fill(16)(0xFF0000)))))
    val aviRow = Multimodal.MediaRow("c.avi", "video", "application/avi",
      avi, Map.empty[String, String])
    val vf = Multimodal.extractFeaturesStrict(Seq(aviRow).toDS()).collect()
    assert(vf.length == 1 && vf.head.feature_real)
  }

  test("video frame sampling spreads across the whole clip (ceiling stride)") {
    import spark.implicits._
    // 40 frames > MaxFrames=32: floor stride would keep frames 0..31 and
    // drop the tail; ceiling stride (2) samples 0,2,4,...,38 — 20 frames
    // covering the full clip
    val png = ImageOps.encodePng(ImageOps.Image(2, 2, Array.fill(4)(0x00FF00)))
    val avi = AviCodec.synthesize(Seq.fill(40)(png))
    val media = Seq(Multimodal.MediaRow("long.avi", "video", "application/avi",
      avi, Map.empty[String, String])).toDS()
    val idx = Multimodal.extractFeatures(media).collect()
      .map(_.frame_index).sorted.toSeq
    assert(idx.size <= 32, s"cap violated: ${idx.size}")
    assert(idx == (0 until 40 by 2), idx)
  }

  test("AviCodec: frame payloads roundtrip through a minimal RIFF AVI") {
    val f1 = Array[Byte](1, 2, 3)
    val f2 = Array[Byte](4, 5, 6, 7)
    val avi = AviCodec.synthesize(Seq(f1, f2))
    val back = AviCodec.frames(avi).get
    assert(back.length == 2)
    assert(back(0).sameElements(f1) && back(1).sameElements(f2))
    assert(AviCodec.frames(Array.fill[Byte](64)(9)).isEmpty) // non-AVI
  }

  test("extractFeatures runs the REAL frame-decode path for MJPEG-AVI") {
    import spark.implicits._
    val frames = Seq(0xFF0000, 0x00FF00, 0x0000FF).map { c =>
      ImageOps.encodePng(ImageOps.Image(8, 6, Array.fill(48)(c)))
    }
    val avi = AviCodec.synthesize(frames)
    val media = Seq(Multimodal.MediaRow("clip.avi", "video", "application/avi",
      avi, Map.empty[String, String])).toDS()
    val fs = Multimodal.extractFeatures(media).collect().sortBy(_.frame_index)
    assert(fs.length == 3 && fs.forall(f => f.width == 8 && f.height == 6))
    // per-frame average color survives the real decode exactly (PNG)
    assert(fs(0).feature(0) == 1.0f && fs(1).feature(1) == 1.0f &&
      fs(2).feature(2) == 1.0f)
  }

  test("extractFeatures runs the REAL spectral path for a decodable WAV") {
    import spark.implicits._
    val bytes = WavCodec.synthesize(8000, Seq(1000.0 -> 0.6), 1.0)
    val media = Seq(Multimodal.MediaRow("tone.wav", "audio", "application/wav",
      bytes, Map.empty[String, String])).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.width == 8000 && f.height == 1) // (sampleRate, channels)
    // 1 kHz at 8 kHz sr → band 1 of 5 over [0, 4 kHz)
    assert(f.feature.indexOf(f.feature.max) == 1, f.feature.toSeq)
  }

  test("a stray non-media file skips in permissive mode (no row), fails in strict") {
    import spark.implicits._
    val stray = Multimodal.MediaRow("README.txt", "unknown", "application/txt",
      "not media".getBytes, Map.empty[String, String])
    val img = Multimodal.MediaRow("ok.png", "image", "application/png",
      ImageOps.encodePng(ImageOps.Image(2, 2, Array.fill(4)(0x123456))),
      Map.empty[String, String])
    // permissive: the stray file contributes NOTHING — no fake row a
    // downstream consumer could mistake for data — and the ingest lives
    val feats = Multimodal.extractFeatures(Seq(stray, img).toDS()).collect()
    assert(feats.map(_.asset_id).toSeq == Seq("ok.png"))
    // strict: loud failure, same contract as any undecodable payload
    intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeaturesStrict(Seq(stray).toDS()).collect()
    }
  }
}
