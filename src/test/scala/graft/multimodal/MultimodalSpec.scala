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
    // 48 KiB video at 16 KiB stride → 3 sampled frames with distinct indices
    val video = feats.filter(_.modality == "video").sortBy(_.frame_index)
    assert(video.map(_.frame_index).toSeq == Seq(0, 1, 2))
    // stub features are deterministic
    val again = Multimodal.extractFeatures(media).collect()
      .filter(_.modality == "video").sortBy(_.frame_index)
    assert(video.zip(again).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }
}
