package graft.multimodal

import graft.images.ImageOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column model: media as opaque `binary` columns plus typed
  * metadata, with decode / feature-extract / frame-sample as per-partition
  * transforms (the Scala analog of pandas-UDF batch plumbing).
  *
  * The Spark-side plumbing — schema, partition amortization, batch shape —
  * is real and tested, and so are the pure-JVM decode paths: images via
  * [[graft.images.ImageOps]] (ImageIO), RIFF PCM audio via [[WavCodec]],
  * MJPEG-AVI video via [[AviCodec]]. Only inter-frame video codecs and
  * compressed audio (absent from this environment) remain deterministic
  * stubs behind the [[MediaDecoder]] seam (clearly marked). Swapping a
  * production decoder in changes one constructor, not the pipeline.
  */
object Multimodal {

  /** One media asset: the universal training-data row shape. */
  final case class MediaRow(
      asset_id: String,
      modality: String,           // "image" | "audio" | "video"
      mime: String,
      content: Array[Byte],       // opaque payload — never parsed by Spark itself
      meta: Map[String, String])  // typed-ish sidecar (dims, duration, source)

  /** Extracted features, one row per asset (or per sampled frame).
    * `feature_real = false` marks a deterministic stand-in produced where
    * this environment has no codec (mp3/flac, inter-frame video) — a
    * downstream consumer can filter or fail on fakes instead of silently
    * training on them.
    */
  final case class MediaFeatures(
      asset_id: String,
      modality: String,
      frame_index: Int,           // 0 for whole-asset features
      width: Int, height: Int,
      feature: Array[Float],      // small fixed-width vector
      feature_real: Boolean)

  /** Decoder seam: one instance per partition (model/codec load amortized,
    * same pattern as [[graft.images.Detection.Detector]]).
    */
  trait MediaDecoder extends Serializable {
    /** Decode + featurize; multiple rows = sampled frames. */
    def features(row: MediaRow): Seq[MediaFeatures]
  }

  /** Real image + WAV-audio + MJPEG-AVI paths, STUBBED compressed-codec
    * paths.
    *
    * Images decode via [[graft.images.ImageOps]]; RIFF PCM audio decodes
    * via [[WavCodec]] into real spectral band energies (pure JVM, no
    * native codec). Compressed audio (mp3/flac) and inter-frame video
    * "decode" remain deterministic fakes (hash-derived features of the
    * payload bytes) standing in for codecs this container doesn't have —
    * the schema, batching, and partition flow are exactly what a real
    * decoder would use. Fake rows carry `feature_real = false`; with
    * `strict = true` the fake paths throw instead, so a pipeline can
    * never silently train on stand-in numbers.
    */
  final class DefaultDecoder(frameStride: Int = 16, strict: Boolean = false)
      extends MediaDecoder {
    private val MaxFrames = 32 // per-clip frame-sample cap (bounded output)

    private def noCodec(row: MediaRow, what: String): Unit =
      if (strict) throw new UnsupportedOperationException(
        s"strict mode: no $what codec for asset ${row.asset_id} " +
          s"(${row.mime}); refusing to emit fake features")

    def features(row: MediaRow): Seq[MediaFeatures] = row.modality match {
      case "image" =>
        ImageOps.decode(row.content).toSeq.map { img =>
          val (r, g, b) = ImageOps.averageColor(img)
          MediaFeatures(row.asset_id, "image", 0, img.width, img.height,
            Array(r / 255f, g / 255f, b / 255f, img.width.toFloat, img.height.toFloat),
            feature_real = true)
        }
      case "audio" =>
        WavCodec.decode(row.content) match {
          case Some(wav) =>
            // real path: 5 relative band energies; (width, height) carry
            // (sampleRate, channels) — the audio twin of image dims
            Seq(MediaFeatures(row.asset_id, "audio", 0,
              wav.sampleRate, wav.channels, WavCodec.bandEnergies(wav),
              feature_real = true))
          case None =>
            // ??? — compressed codec (mp3/flac) absent: deterministic fake
            noCodec(row, "compressed-audio")
            Seq(MediaFeatures(row.asset_id, "audio", 0, 0, 0,
              fakeFeature(row.content, 5), feature_real = false))
        }
      case "video" =>
        AviCodec.frames(row.content) match {
          case Some(payloads) if payloads.nonEmpty =>
            // real path: MJPEG-AVI — every frame is a JPEG ImageIO reads;
            // sample ≤ MaxFrames evenly across the WHOLE clip (ceiling
            // stride: length/MaxFrames keeps only the first MaxFrames
            // frames of a 33..63-frame clip and drops the tail)
            val stride = (payloads.length + MaxFrames - 1) / MaxFrames
            payloads.zipWithIndex
              .collect { case (p, i) if i % stride == 0 => p -> i }
              .take(MaxFrames)
              .flatMap { case (p, i) =>
                ImageOps.decode(p).map { img =>
                  val (r, g, b) = ImageOps.averageColor(img)
                  MediaFeatures(row.asset_id, "video", i, img.width, img.height,
                    Array(r / 255f, g / 255f, b / 255f,
                      img.width.toFloat, img.height.toFloat),
                    feature_real = true)
                }
              }
          case _ =>
            // ??? — inter-frame codec (H.264/VP9) absent: deterministic
            // fake, one "frame" per frameStride KiB of payload
            noCodec(row, "inter-frame-video")
            val nFrames = math.max(1, row.content.length / (frameStride * 1024))
            (0 until nFrames).map(i =>
              MediaFeatures(row.asset_id, "video", i, 0, 0,
                fakeFeature(row.content, 5, salt = i), feature_real = false))
        }
      case other =>
        throw new IllegalArgumentException(s"unknown modality: $other")
    }

    private def fakeFeature(bytes: Array[Byte], n: Int, salt: Int = 0): Array[Float] = {
      var h = 1125899906842597L + salt
      bytes.foreach(b => h = 31 * h + b)
      Array.tabulate(n) { i =>
        val x = h ^ (h >>> 17) ^ (i * 2654435761L)
        ((x & 0xFFFF).toFloat / 0xFFFF.toFloat) - 0.5f
      }
    }
  }

  /** The batch transform: per-partition decoder construction, flatMap to
    * feature rows. Binary payloads never shuffle — featurization happens
    * where the scan put the bytes, and only small feature vectors move on.
    */
  def extractFeatures(media: Dataset[MediaRow],
      mkDecoder: () => MediaDecoder = () => new DefaultDecoder()): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val dec = mkDecoder()
      rows.flatMap(dec.features)
    }
  }

  /** Strict variant: payloads this environment has no real codec for
    * (mp3/flac, inter-frame video) FAIL the job instead of yielding
    * deterministic fakes — the only safe default for training pipelines.
    */
  def extractFeaturesStrict(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    extractFeatures(media, () => new DefaultDecoder(strict = true))

  /** Wrap a binaryFile scan into MediaRows, inferring modality from the
    * extension — the ingestion edge of the multimodal pipeline.
    */
  def scanMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("asset_id"),
        when(ext.isin("jpg", "jpeg", "png", "bmp"), "image")
          .when(ext.isin("wav", "mp3", "flac"), "audio")
          .when(ext.isin("mp4", "mkv", "webm"), "video")
          .otherwise("unknown").as("modality"),
        concat(lit("application/"), ext).as("mime"),
        col("content"),
        map(lit("length"), col("length").cast("string"),
          lit("path"), col("path")).as("meta"))
      .as[MediaRow]
  }
}
