package graft.sources

import graft.{Graft, GraftQuery}
import graft.images.ImageOps
import graft.multimodal.TiffCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Driver-visible queries for the source/sink surface (SURVEY §2.1 S1–S3).
  * The testdata has no CSV or image files, so each query materializes its
  * own deterministic input from the parquet tables (or synthesizes one) in
  * a per-scale-factor temp dir, then exercises the real source.
  */
object SourceQueries {

  private[sources] def workDir(tag: String, sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val p = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_${tag}_$safe")
    Files.createDirectories(p)
    p.toString
  }

  /** Fixture-tree scale knob for the media-dedup SCALING audits (the
    * two-point shuffle measurements a constant-size tree cannot
    * provide): SPARK_GRAFT_MEDIA_SCALE=10 makes the fingerprint/near-dup
    * fixture trees 10× larger, in their own roots. The driver never sets
    * it, so every oracle-pinned tree keeps its documented size and exact
    * bytes (at scale 1 the generators are byte-identical to before — the
    * masking below is the identity on the base index range).
    */
  private[sources] def mediaScale: Int = {
    val s = sys.env.getOrElse("SPARK_GRAFT_MEDIA_SCALE", "1").toInt
    // the *DedupCluster queries encode node ids as kind*1000 + asset_idx;
    // ≥1000 assets per kind (scale ≥ 42) would silently collide across
    // kinds and merge unrelated clusters — fail loudly instead
    require(s * 24 < 1000,
      s"SPARK_GRAFT_MEDIA_SCALE=$s would overflow the kind*1000+asset_idx " +
        "node-id stride of the media dedup-cluster queries (max 41)")
    s
  }
  private[sources] def scaledTag(tag: String): String = {
    val s = mediaScale
    if (s == 1) tag else s"${tag}_x$s"
  }


  /** Registration order preserved from the pre-split single file (round
    * 10 split it by media family; the driver's query order is this list).
    */
  val all: Seq[GraftQuery] = {
    import TabularQueries._
    import ImageSourceQueries._
    import ImageDedupQueries._
    import AudioSourceQueries._
    import AudioContainerQueries._
    import AudioDedupQueries._
    import VideoSourceQueries._
    import VideoDedupQueries._
    import MediaCatalogQueries._
    Seq(CsvRoundtrip, BinaryScan, BinaryTwoTone, ImageDims, JsonlRoundtrip,
      OrcRoundtrip, PartitionedRoundtrip, SchemaEvolution, CodecRoundtrip,
      FlacScan, ZmbvScan, Mp4Scan, OggScan, MkvScan, MkvVfwScan, GifScan,
      BmpScan, TiffScan, JpegScan, MsrleScan,
      AdpcmScan, G711Scan, AiffScan, QoiScan, ImageAHash, ImageNearDup,
      ImageDedupCluster, AudioFpScan, AudioNearDup, AudioDedupCluster,
      VideoFpScan, VideoNearDup, VideoDedupCluster, MediaCatalog, Mp3Scan,
      PnmScan, WebpScan)
  }
}
