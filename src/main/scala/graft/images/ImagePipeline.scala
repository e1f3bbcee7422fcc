package graft.images

import graft.functions.SafeMath._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The Spark-side image pipeline (SURVEY §3.1–§3.2 re-expressed):
  * binaryFile scan → per-partition inference / color analytics → relational
  * rollups. The reference ran this as three scripts with CSV hand-offs and
  * driver-side joins; here each stage is one DataFrame plan, with Parquet
  * checkpoints between pipeline stages replacing `--cached-pred` (I4).
  *
  * Scale notes:
  *  - the scan uses the `binaryFile` source (splittable listing, columnar
  *    metadata, pushed path filters) instead of `sc.binaryFiles`;
  *  - model state is constructed once per partition inside `mapPartitions`
  *    (the intent of the reference's driver-side model broadcast,
  *    `pyspark_yolox.py:49-50`), so executor count scales freely;
  *  - `spark.sql.files.maxPartitionBytes` governs scan parallelism — no
  *    hand repartitioning (the reference forced ≥8 partitions,
  *    `pyspark_yolox.py:128-130`; AQE makes that obsolete).
  */
object ImagePipeline {

  /** One scanned image: S1. `id` is the basename sans extension (F1). */
  final case class ImageRow(path: String, id: String, content: Array[Byte])

  /** Per-image detection output: id + {classId → count} histogram (A8). */
  final case class Predictions(id: String, predictions: Map[Int, Long])

  /** Per-image color output (M2/M4/O1). */
  final case class Colors(id: String, averageColor: Seq[Int], dominantColor: Seq[Int],
      closestPrimary: Int)

  /** S1 — recursive binary scan of an image tree (the reference's 4-level
    * sharded jpg glob via `sc.binaryFiles`, `pyspark_yolox.py:123`).
    */
  def scanImages(spark: SparkSession, dir: String, glob: String = "*.{jpg,jpeg,png}"): Dataset[ImageRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"),
        regexp_extract(col("path"), "([^/]+)\\.[A-Za-z]+$", 1).as("id"),
        col("content"))
      .as[ImageRow]
  }

  /** Stage 1 — detection: letterbox → detect → NMS → score gate →
    * per-image class histogram (`pyspark_yolox.py:62-111`). The detector is
    * built once per partition.
    */
  def detect(images: Dataset[ImageRow], mkDetector: () => Detection.Detector): Dataset[Predictions] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      val det = mkDetector()
      rows.flatMap { r =>
        ImageOps.decode(r.content).map { img =>
          val boxes = Detection.nms(det.detect(Detection.letterboxImage(img)))
          Predictions(r.id, Detection.classHistogram(boxes))
        }
      }
    }
  }

  /** Stage 2 — color analytics per image (`pyspark_dominant.py:30-51`). */
  def colors(images: Dataset[ImageRow]): Dataset[Colors] = {
    import images.sparkSession.implicits._
    images.mapPartitions { rows =>
      rows.flatMap { r =>
        ImageOps.decode(r.content).map { img =>
          val avg = ImageOps.averageColor(img)
          val dom = ImageOps.dominantColor(img)
          Colors(r.id,
            Seq(avg._1, avg._2, avg._3), Seq(dom._1, dom._2, dom._3),
            ImageOps.closestPrimary(dom, ImageOps.Primaries))
        }
      }
    }
  }

  /** Image near-duplicate pairs by perceptual hash — the MULTIMODAL dedup
    * path (the pixel sibling of the text MinHash/SimHash chains): dHash
    * per image, then the SimHash block trick — a 64-bit hash splits into
    * four 16-bit blocks, and any pair within Hamming distance ≤ 3 shares
    * at least one identical block (pigeonhole, 4 blocks > 3 flips) — so
    * candidates come from an EQUI-join on (block index, block value),
    * never an all-pairs comparison, and the exact `bit_count(xor)` verify
    * runs on candidates only. Input: (img_id long, content binary);
    * decode-failed payloads drop out (corrupt files are data). The only
    * bytes that ever shuffle are (id, 64-bit hash) pairs.
    */
  def imageNearDupPairs(images: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block bucketing guarantees recall only to 3")
    val dhashUdf = udf((bytes: Array[Byte]) =>
      ImageOps.decode(bytes).map(ImageOps.dHash))
    val hashed = images
      .select(col("img_id"), dhashUdf(col("content")).as("h"))
      .filter(col("h").isNotNull)
    val blocks = hashed.select(col("img_id"), col("h"),
        explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("bval", expr("(h >> (16 * blk)) & 65535"))
    val cand = blocks.as("x")
      .join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
          col("x.img_id") < col("y.img_id"))
      .select(col("x.img_id").as("id_a"), col("y.img_id").as("id_b"),
        col("x.h").as("ha"), col("y.h").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** Stage 3 — per-landmark rollup (J2/A4/A5, `pyspark_yolox.py:151-176`):
    * join the image→landmark dim, explode histograms, one grouped aggregate,
    * re-assemble sorted-entry maps. Replaces the reference's
    * driver-enumerated inverted join.
    */
  def perLandmarkRollup(preds: DataFrame, labels: DataFrame): DataFrame = {
    val joined = preds.join(labels, "id")
    val fileCounts = joined.groupBy("landmark_id")
      .agg(countDistinct(col("id")).as("image_count"))
    val sums = joined
      .select(col("landmark_id"), explode(col("predictions")).as(Seq("cls", "cnt")))
      .groupBy("landmark_id", "cls").agg(sum(col("cnt")).as("total"))
    sums.join(fileCounts, "landmark_id")
      .groupBy(col("landmark_id"), col("image_count"))
      .agg(
        map_from_entries(array_sort(
          collect_list(struct(col("cls"), col("total"))))).as("predictions_sum"),
        map_from_entries(array_sort(collect_list(struct(col("cls"),
          col("total").cast("double") / col("image_count").cast("double"))))).as("averages"))
  }

  /** Stage 4 — the alphabet stat (`pyspark_stats.py:73-99`): group landmark
    * rollups by first letter of the landmark name, per-class sum + safe avg.
    * One shuffle instead of the reference's 156 driver-loop jobs.
    */
  def alphabetStat(rollup: DataFrame, names: DataFrame, cls: Int): DataFrame =
    rollup.join(broadcast(names), "landmark_id")
      .select(
        upper(substring(col("name"), 1, 1)).as("letter"),
        coalesce(element_at(col("predictions_sum"), cls), lit(0L)).as("cnt"),
        col("image_count"))
      .groupBy("letter")
      .agg(sum(col("cnt")).as("count"),
        safeDiv(sum(col("cnt")).cast("double"),
          sum(col("image_count")).cast("double")).as("avg_per_image"))
      .orderBy("letter")
}
