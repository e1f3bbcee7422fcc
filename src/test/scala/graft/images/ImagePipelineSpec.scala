package graft.images

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end pipeline over a synthetic 4-level-sharded image tree (the
  * reference's layout, FIXTURES.md B1): scan → detect(stub) → rollup →
  * alphabet stat, and scan → colors → histograms.
  */
class ImagePipelineSpec extends SparkSpec {

  private lazy val tree: String = {
    val root = Files.createTempDirectory("graft_images").toString
    // ids img00..img11, sharded /a/b/c/<id>.png like the reference tree
    for (i <- 0 until 12) {
      val id = f"img$i%02d"
      val dir = Paths.get(root, s"${i % 2}", s"${i % 3}", s"${i % 4}")
      Files.createDirectories(dir)
      val color = if (i < 8) (255, 0, 0) else (0, 0, 255)
      val img = ImageOps.Image(40, 40,
        Array.fill(1600)((color._1 << 16) | (color._2 << 8) | color._3))
      Files.write(dir.resolve(s"$id.png"), ImageOps.encodePng(img))
    }
    // corrupt file: scanned but undecodable — must be skipped, not crash
    Files.write(Paths.get(root, "0", "corrupt.png"), Array[Byte](9, 9, 9, 9))
    root
  }

  test("scanImages: recursive glob + id extraction (S1/F1)") {
    val ds = ImagePipeline.scanImages(spark, tree, "*.png")
    assert(ds.count() == 13) // incl. the corrupt file
    val ids = ds.select("id").collect().map(_.getString(0)).sorted
    assert(ids.head == "corrupt" && ids.last == "img11")
  }

  test("color stats: histogram + all-6-primaries golden format") {
    val colors = ImagePipeline.colors(
      ImagePipeline.scanImages(spark, tree, "*.png")).toDF()
    val hist = StatsPipeline.colorHistogram(colors).collect()
      .map(r => r.getSeq[Int](0) -> r.getLong(1)).toMap
    assert(hist(Seq(255, 0, 0)) == 8L && hist(Seq(0, 0, 255)) == 4L)
    val csv = StatsPipeline.toGoldenCsv(
      StatsPipeline.closestPrimaryHistogram(colors), ("primary_color", "count"))
    assert(csv ==
      "primary_color;count\n[255, 0, 0];8\n[0, 255, 0];0\n[0, 0, 255];4\n" +
        "[0, 255, 255];0\n[255, 255, 0];0\n[255, 0, 255];0\n")
  }

  test("detect → perLandmarkRollup → alphabetStat (stages 1/3/4)") {
    import spark.implicits._
    val images = ImagePipeline.scanImages(spark, tree, "*.png")
    val preds = ImagePipeline.detect(images, () => new Detection.StubDetector)
    assert(preds.count() == 12)
    // red images (cls 2 via r=255 → 255/86=2) vs blue (cls 0)
    val labels = (0 until 12).map(i => (f"img$i%02d", if (i < 8) "L1" else "L2"))
      .toDF("id", "landmark_id")
    val rollup = ImagePipeline.perLandmarkRollup(preds.toDF(), labels)
    val byLm = rollup.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLm == Map("L1" -> 8L, "L2" -> 4L))
    val names = Seq(("L1", "Alpha"), ("L2", "Beta")).toDF("landmark_id", "name")
    val stat = ImagePipeline.alphabetStat(rollup, names, cls = 2)
    val rows = stat.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // every red image yields one cls-2 box (g=0 → n=1), L1 only
    assert(rows("A") == 8L && rows("B") == 0L)
  }

  test("colors stage: avg/dominant/closest-primary per image (stage 2)") {
    val images = ImagePipeline.scanImages(spark, tree, "*.png")
    val c = ImagePipeline.colors(images).collect()
    assert(c.length == 12)
    val red = c.find(_.id == "img00").get
    assert(red.averageColor == Seq(255, 0, 0))
    assert(red.dominantColor == Seq(255, 0, 0))
    assert(red.closestPrimary == 0)
    val blue = c.find(_.id == "img11").get
    assert(blue.closestPrimary == 2)
  }

  test("semicolon CSV round-trip keeps the reference dialect (S2/S3)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_csv").toString + "/t"
    val df = Seq(("a", 1), ("b", 2)).toDF("id", "n")
    Sources.writeSemicolonCsv(df, out)
    val back = Sources.readSemicolonCsv(spark, out)
    assert(back.columns.toSeq == Seq("id", "n"))
    assert(back.count() == 2)
    // dialect check: raw file really is ;-separated with header
    val part = Files.list(Paths.get(out)).toArray.map(_.toString)
      .find(p => p.endsWith(".csv")).get
    val text = new String(Files.readAllBytes(Paths.get(part)))
    assert(text.startsWith("id;n"))
  }

  test("parquet checkpoint round-trips (I4)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_ckpt").toString + "/p"
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val back = Sources.checkpoint(df, out)
    assert(back.orderBy("k").collect().map(_.getString(1)).toSeq == Seq("x", "y"))
  }

  test("image near-dup pairs: noise-stable gradient pairs found, reversed " +
    "gradient excluded, corrupt bytes dropped") {
    import spark.implicits._
    // strong horizontal gradient: every dHash comparison is decisive
    // (step 16 ≫ ±4 noise), so base vs noised is Hamming 0 and the
    // reversed gradient is the full-distance opposite (all 64 bits)
    def gradient(step: Int): ImageOps.Image = {
      val px = Array.tabulate(64 * 64) { i =>
        val v = math.min(255, (i % 64) / 4 * step)
        (v << 16) | (v << 8) | v
      }
      ImageOps.Image(64, 64, px)
    }
    val base = gradient(16)
    val noised = ImageOps.Image(64, 64, base.pixels.clone())
    (0 until 40).foreach { k =>
      val i = k * 97 % (64 * 64)
      val p = noised.pixels(i)
      val r = math.min(255, ((p >> 16) & 0xFF) + 4)
      noised.pixels(i) = (r << 16) | (p & 0xFFFF)
    }
    val reversed = ImageOps.Image(64, 64, base.pixels.reverse)
    assert(ImageOps.dHash(base) == ImageOps.dHash(noised))
    assert(java.lang.Long.bitCount(
      ImageOps.dHash(base) ^ ImageOps.dHash(reversed)) > 3)
    val df = Seq(
      (1L, ImageOps.encodePng(base)),
      (2L, ImageOps.encodePng(noised)),
      (3L, ImageOps.encodePng(reversed)),
      (4L, Array[Byte](1, 2, 3))) // undecodable → must not crash the op
      .toDF("img_id", "content")
    val pairs = ImagePipeline.imageNearDupPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)), s"${pairs.toSeq}")
  }
}
