package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Source/sink semantics not visible to the oracle hash-match: the
  * partitioned layout's PLAN guarantee — the source filter must prune at
  * the directory level, before any data file is opened. (The generic
  * pruning mechanism is also covered in ScaleSpec; this pins the query's
  * own layout.)
  */
class SourceQueriesSpec extends SparkSpec {

  test("partitioned roundtrip: the re-read scan prunes excluded source " +
    "directories and matches the unpartitioned filter") {
    val out = TabularQueries.PartitionedRoundtrip.run(spark, sf).collect()
    assert(out.nonEmpty)
    // the run above wrote the layout; re-open it the way the query does
    val safe = sf.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_hivepart_$safe",
      "documents").toString
    val pruned = spark.read.parquet(dir)
      .filter(col("source").isin("src1", "src2"))
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("source"),
      s"no partition filter in:\n$plan")
    // every file actually read at execution lives under a kept directory
    val scanned = pruned.select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0))
    assert(scanned.nonEmpty)
    assert(scanned.forall(p =>
      p.contains("source=src1") || p.contains("source=src2")),
      scanned.take(3).mkString(", "))
    // row parity with the same filter on the original table
    val expected = graft.Graft.table(spark, sf, "documents")
      .filter(col("source").isin("src1", "src2")).count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("image dims: SQL header arithmetic agrees with the driver-side " +
    "parser on every file in the tree") {
    val rows = ImageSourceQueries.ImageDims.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 24)
    assert(rows.map(_._1).toSeq == (0L until 24L), "one row per image, ordered")
    // differential: re-parse each file with ImageOps.imageDims
    val safe = sf.replaceAll("[^A-Za-z0-9.]", "_")
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_img_$safe")
    rows.foreach { case (id, w, h, nBytes) =>
      assert(w == 16 && h == 16, s"img $id dims ${w}x$h")
      val file = java.nio.file.Files.walk(root).iterator().asScala
        .find(_.getFileName.toString == f"img$id%03d.png").get
      val bytes = java.nio.file.Files.readAllBytes(file)
      assert(bytes.length.toLong == nBytes, s"img $id size")
      val parsed = graft.images.ImageOps.imageDims(bytes)
      assert(parsed.contains((w.toInt, h.toInt, "png")), s"img $id: $parsed")
    }
  }
  test("codec roundtrip: snappy and zstd checksums agree") {
    val out = TabularQueries.CodecRoundtrip.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.length == 2)
    assert(out.map(_._1).toSeq == Seq("snappy", "zstd"))
    assert(out(0)._2 == out(1)._2 && out(0)._3 == out(1)._3,
      s"codecs must be lossless: ${out.toSeq}")
  }


  test("image dedup clusters equal an independent union-find over the pair graph") {
    // independent re-derivation: collect the near-dup PAIRS (their own
    // query is oracle-green), run a plain-Scala union-find, apply the
    // same keep-largest policy, compare to the operator's clusters
    val pairs = ImageDedupQueries.ImageNearDup.run(spark, sf).collect()
      .map { r =>
        def nid(s: String): Long =
          (s.head match { case 's' => 0L; case 't' => 1L; case _ => 2L }) *
            1000L + s.tail.toLong
        (nid(r.getString(0)), nid(r.getString(1)))
      }
    val bytes = ImageDedupQueries.ImageAHash.run(spark, sf).collect()
      .map { r =>
        val k = r.getString(0) match { case "s" => 0L; case "t" => 1L; case _ => 2L }
        (k * 1000L + r.getLong(1)) -> r.getLong(4)
      }.toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElseUpdate(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = members.groupBy(m => members.filter(n => find(n) == find(m)).min)
      .map { case (root, ms) =>
        root -> (ms.length.toLong,
          ms.maxBy(m => bytes(m) * 100000L - m), ms.map(_ / 1000).distinct.length.toLong)
      }
    val got = ImageDedupQueries.ImageDedupCluster.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"clusters diverged: got ${got.size}, want ${want.size}")
    // the solid tree is one giant exact-dup class: all 24 hash to 0 and
    // pairwise Hamming 0 — they must land in ONE cluster rooted at nid 0
    assert(got.contains(0L) && got(0L)._1 >= 24L, s"solid cluster: ${got.get(0L)}")
    spark.catalog.clearCache()
  }

  test("audio dedup clusters: union-find differential + cross-container unification") {
    val pairs = AudioDedupQueries.AudioNearDup.run(spark, sf).collect()
      .map { r =>
        def nid(s: String): Long =
          (s.head match { case 'a' => 0L; case 'o' => 1L; case _ => 2L }) *
            1000L + s.tail.toLong
        (nid(r.getString(0)), nid(r.getString(1)))
      }
    val samples = AudioDedupQueries.AudioFpScan.run(spark, sf).collect()
      .map { r =>
        val k = r.getString(0) match { case "a" => 0L; case "o" => 1L; case _ => 2L }
        (k * 1000L + r.getLong(1)) -> r.getLong(3)
      }.toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElseUpdate(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = members.groupBy(m => members.filter(n => find(n) == find(m)).min)
      .map { case (root, ms) =>
        root -> (ms.length.toLong,
          ms.maxBy(m => samples(m) * 100000L - m),
          ms.map(_ / 1000).distinct.length.toLong)
      }
    val got = AudioDedupQueries.AudioDedupCluster.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"clusters diverged: got ${got.size}, want ${want.size}")
    // the whole point: at least one cluster spans containers (the bare-
    // FLAC and Matroska trees share PCM formulas)
    assert(got.values.exists(_._3 >= 2L), "no cross-container cluster found")
    spark.catalog.clearCache()
  }

  test("video dedup clusters: union-find differential over the shot-overlap graph") {
    val pairs = VideoDedupQueries.VideoNearDup.run(spark, sf).collect()
      .map { r =>
        def nid(s: String): Long =
          (if (s.head == 'v') 0L else 1L) * 1000L + s.tail.toLong
        (nid(r.getString(0)), nid(r.getString(1)))
      }
    val nFrames = VideoDedupQueries.VideoFpScan.run(spark, sf).collect()
      .map { r =>
        val k = if (r.getString(0) == "v") 0L else 1L
        (k * 1000L + r.getLong(1))
      }.groupBy(identity).map { case (id, g) => id -> g.length.toLong }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElseUpdate(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = members.groupBy(m => members.filter(n => find(n) == find(m)).min)
      .map { case (root, ms) =>
        root -> (ms.length.toLong,
          ms.maxBy(m => nFrames(m) * 100000L - m),
          ms.map(_ / 1000).distinct.length.toLong)
      }
    val got = VideoDedupQueries.VideoDedupCluster.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"clusters diverged: got ${got.size}, want ${want.size}")
    spark.catalog.clearCache()
  }
}
