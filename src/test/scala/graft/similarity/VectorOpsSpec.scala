package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of kNN label prediction and int8 quantization beyond the
  * oracle hash-match.
  */
class VectorOpsSpec extends SparkSpec {

  test("knn label: clustered fixture predicts the cluster's label") {
    import spark.implicits._
    // two tight clusters along orthogonal axes + 3 query points
    def vec(axis: Int, eps: Float): Array[Float] = {
      val v = Array.fill(4)(eps)
      v(axis) = 1.0f
      v
    }
    val rows =
      (0 until 20).map(i => (i.toLong, vec(0, 0.01f * (i % 3)), 7)) ++
        (20 until 40).map(i => (i.toLong, vec(1, 0.01f * (i % 3)), 9))
    val dir = java.nio.file.Files.createTempDirectory("knn_spec").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.KnnLabel.run(spark, dir).collect()
    // queries are vec_id < 15, all in cluster 0 → predicted 7, all correct
    assert(out.length == 15)
    assert(out.forall(_.getInt(2) == 7), "predicted label must be cluster label")
    assert(out.forall(_.getInt(4) == 1))
  }

  test("quantization: codes stay in [0,255], error bounded by half a cell") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dims = emb.select(posexplode(col("embedding")).as(Seq("d", "xf")))
      .select(col("d"), col("xf").cast("double").as("x"))
    val stats = dims.groupBy("d")
      .agg(min("x").as("mn"), max("x").as("mx"))
    val widest = stats.agg(max(col("mx") - col("mn"))).head.getDouble(0)
    val r = VectorOps.EmbedQuantize.run(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, checksum, maxErr) =
        (row.getLong(1), row.getLong(2), row.getDouble(3))
      assert(checksum >= 0 && checksum <= 255L * n, "codes out of [0,255]")
      // midpoint dequantization error ≤ half a cell of the widest dim
      assert(maxErr <= widest / 255.0 / 2.0 + 1e-12,
        s"reconstruction error $maxErr exceeds half-cell bound")
    }
  }

  test("pq codes: codebook vectors code to themselves at zero distortion; " +
    "every vector gets one code per subspace") {
    val rows = VectorOps.PqCodes.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length == nVecs * 8, "one code per (vector, subspace)")
    rows.foreach { case (vid, s, code, dist) =>
      assert(s >= 0 && s < 8 && code >= 0 && code < 16, s"($vid,$s,$code)")
      assert(dist >= 0, s"negative distortion at ($vid,$s)")
    }
    // a codebook vector's nearest centroid in every subspace is itself
    rows.filter(_._1 < 16).foreach { case (vid, s, code, dist) =>
      assert(code == vid && dist == 0L,
        s"codebook vec $vid subspace $s coded as $code dist $dist")
    }
  }

  test("trunc recall: perfect when the tail dims carry no information") {
    import spark.implicits._
    // information only in dims 1..16; dims 17..64 identically zero →
    // truncated cosine == full cosine → recall exactly 1.0 for all queries
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map { i =>
      val v = Array.tabulate(64)(d => if (d < 16) rnd.nextFloat() - 0.5f else 0.0f)
      (i, v, (i % 4).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory("trunc_spec").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.TruncRecall.run(spark, dir).collect()
    assert(out.length == 50)
    out.foreach { r =>
      assert(r.getLong(1) == 10L, s"n_exact: $r")
      assert(r.getDouble(3) == 1.0, s"recall must be exactly 1: $r")
    }
    // catalog: recall is a valid fraction with full denominators
    val cat = VectorOps.TruncRecall.run(spark, sf).collect()
    assert(cat.nonEmpty)
    cat.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rc = r.getDouble(3)
      assert(rc >= 0.0 && rc <= 1.0)
    }
  }

  test("label inertia: identical vectors score 0; a symmetric pair scores d^2") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inertia_spec").toString
    def vec(x: Float): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(0) = x; v
    }
    // label 0: three identical vectors → inertia exactly 0
    // label 1: ±0.5 in dim 0 → centroid 0, mean squared distance 0.25
    val rows = Seq((0L, vec(0.25f), 0), (1L, vec(0.25f), 0), (2L, vec(0.25f), 0),
      (3L, vec(0.5f), 1), (4L, vec(-0.5f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.LabelInertia.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 2)
    assert(out(0) == ((0, 3L, 0.0)), s"${out(0)}")
    assert(out(1)._2 == 2L && math.abs(out(1)._3 - 0.25) < 1e-12, s"${out(1)}")
    // catalog: inertia is nonnegative for every label
    val cat = VectorOps.LabelInertia.run(spark, sf).collect()
    assert(cat.nonEmpty && cat.forall(_.getDouble(2) >= 0.0))
  }
  test("text-embed join: per-cluster text stats on a crafted pairing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tej_spec").toString
    Seq((1L, "a b", "en", "s", 10L), (2L, "c d e f", "en", "s", 30L),
      (3L, "g", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    def vec = Array.fill(4)(0.5f)
    Seq((1L, vec, 0), (2L, vec, 0), (3L, vec, 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.TextEmbedJoin.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq((0, 2L, 40L, 20.0, 3.0), (1, 1L, 5L, 5.0, 1.0)),
      s"${out.toSeq}")
  }

  test("knn confusion: diagonal dominates on separated clusters; rows sum to 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("knnconf_spec").toString
    def vec(axis: Int, eps: Float): Array[Float] = {
      val v = Array.fill(4)(eps); v(axis) = 1.0f; v
    }
    // two well-separated clusters → confusion matrix is purely diagonal
    val rows =
      (0 until 60).map(i => (i.toLong, vec(0, 0.01f * (i % 3)), 1)) ++
        (60 until 120).map(i => (i.toLong, vec(1, 0.01f * (i % 3)), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.KnnConfusion.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1, 1, 60L, 1.0), (2, 2, 40L, 1.0)), s"${out.toSeq}")
    // catalog: row shares sum to 1 per true label
    val cat = VectorOps.KnnConfusion.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(3)))
    cat.groupBy(_._1).foreach { case (_, xs) =>
      assert(math.abs(xs.map(_._2).sum - 1.0) < 1e-12)
    }
  }

  test("embed outliers: a planted far point is flagged, tight members are not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("embout_spec").toString
    def vec(x: Float): Array[Float] = {
      val v = Array.fill(8)(0.0f); v(0) = x; v
    }
    // label 0: ten at the origin + one far point → exactly 1 outlier
    // label 1: all identical → d2 = 0, threshold 0, no outliers
    val rows = (0L until 10L).map(i => (i, vec(0.0f), 0)) ++
      Seq((10L, vec(2.0f), 0)) ++
      (11L until 15L).map(i => (i, vec(0.5f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.EmbedOutliers.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(out.toSeq == Seq((0, 11L, 1L), (1, 4L, 0L)), s"${out.toSeq}")
  }

}
