package graft.similarity

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f), "orth"),
      (Seq(0.5f, 0.25f, 0f, 0.125f), Seq(0.5f, 0.25f, 0f, 0.125f), "same"),
      (Seq(0.5f, 0f, 0f, 0f), Seq(-0.5f, 0f, 0f, 0f), "opp")
    ).toDF("a", "b", "tag")
    val m = df.select(col("tag"), Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("orth") == 0.0)
    assert(math.abs(m("same") - 1.0) < 1e-9)
    assert(math.abs(m("opp") + 1.0) < 1e-9)
  }

  test("bruteForceTopK: rank-1 neighbor of a vector is its duplicate") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(0.5f, 0.1f, 0.3f, 0.2f)),
      (1L, Seq(0.5f, 0.1f, 0.3f, 0.2f)),    // duplicate of 0
      (2L, Seq(-0.5f, 0.4f, -0.3f, 0.1f)),
      (3L, Seq(0.4f, 0.1f, 0.35f, 0.15f))   // close to 0
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0L), vecs, 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(top.toSeq == Seq((1, 1L), (2, 3L)))
  }

  test("lshTopK recall ≥ 60% of exact top-3 on real embeddings") {
    val emb = Graft.table(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(q, emb, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(q, emb, 64, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall")
  }

  test("lsh buckets are deterministic across invocations") {
    val emb = Graft.table(spark, sf, "embeddings").limit(50)
    val b1 = emb.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = emb.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 == b2)
  }

  test("ann recall rows agree with a direct set comparison per query") {
    val emb = Graft.table(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(q, emb, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val approx = Similarity.lshTopK(q, emb, 64, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val rows = Similarity.AnnRecall.run(spark, sf).collect()
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val (qid, nExact, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val hits = exact(qid).intersect(approx.getOrElse(qid, Set.empty)).size
      assert(nExact == exact(qid).size && nHit == hits,
        s"query $qid: ($nExact,$nHit) vs (${exact(qid).size},$hits)")
      assert(r.getDouble(3) == nHit.toDouble / nExact.toDouble)
    }
    // the 8×4 layout is sized for ≈0.7 mean recall on these embeddings
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean >= 0.5, s"mean recall $mean")
  }

  test("q_hard_negatives: positives share the query label, negatives do not, margin is exact") {
    val labels = graft.Graft.table(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = Similarity.HardNegatives.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(labels(r.getAs[Long]("pos_id")) == labels(q))
      assert(labels(r.getAs[Long]("neg_id")) != labels(q))
      assert(r.getAs[Double]("margin") ==
        r.getAs[Double]("pos_sim") - r.getAs[Double]("neg_sim"))
      // the mined triplet is informative only if both sims are real cosines
      assert(math.abs(r.getAs[Double]("pos_sim")) <= 1.0 + 1e-9)
      assert(math.abs(r.getAs[Double]("neg_sim")) <= 1.0 + 1e-9)
    }
  }
}
