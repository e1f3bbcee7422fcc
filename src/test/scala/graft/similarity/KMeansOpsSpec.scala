package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the k-means / SemDeDup family. The oracle (CTE-unrolled
  * Lloyd's rounds) is the cross-engine check; these tests pin the
  * engine-side invariants that make that oracle meaningful.
  */
class KMeansOpsSpec extends SparkSpec {

  test("q_kmeans_embed: total assignment, clusters from the seed set, deterministic") {
    val a = KMeansOps.KMeansEmbed.run(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(a.length == n, "every vector is assigned exactly once")
    val clusters = a.map(_.getInt(1)).distinct
    assert(clusters.forall(c => c >= 0 && c < KMeansOps.K),
      "cluster ids come from the vec_id<K seed set")
    val b = KMeansOps.KMeansEmbed.run(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getInt(1))).toSeq,
      "re-running the bounded-round loop is bit-identical")
    spark.catalog.clearCache()
  }

  test("kmeans structure: assignments total per round, cluster count never grows") {
    // Clusters can only vanish (lose all members), never split, so the
    // live-cluster count is non-increasing in the round number.
    val e = KMeansOps.quantized(spark, sf).persist()
    try {
      val n = e.count()
      val liveClusters = (1 to KMeansOps.Rounds).map { r =>
        val rows = KMeansOps.fit(e, KMeansOps.K, r)
          .groupBy("cluster").agg(count(lit(1)).as("cnt")).collect()
        assert(rows.map(_.getLong(1)).sum == n,
          s"round $r assigns every vector exactly once")
        rows.length
      }
      assert(liveClusters.head <= KMeansOps.K)
      assert(liveClusters.sliding(2).forall {
        case Seq(a, b) => b <= a
        case _ => true
      })
    } finally e.unpersist(blocking = false)
  }

  test("q_semdedup: pairs are within-cluster, ordered, above threshold") {
    val assigned = {
      val e = KMeansOps.quantized(spark, sf).persist()
      try KMeansOps.fit(e, KMeansOps.K, KMeansOps.Rounds)
        .select(col("vec_id"), col("cluster")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally e.unpersist(blocking = false)
    }
    val pairs = KMeansOps.SemDedup.run(spark, sf).collect()
    pairs.foreach { r =>
      val (cl, a, b, cos) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(a < b, "pair ids are ordered (no mirror duplicates)")
      assert(assigned(a) == cl && assigned(b) == cl, "pair shares its cluster")
      assert(cos >= KMeansOps.Tau && cos <= 1.0 + 1e-12)
    }
    spark.catalog.clearCache()
  }

  test("q_semdedup_prune: per-cluster accounting is consistent with the pairs") {
    val pairs = KMeansOps.SemDedup.run(spark, sf).collect()
    val droppedByCluster = pairs.groupBy(_.getInt(0))
      .map { case (cl, rs) => cl -> rs.map(_.getLong(2)).distinct.length }
    val prune = KMeansOps.SemDedupPrune.run(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(prune.map(_.getLong(1)).sum == n, "cluster sizes partition the corpus")
    prune.foreach { r =>
      val (cl, size, dropped, kept) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dropped == droppedByCluster.getOrElse(cl, 0).toLong)
      assert(kept == size - dropped && kept >= 1,
        "keep-smallest-id always keeps at least the smallest member")
    }
    spark.catalog.clearCache()
  }

  test("q_semdedup_recall: caught is a subset of truth; recall in (0,1]") {
    val r = KMeansOps.SemDedupRecall.run(spark, sf).collect().head
    val (nTrue, nCaught, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nCaught <= nTrue,
      "within-cluster pairs are a subset of the all-pairs truth")
    if (nTrue > 0) {
      assert(recall == nCaught.toDouble / nTrue.toDouble)
      assert(recall > 0.0 && recall <= 1.0)
    }
    spark.catalog.clearCache()
  }

  test("q_semdedup_recall_sampled: anchor truth ⊆ full truth; bounded sample") {
    import org.apache.spark.sql.functions._
    import graft.functions.PortableHash.pHash60
    val r = KMeansOps.SemDedupRecallSampled.run(spark, sf).collect().head
    val (nTrue, nCaught, recall) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    spark.catalog.clearCache()
    assert(nCaught <= nTrue)
    if (nTrue > 0) {
      assert(recall == nCaught.toDouble / nTrue.toDouble)
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // the sampled truth is the anchor-touching restriction of the full
    // truth: every sampled-true pair must appear in the exact all-pairs
    // truth count (full n_true >= sampled n_true), and the anchor set is
    // exactly AnchorCount rows (or the whole corpus if smaller)
    val full = KMeansOps.SemDedupRecall.run(spark, sf).collect().head
    spark.catalog.clearCache()
    assert(nTrue <= full.getLong(0),
      s"sampled truth $nTrue exceeds full truth ${full.getLong(0)}")
    val nVecs = graft.Graft.table(spark, sf, "embeddings").count()
    val nAnchors = math.min(KMeansOps.AnchorCount.toLong, nVecs)
    val anchors = graft.Graft.table(spark, sf, "embeddings")
      .select(col("vec_id"))
      .orderBy(pHash60(col("vec_id").cast("string")), col("vec_id"))
      .limit(KMeansOps.AnchorCount)
    assert(anchors.count() == nAnchors)
  }

  test("q_semdedup_adaptive: integer k rule; pairs within-cluster, ordered, above threshold") {
    import KMeansOps.SemDedupAdaptive.kFor
    // ⌈n/64⌉, exact at the boundaries
    assert(kFor(1) == 1 && kFor(64) == 1 && kFor(65) == 2)
    assert(kFor(2000) == 32)  // the sf0.1 corpus
    assert(kFor(20000) == 313) // the sf1 corpus
    assert((1L to 500L).forall(n => kFor(n) == ((n + 63) / 64).toInt))
    val out = KMeansOps.SemDedupAdaptive.run(spark, sf).collect()
    spark.catalog.clearCache()
    assert(out.nonEmpty, "no pairs at spec scale")
    out.foreach { r =>
      assert(r.getLong(1) < r.getLong(2), "pair order")
      assert(r.getDouble(3) >= KMeansOps.Tau, "below threshold")
    }
    // one cluster per pair row — both ids were assigned to that cluster,
    // so a (cluster, id) may never appear under two clusters
    val byId = out.flatMap(r => Seq(r.getLong(1) -> r.getInt(0), r.getLong(2) -> r.getInt(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(byId.values.forall(_ == 1), "an id paired under two clusters")
  }
}
