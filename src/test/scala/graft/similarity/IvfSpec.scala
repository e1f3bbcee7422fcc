package graft.similarity

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  test("IVF probe recall vs exact top-3, and full-probe == exact") {
    val emb = Graft.table(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    val index = Ivf.build(emb, nCells = 8)
    assert(index.centers.length == 8)

    val exact = Similarity.bruteForceTopK(q, emb, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // probing ALL cells must reproduce the exact result identically
    val full = Ivf.topK(q, index, 3, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full == exact)
    // probing half the cells keeps decent recall on weakly clustered data
    val probed = Ivf.topK(q, index, 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exactPairs = exact.map(t => (t._1, t._3))
    val recall = exactPairs.intersect(probed).size.toDouble / exactPairs.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("index build is deterministic under a fixed seed") {
    val emb = Graft.table(spark, sf, "embeddings")
    val a = Ivf.build(emb, 4).assigned.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Ivf.build(emb, 4).assigned.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("ivf recall rows agree with a direct set comparison per query") {
    val emb = Graft.table(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < Ivf.SampledIvfTopK.QueryMax)
    val exact = Similarity.bruteForceTopK(q, emb, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val approx = Ivf.SampledIvfTopK.sampledTopK(emb, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val rows = Ivf.IvfRecall.run(spark, sf).collect()
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val (qid, nExact, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val hits = exact(qid).intersect(approx.getOrElse(qid, Set.empty)).size
      assert(nExact == exact(qid).size && nHit == hits,
        s"query $qid: ($nExact,$nHit) vs (${exact(qid).size},$hits)")
      assert(r.getDouble(3) == nHit.toDouble / nExact.toDouble)
    }
    // nProbe=2 of 8 sampled cells trades recall for a 4× candidate cut;
    // it should still find a substantial share of true neighbors
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean >= 0.3, s"mean recall $mean")
  }
}
