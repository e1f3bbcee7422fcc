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
}
