package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MmrOpsSpec extends SparkSpec {

  test("q_mmr_select: greedy trace invariants") {
    val rows = MmrOps.MmrSelect.run(spark, sf).collect()
    assert(rows.length == 5)
    val ids = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 5, "selected items must be distinct")
    assert(!ids.contains(0L), "the anchor query is not a candidate")
    // rank 1 is pure relevance: must equal the exact cosine top-1 vs vec 0
    val emb = graft.Graft.table(spark, sf, "embeddings")
    val top1 = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 0), emb, 1)
      .collect()(0).getAs[Long]("neighbor_id")
    assert(ids(0) == top1, s"rank-1 ${ids(0)} != exact top-1 $top1")
  }

  test("q_mmr_select diversifies: picks differ from pure-relevance top-5 when near-dups exist") {
    // invariant rather than example: each later pick's penalized score is
    // what the greedy rule says it is — recompute scores independently
    // from exact cosines and verify the argmax at every round
    import graft.plans.VectorExpressions.{dot_long, quantize_vec}
    val emb = graft.Graft.table(spark, sf, "embeddings")
      .select(col("vec_id"), quantize_vec(col("embedding")).as("q"))
      .select(col("vec_id"), col("q"),
        sqrt(dot_long(col("q"), col("q")).cast("double")).as("n"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getSeq[Long](1).toArray, r.getDouble(2))).toMap
    def cosine(a: Long, b: Long): Double = {
      val (qa, na) = emb(a); val (qb, nb) = emb(b)
      var dot = 0L; var i = 0
      while (i < qa.length) { dot += qa(i) * qb(i); i += 1 }
      dot.toDouble / (na * nb)
    }
    val cands = emb.keySet.filter(_ != 0L).toSeq.sorted
    var sel = Vector.empty[Long]
    val expected = (1 to 5).map { _ =>
      val best = cands.filterNot(sel.contains).map { c =>
        val pen = if (sel.isEmpty) 0.0 else sel.map(s => cosine(c, s)).max
        (c, 0.5 * cosine(0L, c) - 0.5 * pen)
      }.minBy { case (c, s) => (-s, c) }
      sel :+= best._1
      best
    }
    val got = MmrOps.MmrSelect.run(spark, sf).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
    expected.zip(got).zipWithIndex.foreach { case (((eId, eS), (gId, gS)), r) =>
      assert(eId == gId, s"round ${r + 1}: expected $eId got $gId")
      assert(math.abs(eS - gS) < 1e-12, s"round ${r + 1}: score $eS vs $gS")
    }
  }
}
