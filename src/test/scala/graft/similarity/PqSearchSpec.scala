package graft.similarity

import graft.SparkSpec

/** Differential proof for ADC search: an INDEPENDENT plain-Scala PQ
  * pipeline (sequential code assignment, explicit lookup tables, exact
  * integer L2) must produce the same top-k lists, plus structural pins —
  * ADC of a zero-distortion candidate equals its exact quantized L2, and
  * the recall readout is bounded and complete.
  */
class PqSearchSpec extends SparkSpec {

  private val M = 8; private val Sub = 8; private val K = 16
  private val QueryMax = 30; private val TopK = 10

  /** Collected quantized vectors, the engine's grid (round(v*1e6)). */
  private def quantized(): Map[Long, Array[Long]] = {
    val rows = graft.Graft.table(spark, sf, "embeddings").collect()
    rows.map { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).toArray
      id -> v.map(graft.plans.VectorExpressions.quantize)
    }.toMap
  }

  private def subL2(a: Array[Long], b: Array[Long], s: Int): Long = {
    var d = 0L
    var p = 0
    while (p < Sub) {
      val x = a(s * Sub + p) - b(s * Sub + p); d += x * x; p += 1
    }
    d
  }

  /** Reference ADC top-k: codes by (dist, code) argmin against the first-K
    * codebook; per-query tables; sums; (adist, id) top-k.
    */
  private def referenceTopK(q: Map[Long, Array[Long]])
      : Map[Long, Seq[(Long, Long)]] = {
    val cents = (0L until K).map(q)
    val codes = q.map { case (id, v) =>
      id -> Array.tabulate(M) { s =>
        (0 until K).minBy(c => (subL2(v, cents(c), s), c))
      }
    }
    (0L until QueryMax).map { qid =>
      val qv = q(qid)
      val table = Array.tabulate(M, K)((s, c) => subL2(qv, cents(c), s))
      val scored = q.keys.filter(_ != qid).map { id =>
        val adist = (0 until M).map(s => table(s)(codes(id)(s))).sum
        (id, adist)
      }.toSeq
      qid -> scored.sortBy { case (id, d) => (d, id) }.take(TopK)
        .map { case (id, d) => (id, d) }
    }.toMap
  }

  test("q_pq_topk ≡ independent sequential ADC pipeline") {
    val q = quantized()
    assert(q.size > K)
    val want = referenceTopK(q)
    val got = PqSearch.PqTopK.run(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(3))
          .map(r => (r.getLong(1), r.getLong(2))).toSeq
      }
    assert(got.keySet == want.keySet)
    for ((qid, lst) <- want)
      assert(got(qid) == lst, s"ADC top-k mismatch for query $qid")
    spark.catalog.clearCache()
  }

  test("ADC of a zero-distortion candidate equals its exact quantized L2") {
    // Candidates with vec_id < K ARE codebook entries: every subvector codes
    // with distortion 0, so ADC degenerates to the exact distance. Pinned on
    // the reference pipeline (whole-output equivalence to the engine is the
    // previous test), since such candidates need not reach any top-k list.
    val q = quantized()
    val cents = (0L until K).map(q)
    for (id <- 0L until K; s <- 0 until M) {
      val (d, c) = (0 until K).map(c => (subL2(q(id), cents(c), s), c))
        .minBy(identity)
      assert(d == 0L, s"codebook vector $id has distortion in subspace $s")
      // the coded centroid's subvector is bit-identical to the candidate's
      assert((0 until Sub).forall(p =>
        cents(c)(s * Sub + p) == q(id)(s * Sub + p)))
    }
    for (qid <- 0L until QueryMax; id <- 0L until K if id != qid) {
      val adc = (0 until M).map { s =>
        val c = (0 until K).minBy(c => (subL2(q(id), cents(c), s), c))
        subL2(q(qid), cents(c), s)
      }.sum
      val exact = (0 until M).map(s => subL2(q(qid), q(id), s)).sum
      assert(adc == exact, s"ADC != exact L2 for codebook candidate $id")
    }
  }

  test("q_pq_recall: complete per-query readout, recall in [0,1]") {
    val rows = PqSearch.PqRecall.run(spark, sf).collect()
    assert(rows.length == QueryMax)
    for (r <- rows) {
      assert(r.getLong(1) == TopK) // n_exact
      assert(r.getLong(2) >= 0 && r.getLong(2) <= TopK)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1).toDouble)
    }
    spark.catalog.clearCache()
  }
}
