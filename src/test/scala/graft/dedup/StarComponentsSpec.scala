package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Star contraction must agree with min-label propagation — two
  * independently implemented distributed CC algorithms on the same graphs —
  * and with a plain-Scala union-find on synthetic graphs chosen to stress
  * the shapes where the algorithms differ most (long chains = diameter
  * stress for propagation, stars, multi-component mixes).
  */
class StarComponentsSpec extends SparkSpec {

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    // plain union-find reference
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize to component minimum
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("doc_a", "doc_b")
    // threshold 0 forces the DISTRIBUTED star-contraction loop — the
    // small-graph gate would otherwise route these synthetic graphs to the
    // union-find reference and make the differential vacuous
    StarComponents.starComponents(df, smallGraphThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("small-graph gate ≡ forced distributed star contraction") {
    import spark.implicits._
    // (77,77) is a self-loop-only node: BOTH paths must drop it
    val g = ((1L to 25L).sliding(2).map(s => (s(0), s(1))).toSeq ++
      Seq((40L, 41L), (41L, 42L), (100L, 40L), (77L, 77L)))
    val df = g.toDF("doc_a", "doc_b")
    val gated = StarComponents.starComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gated == run(g))
  }

  test("star contraction ≡ union-find on adversarial synthetic graphs") {
    val chain = (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val star = (2L to 20L).map(i => (1L, i))
    val reversedChain = chain.map { case (a, b) => (b, a) }
    val twoComps = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 11L))
    val selfAndDup = Seq((5L, 5L), (6L, 7L), (7L, 6L), (6L, 7L))
    val cross = Seq((100L, 1L), (50L, 100L), (1L, 99L), (98L, 99L))
    for (g <- Seq(chain, star, reversedChain, twoComps, selfAndDup, cross)) {
      val want = labelsOf(g.filter(e => e._1 != e._2))
      assert(run(g) == want, s"mismatch on $g")
    }
  }

  test("star contraction ≡ min-label propagation on the minhash pair graph") {
    val pairs = Dedup.minhashCandidatePairs(
      graft.Graft.table(spark, sf, "documents"), 0.5)
      .persist()
    val a = StarComponents.starComponents(pairs, smallGraphThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.nonEmpty)
    spark.catalog.clearCache()
  }

  test("iteration cap throws instead of returning a wrong answer") {
    import spark.implicits._
    val chain = (1L to 30L).sliding(2).map(s => (s(0), s(1))).toSeq
    val df = chain.toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      StarComponents.starComponents(df, maxIters = 1, smallGraphThreshold = 0L)
    }
  }
}
