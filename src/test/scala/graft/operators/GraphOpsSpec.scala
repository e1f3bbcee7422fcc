package graft.operators

import graft.SparkSpec

/** PageRank semantics beyond the oracle hash-match: the fixed-point
  * integer iteration must agree with a driver-side recompute on a crafted
  * graph (including a dangling node), and hold its ordering/consistency
  * invariants on the catalog.
  */
class GraphOpsSpec extends SparkSpec {

  private val S = 1000000000000L

  test("pagerank: crafted graph with a dangling node matches a driver-side " +
    "recompute of the integer fixed-point iteration") {
    import spark.implicits._
    // edges a→b, a→c, b→c (deg a=2, b=1); c is dangling (absorbs rank)
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "b c"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pr_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = GraphOps.PageRank.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"))
    val deg = edges.groupBy(_._1).map { case (w, es) => w -> es.length.toLong }
    val nodes = Seq("a", "b", "c")
    val n = nodes.length.toLong
    val base = (15L * S) / (100L * n)
    var rank = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to 5) {
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => (85L * rank(u)) / (100L * deg(u)) }.sum
      }
      rank = nodes.map(v => v -> (base + inflow.getOrElse(v, 0L))).toMap
    }
    val expected = rank.toSeq
      .map { case (t, r) => (t, r, r.toDouble / 1.0e12) }
      .sortBy { case (t, r, _) => (-r, t) }
    assert(out.toSeq == expected, s"got ${out.toSeq} want $expected")
    // dangling c absorbs mass: total stays under SCALE (leak + truncation)
    assert(rank.values.sum <= S)
    // c collects from two predecessors — it must out-rank its feeders
    assert(out.head._1 == "c")
  }

  test("pagerank: the forced-distributed path agrees with the gated " +
    "driver loop on the catalog graph") {
    import org.apache.spark.sql.functions._
    val docs = graft.Graft.table(spark, sf, "documents")
    def graph() = {
      val edges = docs.select(explode(
          graft.plans.ShingleExpression.shingle_strings(col("text"), 2)).as("g"))
        .distinct()
        .select(split(col("g"), " ").getItem(0).as("w1"),
          split(col("g"), " ").getItem(1).as("w2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = docs.select(explode(
          graft.text.TextOps.tokens(col("text"))).as("t")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (edges, nodes)
    }
    val (e1, n1) = graph()
    val gated = GraphOps.PageRank.pagerankRanks(e1, n1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (e2, n2) = graph()
    val distributed = GraphOps.PageRank
      .pagerankRanks(e2, n2, smallGraphThreshold = 0L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(gated.nonEmpty && gated == distributed,
      s"paths diverge; sample=${(distributed.toSet -- gated.toSet).take(3)}")
  }

  test("pagerank on the catalog: ordered, consistent, above teleport base") {
    val out = GraphOps.PageRank.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    assert(out.map(_._2).toSeq == out.map(_._2).sortBy(-_).toSeq)
    out.foreach { case (_, units, pr) =>
      assert(pr == units.toDouble / 1.0e12)
      assert(units > 0L)
    }
  }

  test("triangles: a planted 4-clique and a pendant node count exactly") {
    import spark.implicits._
    // doc1 walks a 4-clique a-b-c-d (every pair an edge); doc2 hangs
    // pendant "e" off "a" (e closes no triangle). K4 has 4 triangles,
    // each vertex in C(3,2)=3 of them.
    val docs = Seq(
      (1L, "a b c d a c b d", "en", "s", 0L), // edges ab bc cd ac acb...
      (2L, "a e", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("tri_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // bigrams of doc1: ab bc cd da ac cb bd → undirected: ab bc cd ad ac bd
    // = all 6 K4 edges; doc2 adds ae
    val out = GraphOps.Triangles.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), s"$out")
    // catalog: per-token counts are positive and descending
    val cat = GraphOps.Triangles.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    spark.catalog.clearCache()
    assert(cat.nonEmpty && cat.forall(_._2 > 0))
    assert(cat.map(_._2).toSeq == cat.map(_._2).sortBy(-_).toSeq)
  }

  test("link prediction: a path graph predicts its endpoints; clique " +
    "pairs are suppressed as existing edges") {
    import spark.implicits._
    // doc1: path p-q-r-s (edges pq qr rs). Non-edges with common
    // neighbors: (p,r) via q, (q,s) via r — one common neighbor each.
    // doc2: triangle x-y-z — all pairs are edges, nothing predicted.
    val docs = Seq(
      (1L, "p q r s", "en", "s", 0L),
      (2L, "x y z x y", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("lp_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = GraphOps.LinkPredict.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(out.toSet == Set(("p", "r", 1L), ("q", "s", 1L)), s"${out.toSeq}")
    // predicted pairs on the catalog are never existing edges
    val und = GraphOps.undirectedTokenEdges(spark, sf)
    val edges = und.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val cat = GraphOps.LinkPredict.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)))
    spark.catalog.clearCache()
    assert(cat.forall(p => !edges.contains(p)), "a predicted pair is an edge")
  }

  test("degree distribution: histogram weights sum to the token count and " +
    "degree mass equals 2|E|") {
    import spark.implicits._
    // star: center c with leaves l1..l3 → degrees: c=3, leaves=1
    val docs = Seq((1L, "l1 c l2 c l3 c", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dd_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = GraphOps.DegreeDist.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    assert(out == Map(1L -> 3L, 3L -> 1L), s"$out")
    // catalog invariants: Σ(degree·n_tokens) = 2|E|, Σ n_tokens = |V|
    val und = GraphOps.undirectedTokenEdges(spark, sf)
    val nEdges = und.count()
    val nTokens = und.select("a").union(und.select("b")).distinct().count()
    val cat = GraphOps.DegreeDist.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    assert(cat.map { case (d, n) => d * n }.sum == 2 * nEdges)
    assert(cat.map(_._2).sum == nTokens)
  }
}
