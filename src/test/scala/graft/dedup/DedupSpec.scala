package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Near-dup detection over synthetic documents with known duplicates —
  * the pair-finding surfaces MinHash/SimHash queries can't oracle-check.
  */
class DedupSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    Seq(
      (0L, base),
      (1L, base),                                        // exact dup of 0
      (2L, base.replace("lazy", "sleepy")),              // near dup of 0
      (3L, "completely different content about spark catalyst optimizer rules " * 4),
      (4L, "another unrelated text on columnar storage and parquet footers " * 4)
    ).toDF("doc_id", "text")
  }

  test("minhash signatures: identical docs identical, near dups mostly agree") {
    val sig = Dedup.signatures(docsDf)
    val m = sig.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(0L) == m(1L))
    val agree01 = m(0L).zip(m(2L)).count { case (a, b) => a == b }
    assert(agree01 >= Dedup.NumHashes / 2, s"near-dup agreement only $agree01/16")
    val agree03 = m(0L).zip(m(3L)).count { case (a, b) => a == b }
    assert(agree03 <= 4, s"unrelated docs agree $agree03/16")
  }

  test("minhashCandidatePairs finds dup and near-dup, not unrelated pairs") {
    val pairs = Dedup.minhashCandidatePairs(docsDf, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 3L || b == 4L || a == 3L || a == 4L })
  }

  test("simhash: exact dups equal, near dups within small hamming distance") {
    val sh = Dedup.simhash(docsDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(2L)) <= 12, s"near-dup hamming ${ham(sh(0L), sh(2L))}")
    assert(ham(sh(0L), sh(3L)) > 12, s"unrelated hamming ${ham(sh(0L), sh(3L))}")
  }

  test("simhashNearDupPairs surfaces the exact-dup pair via block buckets") {
    val sims = Dedup.simhash(docsDf, "doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(sims, "doc_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0))
  }

  test("shingles: n=3 produces len-n+1 distinct word-grams") {
    import spark.implicits._
    val r = Seq(("a b c d e")).toDF("text")
      .select(Dedup.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d", "c d e"))
  }

  test("connectedComponents ≡ union-find on random graphs (independent oracle)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 2 trials: each convergence loop runs several Spark jobs — enough to
    // differentially pin the algorithm without dominating the suite
    for (trial <- 1 to 2) {
      val n = 20 + rnd.nextInt(30)
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        // plain-Scala union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonical label = min node id per component (what min-label
        // propagation converges to)
        val byRoot = nodes.groupBy(find)
        val want = byRoot.values.flatMap { ns =>
          val m = ns.min; ns.map(_ -> m)
        }.toMap
        // force the DISTRIBUTED path (threshold 0): the small-graph fast
        // path IS union-find, so differentially testing it against this
        // reference would be circular
        val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"),
            smallGraphThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"trial $trial: $got vs $want")
        // and the gated fast path must agree with the distributed path
        val fast = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(fast == got, s"trial $trial fast-path mismatch")
      }
    }
  }

  test("cluster representative is the highest-quality member of every cluster") {
    import org.apache.spark.sql.functions._
    val reps = Dedup.ClusterRepresentative.run(spark, sf).collect()
    val clusters = Dedup.DedupClusters.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same clustering: identical cluster ids and sizes as keep-min-id view
    assert(reps.map(r => r.getLong(0) -> r.getLong(3)).toMap == clusters)
    // each representative's quality equals the max quality in its cluster,
    // recomputed independently from labels + the shared quality expression
    val pairs = Dedup.minhashCandidatePairs(
      graft.Graft.table(spark, sf, "documents"), 0.5).persist()
    val labels = Dedup.connectedComponents(pairs)
    val best = graft.Graft.table(spark, sf, "documents")
      .join(labels, col("doc_id") === col("id"))
      .select(col("label"), graft.text.TextOps.qualityExpr(
        graft.text.TextOps.tokens(col("text"))).as("q"))
      .groupBy("label").agg(max(col("q")).as("qmax"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    reps.foreach { r =>
      assert(r.getDouble(2) == best(r.getLong(0)),
        s"cluster ${r.getLong(0)}: rep quality ${r.getDouble(2)} != max ${best(r.getLong(0))}")
    }
    spark.catalog.clearCache()
  }

  test("connectedComponents: chains, triangles and isolates get min-id labels") {
    import spark.implicits._
    // components: {1,2,3,4} (a chain — 1~2, 2~3, 3~4, transitive only),
    // {10,11,12} (a triangle), {20,21} (one edge)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("incremental dedup: batch docs duplicating the base are rejected," +
    " fresh ones admitted") {
    import spark.implicits._
    import graft.functions.PortableHash.md5Hex
    // recompute the operator's deterministic 20% batch split so the fixture
    // can plant a known duplicate across the boundary
    def isIncoming(id: Long): Boolean =
      java.lang.Long.parseLong(md5Hex(s"inc:$id").take(7), 16) % 5 == 0
    val ids = (0L until 40L)
    val incoming = ids.filter(isIncoming)
    val base = ids.filterNot(isIncoming)
    assert(incoming.nonEmpty && base.nonEmpty)
    val dupId = incoming.head // gets the same text as a base doc
    val docs = ids.map { id =>
      val text = if (id == dupId) s"shared text ${base.head}"
                 else s"unique text $id"
      (id, if (id == base.head) s"shared text ${base.head}" else text,
        "en", s"src${id % 2}", 0L)
    }.map { case (id, t, l, s, n) => (id, t, l, s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("incdedup_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.IncrementalDedup.run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    spark.catalog.clearCache()
    val totalIncoming = out.values.map(_._1).sum
    val totalDup = out.values.map(_._2).sum
    assert(totalIncoming == incoming.length)
    assert(totalDup == 1L, s"exactly the planted dup: $out")
    out.values.foreach { case (n, d, fresh) => assert(fresh == n - d) }
  }

  test("prefix join equals the brute-force Jaccard ≥ 0.6 pair set (no candidate lost)") {
    // the completeness guarantee of prefix filtering, checked differentially:
    // the operator's sub-quadratic candidate generation must reproduce the
    // all-pairs answer exactly (on 3-gram shingle sets, the operator's
    // representation)
    val docs = graft.Graft.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").toSeq.sliding(3)
          .filter(_.length == 3).map(_.mkString(" ")).toSet)
    val expected = (for {
      (a, ta) <- docs
      (b, tb) <- docs
      if a < b
      inter = (ta & tb).size
      union = ta.size + tb.size - inter
      if union > 0 && inter * 10 >= union * 6
    } yield (a, b, inter.toLong, union.toLong)).toSet
    val out = Dedup.PrefixJoin.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    spark.catalog.clearCache()
    assert(out.length == out.distinct.length, "no duplicate pairs")
    assert(out.toSet == expected,
      s"missing=${(expected -- out.toSet).take(5)} extra=${(out.toSet -- expected).take(5)}")
    assert(expected.nonEmpty, "fixture data should contain near-dup pairs")
  }

  test("minhash recall metrics agree with a direct set comparison of the two stages") {
    val docs = graft.Graft.table(spark, sf, "documents")
    val truth = Dedup.prefixJoinPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pred = Dedup.minhashCandidatePairs(docs, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val row = Dedup.MinhashRecall.run(spark, sf).collect().head
    spark.catalog.clearCache()
    val (nT, nP, nH) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nT == truth.size && nP == pred.size && nH == (truth & pred).size,
      s"($nT,$nP,$nH) vs (${truth.size},${pred.size},${(truth & pred).size})")
    assert(row.getDouble(3) == nH.toDouble / nP.toDouble)
    assert(row.getDouble(4) == nH.toDouble / nT.toDouble)
    // the banding layout is tuned for >=0.97 candidate probability at
    // J=0.6 — on the planted corpus the sketch should not miss badly
    assert(row.getDouble(4) >= 0.8, s"recall ${row.getDouble(4)}")
  }

  test("simhash recall metrics agree with a direct set comparison of the two stages") {
    val docs = graft.Graft.table(spark, sf, "documents")
    val truth = Dedup.prefixJoinPairs(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pred = Dedup.simhashNearDupPairs(
        Dedup.simhash(docs, "doc_id", "text"), "doc_id", Dedup.SimHashPairs.MaxDist)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val row = Dedup.SimhashRecall.run(spark, sf).collect().head
    spark.catalog.clearCache()
    val (nT, nP, nH) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nT == truth.size && nP == pred.size && nH == (truth & pred).size,
      s"($nT,$nP,$nH) vs (${truth.size},${pred.size},${(truth & pred).size})")
    assert(row.getDouble(3) == nH.toDouble / nP.toDouble)
    assert(row.getDouble(4) == nH.toDouble / nT.toDouble)
  }

  test("embed neardup lsh: perfect precision vs a driver-side brute force; " +
    "recall within the index's design band") {
    val vecs = graft.Graft.table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.round(v.toDouble * 1000000.0)).toArray)
      .toMap
    // exact truth set with the operator's own arithmetic (integer dot,
    // one IEEE division)
    def cosine(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var aa = 0L; var bb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble))
    }
    val ids = vecs.keys.toArray.sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      if cosine(vecs(ids(i)), vecs(ids(j))) >= 0.3
    } yield (ids(i), ids(j))).toSet
    val out = Dedup.EmbedNearDupLsh.run(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    spark.catalog.clearCache()
    assert(out.map(_._1).distinct.length == out.length, "pair dedup")
    out.foreach { case ((a, b), cos) =>
      assert(a < b, s"unordered pair ($a,$b)")
      assert(truth((a, b)), s"reported pair ($a,$b) below threshold")
      assert(cos == cosine(vecs(a), vecs(b)), s"cosine mismatch at ($a,$b)")
    }
    // sign-LSH at cosine 0.3 with 8 tables x 4 planes: expected pair
    // recall ~0.6; assert a conservative floor (misses are the documented
    // LSH trade, quantified per-layout by q_ann_recall)
    val recall = out.length.toDouble / truth.size
    assert(truth.nonEmpty && recall >= 0.4, s"recall $recall over ${truth.size}")
  }

  test("adaptive LSH: integer plane rule, candidates nest inside the fixed variant") {
    import Dedup.EmbedNearDupLshAdaptive.planesFor
    // smallest p in [4,24] with 2^p * 16 >= n — exact at the boundaries
    assert(planesFor(1) == 4)
    assert(planesFor(16L << 4) == 4)      // 256 fits 2^4 buckets exactly
    assert(planesFor((16L << 4) + 1) == 5)
    assert(planesFor(2000) == 7)          // the sf0.1 corpus
    assert(planesFor(20000) == 11)        // the sf1 corpus
    assert((4 to 23).forall(p => planesFor((16L << p)) <= planesFor((16L << p) + 1)))
    // nested planes: an adaptive bucket key agrees on bits 0..p-1 ⊇ the
    // fixed variant's bits 0..3, so every adaptive pair is a fixed pair —
    // the adaptive operator only ever REFINES the fixed candidate set
    val fixed = Dedup.EmbedNearDupLsh.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adaptive = Dedup.EmbedNearDupLshAdaptive.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    assert(adaptive.nonEmpty, "adaptive found no pairs at spec scale")
    assert(adaptive.forall(fixed), "adaptive emitted a pair the fixed variant lacks")
  }

  test("coverage curve: planted duplicate halves give a 0.5 closing dup rate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cov_spec").toString
    // ids 0..9; 5..9 repeat the texts of 0..4 → one doc per bucket,
    // all new in buckets 0-4, all duplicate in 5-9
    (0L until 10L).map(i => (i, s"text number ${i % 5}", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.CoverageCurve.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.length == 10)
    assert(out.map(_._1).toSeq == (0L until 10L))
    out.foreach { case (b, nd, nn, _, _, _) =>
      assert(nd == 1L && nn == (if (b < 5) 1L else 0L), s"bucket $b: $nd/$nn")
    }
    assert(out.last == ((9L, 1L, 0L, 10L, 5L, 0.5)), s"${out.last}")
    // catalog: dup rate is monotone-nondecreasing only if no bucket is
    // fresher than all before it — not guaranteed; instead check bounds
    val cat = Dedup.CoverageCurve.run(spark, sf).collect()
    assert(cat.nonEmpty)
    cat.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("dup size histogram: planted families land in their size classes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dupsz_spec").toString
    // family of 3 ("aaa"), family of 2 ("bbb"), two singletons
    Seq((1L, "aaa"), (2L, "aaa"), (3L, "aaa"), (4L, "bbb"), (5L, "bbb"),
      (6L, "ccc"), (7L, "ddd"))
      .map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.DupSizeHist.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 0L), (2L, 1L, 1L), (3L, 1L, 2L)),
      s"${out.toSeq}")
  }

}
