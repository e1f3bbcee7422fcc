package graft.operators

import graft.SparkSpec

/** Count-Min semantics beyond the oracle hash-match: the one-sided error
  * guarantee and collision-free exactness on a small vocabulary.
  */
class SketchOpsSpec extends SparkSpec {

  test("count-min never underestimates and is exact without collisions") {
    import spark.implicits._
    // 3 distinct tokens over depth 3 × width 512 cells — collision
    // probability across rows is negligible, so every estimate is exact
    val docs = Seq(
      (1L, "a a a b", "en", "s", 0L),
      (2L, "b c", "en", "s", 0L),
      (3L, "a c c", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("cms_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SketchOps.CountMin.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(t => t._1 -> t._2).toMap == Map("a" -> 4L, "b" -> 2L, "c" -> 3L))
    out.foreach { case (tok, exact, est, over) =>
      assert(est == exact && over == 0L, s"$tok: est $est vs exact $exact")
    }
  }

  test("count-min on the corpus: one-sided error, probes are the true top-k") {
    val out = SketchOps.CountMin.run(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: CMS underestimated ${r.getLong(2)} < ${r.getLong(1)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // probes arrive in exact-count order
    val exact = out.map(_.getLong(1))
    assert(exact.zip(exact.tail).forall { case (a, b) => a >= b })
  }

  test("kmv merge law: merged per-stratum sketches equal the one-shot " +
    "global sketch, cross-stratum duplicates collapse") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Encoders
    // users 0..599 spread over 3 strata, users 0..99 present in ALL of
    // them (their hashes enter three per-stratum sketches; the merge must
    // count each once)
    val rows = (for {
      (t, lo, hi) <- Seq(("a", 0L, 400L), ("b", 0L, 300L), ("c", 0L, 600L))
      u <- lo until hi
    } yield (u * 7L, u * 1000000000L, u, t, 1.0, "{}")).zipWithIndex
      .map { case ((_, ts, u, t, v, p), i) => (i.toLong, ts, u, t, v, p) }
    val dir = java.nio.file.Files.createTempDirectory("kmv_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SketchOps.KmvMerge.run(spark, dir).collect()
    assert(out.length == 1)
    val (nStrata, exactUsers, est) =
      (out.head.getLong(0), out.head.getLong(1), out.head.getDouble(2))
    assert(nStrata == 3L && exactUsers == 600L)
    // one-shot global sketch over the raw user set, same aggregator
    val kmvUdaf = udaf(
      new graft.functions.Aggregators.KmvPortable(256), Encoders.scalaLong)
    val direct = graft.Graft.table(spark, dir, "events")
      .select(graft.functions.PortableHash.pHash60(
        col("user_id").cast("string")).as("h"))
      .distinct().agg(kmvUdaf(col("h"))).collect().head.getDouble(0)
    assert(est == direct, s"merged $est != direct $direct")
    // 600 distinct > k=256 ⇒ the estimator path (not exact-count) ran,
    // and it lands within the sketch's ~3-sigma band
    assert(math.abs(est - exactUsers) / exactUsers < 0.25, s"est $est")
  }

  test("kmv merge on the catalog matches the one-shot sketch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Encoders
    val est = SketchOps.KmvMerge.run(spark, sf).collect().head.getDouble(2)
    val kmvUdaf = udaf(
      new graft.functions.Aggregators.KmvPortable(256), Encoders.scalaLong)
    val direct = graft.Graft.table(spark, sf, "events")
      .select(graft.functions.PortableHash.pHash60(
        col("user_id").cast("string")).as("h"))
      .distinct().agg(kmvUdaf(col("h"))).collect().head.getDouble(0)
    assert(est == direct)
  }
  test("join-size estimate: one-sided and anchored to the true join count") {
    val r = SketchOps.JoinSizeEst.run(spark, sf).collect().head
    spark.catalog.clearCache()
    val actual = graft.Graft.table(spark, sf, "orders").as("o")
      .join(graft.Graft.table(spark, sf, "lineitem").as("l"),
        org.apache.spark.sql.functions.col("o.o_orderkey") ===
          org.apache.spark.sql.functions.col("l.l_orderkey"))
      .count()
    assert(r.getLong(0) == actual, s"exact_n must equal the real join size: $r")
    assert(r.getLong(2) >= 0L, s"CMS estimate must never undercount: $r")
  }

  test("bloom: byte-array build ≡ relational distinct-positions build, " +
    "OR-merge law, and no false negatives") {
    import graft.functions.BloomBits
    val m = 1 << 11 // much smaller than the query's 2^15: ~42% load, so
    // false positives occur with near-certainty (expected ≈ 9 of 125)
    val kH = 3
    val seen = (0 until 500).filter(_ % 4 != 0)
      .map(i => s"http://s${i % 13}.example/d$i")
    val cands = (0 until 500).filter(_ % 2 == 0)
      .map(i => s"http://s${i % 13}.example/d$i")
    // relational form: the DISTINCT occupied positions, as BloomSeen
    // materializes them
    val posSet = seen.flatMap(u => (0 until kH)
      .map(k => BloomBits.position(k, u, m))).toSet
    def relPass(u: String): Boolean =
      (0 until kH).forall(k => posSet.contains(BloomBits.position(k, u, m)))
    // byte form, built as 4 independent partition partials then merged
    val partials = seen.grouped((seen.size + 3) / 4).map { part =>
      val b = BloomBits.empty(m)
      part.foreach(BloomBits.add(b, _, kH))
      b
    }.toSeq
    val mergedLtr = partials.reduceLeft(BloomBits.merge)
    val mergedRtl = partials.reduceRight(BloomBits.merge)
    assert(java.util.Arrays.equals(mergedLtr, mergedRtl),
      "OR-merge must be order-independent")
    val onePass = BloomBits.empty(m)
    seen.foreach(BloomBits.add(onePass, _, kH))
    assert(java.util.Arrays.equals(mergedLtr, onePass),
      "merged partials must equal the one-shot build")
    // decision identity + no false negatives
    val seenSet = seen.toSet
    cands.foreach { u =>
      assert(BloomBits.maybeContains(mergedLtr, u, kH) == relPass(u),
        s"byte vs relational decision diverged for $u")
      if (seenSet.contains(u))
        assert(BloomBits.maybeContains(mergedLtr, u, kH),
          s"false negative for seen url $u")
    }
    // the small m must actually exercise collisions: some genuinely-new
    // candidate passes (otherwise the identity above is vacuous)
    assert(cands.exists(u => !seenSet.contains(u) &&
      BloomBits.maybeContains(mergedLtr, u, kH)),
      s"fixture produced zero false positives at m=$m — not exercised")
  }

  test("bloom query: per-host confusion sums to the slice arithmetic, " +
    "zero misses") {
    val rows = SketchOps.BloomSeen.run(spark, sf).collect()
    assert(rows.length == 13)
    rows.foreach { r =>
      assert(r.getLong(5) == 0L, s"bloom false negative on ${r.getString(0)}")
      assert(r.getLong(2) == r.getLong(3) + r.getLong(4),
        s"n_pass != n_seen + n_fp on ${r.getString(0)} (miss=0 ⇒ equality)")
    }
    // candidates = doc_id % 2 == 0 (250 of 500 at sf0.01); seen ∩
    // candidates = doc_id ≡ 2 (mod 4) = 125, MINUS the round-13
    // case-distinct class: doc_id ≡ 5 (mod 13) candidates arrive at
    // the uppercase /D<id> path, which is genuinely NOT the seen
    // /d<id> page under the frontier key — ids ≡ 2 (mod 4) ∧ ≡ 5
    // (mod 13) ⇔ ≡ 18 (mod 52) ⇒ 10 ids in [0, 500) ⇒ 115 seen
    val total = rows.map(_.getLong(1)).sum
    val seen = rows.map(_.getLong(3)).sum
    assert(total == 250L && seen == 115L,
      s"slice arithmetic off: $total candidates / $seen seen at sf0.01")
  }

}
