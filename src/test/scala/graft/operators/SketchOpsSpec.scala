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

}
