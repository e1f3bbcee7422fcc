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
}
