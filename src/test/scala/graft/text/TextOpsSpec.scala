package graft.text

import graft.SparkSpec

/** Hand-computable fixtures for the token-association and language
  * evaluation operators (the rest of TextOps is pinned by oracles +
  * QueriesSpec).
  */
class TextOpsSpec extends SparkSpec {

  test("token lift ranks the exclusive collocation above the frequent one") {
    import spark.implicits._
    // doc1: "a b" always adjacent (3×); doc2: "c c" adjacent but c is
    // common. N = 10 tokens. lift(a,b) = 3·10/(3·3) ≈ 3.33;
    // lift(b,a) co=2 → 2.22; lift(c,c) = 3·10/(4·4) = 1.875
    val docs = Seq(
      (1L, "a b a b a b", "en", "s", 0L),
      (2L, "c c c c", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("lift_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.TokenLift.run(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(5)))
    assert(out.map(_._1).toSeq.take(1) == Seq(("a", "b")), out.mkString(", "))
    val byPair = out.map(t => t._1 -> t._3).toMap
    assert(math.abs(byPair(("a", "b")) - 30.0 / 9.0) < 1e-12)
    assert(math.abs(byPair(("c", "c")) - 30.0 / 16.0) < 1e-12)
    // descending lift order
    val lifts = out.map(_._3)
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y })
  }

  test("lang confusion matrix is the contingency table of LangId's output") {
    val docs = graft.Graft.table(spark, sf, "documents")
    val pred = TextOps.LangId.run(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val actual = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = actual.toSeq
      .map { case (id, lang) => (lang, pred(id)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = TextOps.LangConfusion.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got.values.sum == actual.size)
  }
}
