package graft.text

import graft.SparkSpec

/** Differential proof for the BPE trainer: an INDEPENDENT plain-Scala BPE
  * implementation (mutable maps, sequential greedy merges) must learn the
  * exact same merge list from the same word-frequency dictionary. This is
  * the oracle for `q_bpe_merges` — the training loop is iterative, so the
  * DuckDB gate records rows-only and exactness is proven here.
  */
class BpeTrainSpec extends SparkSpec {

  /** Reference BPE: textbook sequential implementation, no Spark. */
  private def referenceBpe(dict: Seq[(String, Long)],
      rounds: Int): Seq[(String, String, Long)] = {
    var seqs: Seq[(Vector[String], Long)] =
      dict.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, n) <- seqs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + n
      if (counts.nonEmpty) {
        // argmax: count desc, then pair text asc ("a b" string order, the
        // engine's tie rule)
        val ((l, r), c) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, a + " " + b) }
        out += ((l, r, c))
        seqs = seqs.map { case (s, n) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2 // greedy left-to-right
            } else { b += s(i); i += 1 }
          }
          (b.result(), n)
        }
      }
    }
    out.result()
  }

  test("q_bpe_merges ≡ independent sequential BPE on the same dictionary") {
    val dict = BpeTrain.wordDict(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(dict.nonEmpty)
    val want = referenceBpe(dict, BpeTrain.Merges)
    val got = BpeTrain.train(spark, sf)
      .map(m => (m.left, m.right, m.pair_count))
    assert(got == want, s"\nspark: $got\nref  : $want")
    spark.catalog.clearCache()
  }

  test("merge fold handles overlap greedily left-to-right (aaa → [aa, a])") {
    import spark.implicits._
    val df = Seq("aaa", "aa", "ababa").toDF("w")
      .select(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("w"), "").as("sym"))
    val merged = df.select(
      BpeTrain.mergePair(org.apache.spark.sql.functions.col("sym"), "a", "a")
        .as("m")).collect().map(_.getSeq[String](0).toList)
    assert(merged(0) == List("aa", "a"))
    assert(merged(1) == List("aa"))
    assert(merged(2) == List("a", "b", "a", "b", "a"))
  }

  test("replace-chain application ≡ the greedy fold, merge by merge") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // every tricky shape: back-to-back pairs, overlap, created-symbol reuse
    val words = Seq("that", "then", "inn", "aaa", "thethe", "banana", "x")
    val df = words.toDF("w")
    // fold side: apply FrozenMerges sequentially via mergePair
    val foldTok = BpeTrain.BpeApply.FrozenMerges.foldLeft(split(col("w"), "")) {
      case (sym, (a, b)) => BpeTrain.mergePair(sym, a, b)
    }
    val got = df.select(col("w"), size(foldTok).as("n_fold"),
        BpeTrain.BpeApply.tokensAfterMerges(col("w")).as("n_chain"))
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2), r.getString(0)))
  }

  test("q_bpe_merges output: dense ranks, positive counts, merged = left+right") {
    val rows = graft.SparkEntry.queries("q_bpe_merges")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= BpeTrain.Merges)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0)
    }
    spark.catalog.clearCache()
  }
}
