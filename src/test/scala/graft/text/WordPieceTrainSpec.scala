package graft.text

import graft.SparkSpec

/** Differential proof for the WordPiece trainer: an INDEPENDENT
  * plain-Scala implementation (mutable maps, sequential merges, exact
  * FRACTION comparison via BigInt cross-multiplication — deliberately
  * NOT the engine's double score, so a double-ordering artifact would
  * surface as a mismatch) must learn the same merge list from the same
  * dictionary. Plus unit pins for the `##` spelling and prefix-stripped
  * merge naming.
  */
class WordPieceTrainSpec extends SparkSpec {

  /** Reference WordPiece: textbook sequential implementation. */
  private def referenceWp(dict: Seq[(String, Long)],
      rounds: Int): Seq[(String, String, Long)] = {
    var seqs: Seq[(Vector[String], Long)] = dict.map { case (w, n) =>
      (w.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c
      }.toVector, n)
    }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val pair = scala.collection.mutable.Map.empty[(String, String), Long]
      val sym = scala.collection.mutable.Map.empty[String, Long]
      for ((s, n) <- seqs) {
        for (x <- s) sym(x) = sym.getOrElse(x, 0L) + n
        for (i <- 0 until s.length - 1)
          pair((s(i), s(i + 1))) = pair.getOrElse((s(i), s(i + 1)), 0L) + n
      }
      if (pair.nonEmpty) {
        // argmax of cnt/(nl·nr) by exact cross-multiplied fractions;
        // ties by "l r" string ascending (the engine's rule)
        val best = pair.toSeq.reduceLeft { (x, y) =>
          val ((xl, xr), xc) = x; val ((yl, yr), yc) = y
          val lhs = BigInt(xc) * BigInt(sym(yl)) * BigInt(sym(yr))
          val rhs = BigInt(yc) * BigInt(sym(xl)) * BigInt(sym(xr))
          if (lhs > rhs) x
          else if (lhs < rhs) y
          else if ((xl + " " + xr) <= (yl + " " + yr)) x else y
        }
        val ((l, r), c) = best
        out += ((l, r, c))
        val merged = l + r.stripPrefix("##")
        seqs = seqs.map { case (s, n) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              b += merged; i += 2
            } else { b += s(i); i += 1 }
          }
          (b.result(), n)
        }
      }
    }
    out.result()
  }

  test("q_wordpiece_merges ≡ independent sequential WordPiece with exact-fraction argmax") {
    val dict = BpeTrain.wordDict(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(dict.nonEmpty)
    val want = referenceWp(dict, WordPieceTrain.Merges)
    val got = WordPieceTrain.train(spark, sf)
      .map(m => (m.left, m.right, m.pair_count))
    assert(got == want, s"\nspark: $got\nref  : $want")
    spark.catalog.clearCache()
  }

  test("initial spelling carries the ## continuation prefix") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq("hello", "a").toDF("w")
      .select(WordPieceTrain.initialSyms(col("w")).as("sym"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("h", "##e", "##l", "##l", "##o"), List("a")))
  }

  test("merged symbol strips the continuation prefix of the right side only") {
    assert(WordPieceTrain.mergedName("h", "##e") == "he")
    assert(WordPieceTrain.mergedName("##l", "##o") == "##lo")
    assert(WordPieceTrain.mergedName("he", "##llo") == "hello")
  }

  test("merge fold replaces pairs greedily left-to-right with the renamed symbol") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Seq("a", "##b", "##a", "##b")).toDF("sym")
    val got = df.select(
      WordPieceTrain.mergePair(col("sym"), "##a", "##b", "##ab").as("m"))
      .collect().head.getSeq[String](0).toList
    assert(got == List("a", "##b", "##ab"))
  }
}
