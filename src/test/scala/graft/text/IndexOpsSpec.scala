package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inverted-index / lexicon-scoring semantics beyond the oracle. */
class IndexOpsSpec extends SparkSpec {

  test("postings: heads are sorted, bounded, and df-consistent") {
    val rows = IndexOps.Postings.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val head = r.getString(2).split(",").filter(_.nonEmpty).map(_.toLong)
      assert(head.length == math.min(df, 8L),
        s"head must carry min(df, 8) ids: $r")
      assert(head.sameElements(head.sorted), s"head must be sorted: $r")
      assert(head.distinct.length == head.length, s"head must be distinct: $r")
    }
    // df of one sampled token matches a direct distinct-doc count
    val sample = rows.head
    val expect = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") === sample.getString(0))
      .select("doc_id").distinct().count()
    assert(sample.getLong(1) == expect)
  }

  test("mean token rank: bounded by the vocabulary and exactly divided") {
    val rows = IndexOps.MeanTokenRank.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val vocab = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .distinct().count()
    rows.foreach { r =>
      val (n, sum, mean) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(mean >= 1.0 && mean <= vocab.toDouble,
        s"mean rank outside [1, vocab]: $r")
      assert(mean == sum.toDouble / n.toDouble, "single exact IEEE division")
    }
  }

  test("mean token rank: common-word documents score lower") {
    // rank 1 is the most frequent token; a doc of only that token would
    // score exactly 1 — check the real corpus orders sensibly: the doc
    // minimizing mean rank must contain the top-ranked token.
    val occ = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    val top = occ.groupBy("token").count()
      .orderBy(col("count").desc, col("token").asc)
      .head.getString(0)
    val best = IndexOps.MeanTokenRank.run(spark, sf)
      .orderBy(col("mean_rank").asc, col("doc_id").asc).head.getLong(0)
    val tokensOfBest = occ.filter(col("doc_id") === best)
      .select("token").collect().map(_.getString(0)).toSet
    assert(tokensOfBest.contains(top))
  }

  test("bm25 matches a driver-side recompute of the exact formula") {
    // mirror the operator's fixed expression tree in plain Scala doubles —
    // same literals, same association — and require bit-equality
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val n = docs.length.toLong
    val totalDl = docs.map(_._2.length.toLong).sum
    val avgdl = totalDl.toDouble / n.toDouble
    val terms = Seq("spark", "vector", "dup")
    val dfs = terms.map(t => docs.count(_._2.contains(t)).toLong)
    val expected = docs.map { case (id, toks) =>
      val dl = toks.length.toLong
      val norm = 0.25 + (0.75 * dl.toDouble) / avgdl
      val score = terms.zip(dfs).map { case (t, df) =>
        val tf = toks.count(_ == t).toLong
        val idf = ((n - df).toDouble + 0.5) / (df.toDouble + 0.5)
        idf * ((tf.toDouble * 2.2) / (tf.toDouble + 1.2 * norm))
      }.reduceLeft(_ + _)
      (id, score)
    }.filter { case (id, _) => docs.find(_._1 == id).get._2.exists(terms.contains) }
      .sortBy { case (id, s) => (-s, id) }.take(10)
    val out = IndexOps.Bm25.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == expected.toSeq,
      s"got ${out.take(3).mkString(",")} want ${expected.take(3).mkString(",")}")
    assert(out.nonEmpty && out.head._2 > 0.0)
  }

  test("rrf fusion matches a driver-side recompute of both rankings") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val n = docs.length.toLong
    val totalDl = docs.map(_._2.length.toLong).sum
    val avgdl = totalDl.toDouble / n.toDouble
    val terms = Seq("spark", "vector", "dup")
    val dfs = terms.map(t => docs.count(_._2.contains(t)).toLong)
    val cands = docs.filter(_._2.exists(terms.contains))
    val scored = cands.map { case (id, toks) =>
      val dl = toks.length.toLong
      val norm = 0.25 + (0.75 * dl.toDouble) / avgdl
      val bm25 = terms.zip(dfs).map { case (t, df) =>
        val tf = toks.count(_ == t).toLong
        val idf = ((n - df).toDouble + 0.5) / (df.toDouble + 0.5)
        idf * ((tf.toDouble * 2.2) / (tf.toDouble + 1.2 * norm))
      }.reduceLeft(_ + _)
      val tfidf = terms.zip(dfs).map { case (t, df) =>
        val tf = toks.count(_ == t).toLong
        tf.toDouble * (n.toDouble / df.toDouble)
      }.reduceLeft(_ + _)
      (id, bm25, tfidf)
    }
    def ranks(key: ((Long, Double, Double)) => Double): Map[Long, Long] =
      scored.sortBy(t => (-key(t), t._1)).zipWithIndex
        .map { case (t, i) => t._1 -> (i + 1).toLong }.toMap
    val (rb, rt) = (ranks(_._2), ranks(_._3))
    val expected = scored.map { t =>
      val (ra, rr) = (rb(t._1), rt(t._1))
      (t._1, ra, rr,
        1.0 / (60.0 + ra.toDouble) + 1.0 / (60.0 + rr.toDouble))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(10)
    val out = IndexOps.RrfFusion.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == expected.toSeq,
      s"got ${out.take(3).mkString(",")} want ${expected.take(3).mkString(",")}")
    // both a high-bm25 and a high-tfidf doc contribute: fused ranks differ
    assert(out.nonEmpty && out.head._4 <= 2.0 / 61.0 + 1e-12)
  }

  test("phrase search: adjacency only, repeats counted, 1-based positions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("phrase_spec").toString
    Seq(
      (1L, "fast hash x fast hash", "en", "s", 0L), // matches at pos 1 and 4
      (2L, "fast x hash", "en", "s", 0L), // terms present, never adjacent
      (3L, "hash fast", "en", "s", 0L), // reversed order is no match
      (4L, "x fast hash", "en", "s", 0L)) // one match at pos 2
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = IndexOps.PhraseSearch.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L), (4L, 1L, 2L)), s"${out.toSeq}")
  }
}
