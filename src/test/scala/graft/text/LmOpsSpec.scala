package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_lm_surprisal: bits are positive and bounded by log2 of corpus size") {
    val out = LmOps.BigramSurprisal.run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val bits = r.getAs[Long]("bits_total")
      val mean = r.getAs[Double]("mean_bits")
      assert(n > 0 && bits >= 0)
      // add-one smoothing caps surprisal at log2(c1 + V) < 63 bits
      assert(mean >= 0 && mean < 63, s"implausible mean_bits $mean")
      assert(math.abs(mean - bits.toDouble / n.toDouble) == 0.0)
    }
  }

  test("LM scores repeated boilerplate lower than unseen text (held-out scoring)") {
    // train on a corpus where "a b" dominates; score two held-out docs:
    // one made of the dominant bigram, one of rare-but-seen bigrams.
    val train = Seq(
      (1L, Seq.fill(50)("a b").mkString(" ")),
      (2L, "c d e f g h")
    ).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b a b a b"), // typical
      (11L, "c d e f g h") // each bigram seen once
    ).toDF("doc_id", "text")
    val vocab = train.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val res = LmOps.surprisal(
        LmOps.bigramOccurrences(score),
        LmOps.bigramOccurrences(train), vocab)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_bits"))
      .toMap
    assert(res(10L) < res(11L),
      s"typical doc should score fewer bits: ${res(10L)} vs ${res(11L)}")
  }

  test("held-out scoring prices UNSEEN bigrams instead of dropping them") {
    // train vocabulary {a,b,c,d}, V = 4. Score a doc whose bigrams are:
    //   "a b"  — seen (c12 = 1, c1 = 2: occurrences "a b" and "a c")
    //   "b z"  — unseen pair, seen context b (c1 = 1)  -> (1+4) div 1 -> 2 bits
    //   "z q"  — unseen context entirely (c1 = 0)      -> (0+4) div 1 -> 2 bits
    // An inner-join formulation would keep only "a b" (n_bigrams = 1);
    // the add-one contract counts all 3.
    val train = Seq((1L, "a b a c d")).toDF("doc_id", "text")
    val score = Seq((10L, "a b z q")).toDF("doc_id", "text")
    val vocab = train.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val res = LmOps.surprisal(
        LmOps.bigramOccurrences(score),
        LmOps.bigramOccurrences(train), vocab)
      .collect()
    assert(res.length == 1)
    val r = res.head
    assert(r.getAs[Long]("n_bigrams") == 3L,
      s"unseen bigrams must be scored, not dropped: ${r.mkString(",")}")
    // "a b": floor(log2((2+4) div (1+1))) = floor(log2(3)) = 1 bit;
    // "b z" and "z q": 2 bits each (see above) -> total 5
    assert(r.getAs[Long]("bits_total") == 5L, r.mkString(","))
  }

  test("integer floor-log2 identity: length(bin(a div b)) - 1 == floor(log2(a/b))") {
    // the determinism trick the operator rests on — floor∘log2 commutes
    // with integer division for a >= b
    for (a <- 1L to 200L; b <- 1L to a) {
      val viaDiv = 63 - java.lang.Long.numberOfLeadingZeros(a / b)
      // exact floor(log2(a/b)): the k with 2^k * b <= a < 2^(k+1) * b,
      // found in pure integer arithmetic (double log2 misrounds near
      // powers of two, which is the whole reason the operator avoids it)
      val exact = (0 to 62).find(k => (b << k) <= a && a < (b << (k + 1))).get
      assert(viaDiv == exact, s"a=$a b=$b: $viaDiv != $exact")
    }
  }

  test("perplexity bands: terciles partition each language in surprisal order") {
    val out = LmOps.PplBandSelect.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byLang = out.groupBy(_._1)
    // independent doc counts per language from the raw table
    val docsPerLang = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1, 2, 3), s"$lang: missing band")
      // ntile sizes: n div 3 with the first (n mod 3) bands one larger
      val n = docsPerLang(lang)
      val want = (1 to 3).map(b => n / 3 + (if (b <= n % 3) 1 else 0))
      assert(sorted.map(_._3).toSeq == want, s"$lang: ntile sizes")
      // band ranges are ordered: head's max <= middle's min, etc.
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a._5 <= b._4, s"$lang: bands ${a._2}/${b._2} overlap")
      }
      // CCNet keep rule: head+middle kept entirely, tail dropped
      sorted.foreach { r =>
        assert(r._6 == (if (r._2 <= 2) r._3 else 0L), s"$lang keep rule")
      }
    }
  }
}
