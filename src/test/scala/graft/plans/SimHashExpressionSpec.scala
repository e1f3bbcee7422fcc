package graft.plans

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Native scan-side SimHash ≡ the explode + typed-aggregator formulation —
  * same tokens, same 60-bit md5-prefix hash, same occurrence votes — on
  * real documents and on the whitespace edge cases the tokenizer contract
  * pins down.
  */
class SimHashExpressionSpec extends SparkSpec {

  private def aggregatorForm(docs: org.apache.spark.sql.DataFrame) = {
    val agg = udaf(new graft.functions.Aggregators.SimHashAgg(Dedup.SimHashBits),
      org.apache.spark.sql.Encoders.scalaLong)
    docs.select(col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), graft.functions.PortableHash.pHash60(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg(agg(col("h")).as("simhash"))
  }

  test("simhash60 matches the explode + SimHashAgg formulation on edge cases") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the the the the",           // tf-weighting visible
      "solo",
      "",                          // empty text → one "" token
      "   ",                       // all spaces → SQL trim → "" token
      "  spaced   out\ttokens \n here  ",
      "a b c d \n\t ",             // trailing ws run past the spaces
      "répétition naïve café",     // multi-byte UTF-8 through md5
      "x y z " * 50
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    val native = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(1))
    val viaAgg = aggregatorForm(docs)
      .orderBy("doc_id").collect().map(_.getLong(1))
    native.zip(viaAgg).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"doc $i: native $a vs aggregator $b")
    }
  }

  test("simhash60 matches the aggregator on the sf0.001 documents corpus") {
    val docs = graft.Graft.table(spark, sf, "documents")
    val native = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    val viaAgg = aggregatorForm(docs)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(native.toSeq == viaAgg.toSeq)
  }

  test("simhash of near-identical docs differs in few bits (the sketch property)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy cat again and again today"),
      (3L, "completely unrelated words about distributed query engines and parquet")
    ).toDF("doc_id", "text")
    val h = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(3L)))
  }
}
