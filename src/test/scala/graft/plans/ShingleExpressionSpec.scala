package graft.plans

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Native fused shingle hashing ≡ the composable split/zip_with/distinct/
  * md5 chain — including first-occurrence dedup ORDER, whitespace runs,
  * and short-doc edge cases.
  */
class ShingleExpressionSpec extends SparkSpec {

  test("shingle_hashes matches shingleHashes(shingles(text, 3)) element-wise") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c a b c a b c", // repeated shingles → dedup order matters
      "one two three",     // exactly one shingle
      "one two",           // too short → empty
      "",                  // empty text
      "  spaced   out\ttokens \n here  ",
      "x y z " * 30,
      "two three four\n",  // trailing non-space ws survives SQL trim →
      "\tlead tab start",  //   empty trailing/leading token, kept by split
      "a b c d \n\t "      // mixed trailing run ending past the spaces
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

    val native = docs.select(col("id"),
      ShingleExpression.shingle_hashes(col("text"), 3).as("hs"))
    val composed = docs.select(col("id"),
      Dedup.shingleHashes(Dedup.shingles(col("text"), 3)).as("hs"))

    val n = native.orderBy("id").collect().map(_.getSeq[Long](1))
    val c = composed.orderBy("id").collect().map(_.getSeq[Long](1))
    n.zip(c).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"doc $i: native $a vs composed $b")
    }
    assert(n(3).isEmpty && n(4).isEmpty)
    assert(n(2).length == 1)
  }

  test("shingle_strings matches shingles(text, 2) element-wise") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox", "a b a b a b", "solo", "", "  x   y  "
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = docs.select(col("id"),
        ShingleExpression.shingle_strings(col("text"), 2).as("sh"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    val composed = docs.select(col("id"), Dedup.shingles(col("text"), 2).as("sh"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    native.zip(composed).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"doc $i: native $a vs composed $b")
    }
    assert(native(1) == Seq("a b", "b a"))
  }

  test("signatures through the native hasher keep the oracle formulation's values") {
    // end-to-end: MinHash signature of a known doc is identical through
    // both hashing paths (the LSH band math downstream is unchanged)
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val viaNative = Dedup.signatures(docs).collect().head.getSeq[Long](1)
    val viaComposed = docs
      .select(col("doc_id"), Dedup.shingleHashes(Dedup.shingles(col("text"), 3)).as("hs"))
      .select(col("doc_id"), Dedup.minhashSignature(col("hs")).as("sig"))
      .collect().head.getSeq[Long](1)
    assert(viaNative == viaComposed)
  }
}
