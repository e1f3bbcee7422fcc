package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharGramsExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def composable(l: Int) = expr(
    s"transform(sequence(1, length(text) - ${l - 1}), i -> substring(text, i, $l))")

  test("char_grams == transform/substring chain on the real corpus") {
    val docs = graft.Graft.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val n = docs
      .select(col("doc_id"),
        CharGramsExpression.char_grams(col("text"), 20).as("a"),
        composable(20).as("b"))
      // the identity holds only for length >= L: below L the chain's
      // sequence(1, n<=0) DESCENDS and emits garbage grams from negative
      // substring positions, while char_grams returns the empty array
      .filter(length(col("text")) >= 20)
      .filter(not(col("a") === col("b")))
      .count()
    assert(n == 0)
  }

  test("edge cases: empty, shorter than L, exactly L, multibyte code points") {
    val rows = Seq("", "ab", "abcd", "aéöz", "héllo wörld ünïcode")
      .toDF("text")
      .select(col("text"),
        CharGramsExpression.char_grams(col("text"), 4).as("a"))
      .collect()
    val got = rows.map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("") == Seq())
    assert(got("ab") == Seq())
    assert(got("abcd") == Seq("abcd"))
    // multibyte: windows count CODE POINTS, slices keep full characters
    assert(got("aéöz") == Seq("aéöz"))
    assert(got("héllo wörld ünïcode") ==
      "héllo wörld ünïcode".sliding(4).toSeq)
  }

  test("1-based positions line up with substring semantics after posexplode") {
    val df = Seq(("abcdefg", 1L)).toDF("text", "doc_id")
      .select(col("doc_id"), posexplode(
        CharGramsExpression.char_grams(col("text"), 3)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("s"))
      .collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[String]("s"))
    assert(df.toSeq == Seq(1L -> "abc", 2L -> "bcd", 3L -> "cde",
      4L -> "def", 5L -> "efg"))
  }
}
