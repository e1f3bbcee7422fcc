package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native winnow expression ≡ the composable SQL formulation (the form the
  * DuckDB oracle replays) — gram hashing, partial trailing windows,
  * dedup+sort, and the short-doc edge cases.
  */
class WinnowExpressionSpec extends SparkSpec {

  private val K = 8
  private val W = 4

  private def sqlForm = expr(
    s"""array_sort(array_distinct(
       |  transform(sequence(1, greatest(size(hs) - ${W - 1}, 1)),
       |    j -> array_min(slice(hs, j, $W)))))""".stripMargin)

  private def sqlHashes = expr(
    s"""IF(length(t) >= $K,
       |   transform(sequence(1, length(t) - ${K - 1}),
       |     i -> cast(conv(substring(md5(substring(t, i, $K)), 1, 7), 16, 10) as bigint)),
       |   array())""".stripMargin)

  test("winnow_fps matches the composable transform/slice form") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaa", // repeated grams → heavy dedup
      "exactly8", // one gram
      "short", // < K chars → empty
      "123456789ab", // fewer grams than W → single partial window
      "x " * 40
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), col("text").cast("binary").as("t"))

    val native = docs.select(col("id"),
      WinnowExpression.winnow_fps(col("t"), K, W).as("fps"))
    val composed = docs.select(col("id"), sqlHashes.as("hs"))
      .select(col("id"), when(size(col("hs")) > 0, sqlForm)
        .otherwise(array().cast("array<bigint>")).as("fps"))

    val n = native.orderBy("id").collect().map(_.getSeq[Long](1))
    val c = composed.orderBy("id").collect().map(_.getSeq[Long](1))
    n.zip(c).foreach { case (a, b) => assert(a == b) }
    assert(n(3).isEmpty) // < K chars
    assert(n(2).length == 1) // single gram → single fingerprint
  }
}
