package graft.plans

import graft.{Graft, SparkSpec}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

class MinHashExpressionSpec extends SparkSpec {

  test("fused minhash_sig ≡ k× array_min(transform(pmod)) on real documents") {
    val docs = Graft.table(spark, sf, "documents")
    val hs = docs.select(col("doc_id"),
      Dedup.shingleHashes(Dedup.shingles(col("text"), 3)).as("hs"))
    val composable = array(Dedup.coefs.map { case (a, b) =>
      array_min(transform(col("hs"), h =>
        pmod(h * lit(a) + lit(b), lit(MinHashExpression.MersennePrime))))
    }: _*)
    val fused = MinHashExpression.minhash_sig(col("hs"),
      Dedup.coefs.map(_._1), Dedup.coefs.map(_._2))
    val mism = hs.select(fused.as("f"), composable.as("c"))
      .filter(col("f") =!= col("c")).count()
    assert(mism == 0)
  }
}
