package graft.plans

import graft.{Graft, SparkSpec}
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Fused LSH key expression ≡ the composable per-table/per-plane dot
  * expressions, over the real embeddings table.
  */
class LshExpressionSpec extends SparkSpec {

  test("lshKeysNative matches lshKeysQ on every embedding") {
    import graft.plans.VectorExpressions.quantize_vec
    val e = Graft.table(spark, sf, "embeddings")
      .select(col("vec_id"), quantize_vec(col("embedding")).as("q"))
    val native = e.select(col("vec_id"),
        Similarity.lshKeysNative(col("q"), 64).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val composed = e.select(col("vec_id"),
        Similarity.lshKeysQ(col("q"), 64).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native.nonEmpty)
    assert(native == composed)
  }
}
