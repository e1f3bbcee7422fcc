package graft.plans

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._
import VectorExpressions.{count_eq, dot_long, quantize_vec}

/** The native expressions must be bit-equivalent to the composable SQL
  * formulation they replace (that formulation is what the DuckDB oracle
  * runs).
  */
class VectorExpressionsSpec extends SparkSpec {

  private def referenceQuant(c: org.apache.spark.sql.Column) =
    transform(c, x => round(x.cast("double") * lit(1000000.0)).cast("long"))

  test("quantize_vec ≡ round(x*1e6) on all real embeddings") {
    val emb = Graft.table(spark, sf, "embeddings")
    val mismatches = emb.select(
        quantize_vec(col("embedding")).as("a"),
        referenceQuant(col("embedding")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }

  test("quantize_vec agrees with round() on near-half adversarial values") {
    import spark.implicits._
    // exact .5 cases are impossible: k+0.5 scaled by 1e-6 is never a dyadic
    // rational, so no float input lands on one — values *near* halves must
    // still agree with the reference round() in both directions
    val adversarial = Seq(-0.0000025f, 0.0000025f, 0.0000015f, -0.0000015f,
      Float.MinPositiveValue, -Float.MinPositiveValue, 0f, 0.4999995f, -0.4999995f)
    val df = Seq(adversarial).toDF("v")
    val native = df.select(quantize_vec(col("v"))).head().getSeq[Long](0)
    val ref = df.select(referenceQuant(col("v"))).head().getSeq[Long](0)
    assert(native == ref)
  }

  test("dot_long ≡ aggregate(zip_with) fold on real embedding pairs") {
    val e = Graft.table(spark, sf, "embeddings").filter(col("vec_id") < 40)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val folded = aggregate(
      zip_with(referenceQuant(col("ea")), referenceQuant(col("eb")), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val mism = pairs.select(
        dot_long(quantize_vec(col("ea")), quantize_vec(col("eb"))).as("native"),
        folded.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(mism == 0)
  }

  test("count_eq ≡ size(filter(zip_with(eq))) on signature-like arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)), // 3 matches
      (Seq(1L, 2L), Seq(1L, 2L)),                 // all match
      (Seq(5L), Seq(6L)),                         // none
      (Seq.empty[Long], Seq.empty[Long])          // empty
    ).toDF("a", "b")
    val got = df.select(count_eq(col("a"), col("b")).as("native"),
        size(filter(zip_with(col("a"), col("b"), (x, y) => x === y),
          bb => bb)).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    assert(got.map(_.getInt(0)).toSeq == Seq(3, 2, 0, 0))
  }

  test("expressions survive codegen and interpreted paths identically") {
    import spark.implicits._
    val df = Seq((Seq(0.1f, -0.2f, 0.3f), Seq(0.4f, 0.5f, -0.6f))).toDF("a", "b")
    val d = df.select(dot_long(quantize_vec(col("a")), quantize_vec(col("b")))).head().getLong(0)
    // 100000*400000 + (-200000)*500000 + 300000*(-600000)
    assert(d == 100000L * 400000L - 200000L * 500000L - 300000L * 600000L)
  }
}
