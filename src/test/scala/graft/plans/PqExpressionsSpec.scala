package graft.plans

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._
import PqExpressions.{adc_sum, adc_table, l2_long, pq_assign, pq_codes}
import VectorExpressions.quantize_vec

/** The native PQ/ADC kernels must be bit-equivalent to the composable
  * `aggregate(zip_with(slice(...)))` formulation they replaced (that
  * formulation is what the DuckDB oracle replays) — differentialled over
  * the real embeddings table so every subspace/centroid/tie path the
  * registered queries exercise is covered.
  */
class PqExpressionsSpec extends SparkSpec {

  private val M = 8
  private val Sub = 8
  private val K = 16

  /** Composable L2 — the exact spelling the kernels replaced. */
  private def refL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0L), (acc, x) => acc + x)

  private def prep = Graft.table(spark, sf, "embeddings")
    .select(col("vec_id"), quantize_vec(col("embedding")).as("q"))

  /** The 1-row codebook in PqSearch.codebookRow's layout (index s·K+code). */
  private def cbRow = prep.filter(col("vec_id") < K)
    .select(col("vec_id").cast("int").as("code"),
      explode(sequence(lit(0), lit(M - 1))).as("s"), col("q"))
    .select(struct((col("s") * K + col("code")).as("k"),
      slice(col("q"), col("s") * Sub + 1, lit(Sub)).as("v")).as("e"))
    .agg(array_sort(collect_list(col("e"))).as("es"))
    .select(transform(col("es"), e => e.getField("v")).as("cb"))

  test("l2_long ≡ aggregate(zip_with) fold on real embedding pairs") {
    val e = prep.filter(col("vec_id") < 40)
    val a = e.select(col("vec_id").as("ia"), col("q").as("qa"))
    val b = e.select(col("vec_id").as("ib"), col("q").as("qb"))
    val mism = a.crossJoin(b)
      .select(l2_long(col("qa"), col("qb")).as("x"),
        refL2(col("qa"), col("qb")).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(mism == 0)
  }

  test("pq_codes / pq_assign ≡ the composable per-subspace argmin fold") {
    val refCodes = transform(sequence(lit(0), lit(M - 1)), s =>
      aggregate(sequence(lit(0), lit(K - 1)),
        struct(lit(Long.MaxValue).as("d"), lit(-1).as("c")),
        (acc, c) => {
          val d = refL2(slice(col("q"), s * Sub + 1, lit(Sub)),
            element_at(col("cb"), s * K + c + 1))
          when(d < acc.getField("d"), struct(d.as("d"), c.as("c")))
            .otherwise(acc)
        }))
    val df = prep.crossJoin(broadcast(cbRow))
    val mism = df.select(
        pq_codes(col("q"), col("cb"), M, Sub, K).as("a"),
        transform(refCodes, e => e.getField("c")).as("b"),
        transform(pq_assign(col("q"), col("cb"), M, Sub, K),
          e => e.getField("code")).as("a2"),
        transform(pq_assign(col("q"), col("cb"), M, Sub, K),
          e => e.getField("dist")).as("d2"),
        transform(refCodes, e => e.getField("d")).as("db"))
      .filter(col("a") =!= col("b") || col("a2") =!= col("b") ||
        col("d2") =!= col("db"))
      .count()
    assert(mism == 0)
  }

  test("adc_table ≡ flatten(transform(transform(l2))) and adc_sum ≡ the M-lookup fold") {
    val refTable = flatten(transform(sequence(lit(0), lit(M - 1)), s =>
      transform(sequence(lit(0), lit(K - 1)), c =>
        refL2(slice(col("q"), s * Sub + 1, lit(Sub)),
          element_at(col("cb"), s * K + c + 1)))))
    val df = prep.filter(col("vec_id") < 40).crossJoin(broadcast(cbRow))
      .select(col("q"), col("cb"),
        adc_table(col("q"), col("cb"), M, Sub, K).as("t"),
        refTable.as("rt"),
        pq_codes(col("q"), col("cb"), M, Sub, K).as("codes"))
    assert(df.filter(col("t") =!= col("rt")).count() == 0)
    val refSum = aggregate(sequence(lit(0), lit(M - 1)), lit(0L), (acc, s) =>
      acc + element_at(col("t"), s * K + element_at(col("codes"), s + 1) + 1))
    assert(df.select(adc_sum(col("codes"), col("t"), K).as("x"), refSum.as("y"))
      .filter(col("x") =!= col("y")).count() == 0)
  }
}
