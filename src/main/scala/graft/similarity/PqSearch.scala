package graft.similarity

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PQ asymmetric-distance search (ADC) — the serving path of IVF-PQ, the
  * billion-scale ANN standard (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search"): vectors are stored only as
  * their M-byte PQ codes ([[VectorOps.PqCodes]]); at query time the UNCODED
  * query builds a tiny per-subspace lookup table of distances to every
  * codebook centroid, and each candidate's approximate distance is M table
  * lookups summed — no raw candidate vector is ever touched. This completes
  * the PQ family: `q_pq_codes` proved the encoder, these two queries prove
  * the search and measure what the code compression loses.
  *
  * Determinism: all distances live on the engine's quantized integer grid
  * ([[graft.plans.VectorExpressions.quantize_vec]]), so ADC table entries,
  * their M-way sums, and the exact-side L2 distances are exact BIGINTs;
  * top-k ties break on neighbor id, and recall is one double division of
  * identical integers — the [[Ivf]] evaluation stance.
  *
  * Scale shape (the reason ADC exists): the codebook (M·K subvectors) and
  * the per-query ADC tables (Q·M·K BIGINTs) are broadcast; the only
  * N-sized streams are the code assignment (scan + broadcast codebook,
  * partial top-1 under the window) and the lookup join (codes ⋈ broadcast
  * tables on (subspace, code) → partial-aggregated M-way sums) — raw
  * vectors never shuffle, and per-query work is O(N·M) lookups plus a
  * distributed top-k. The exact side of the recall query is the documented
  * bounded eval tier: Q=[[QueryMax]] anchor queries broadcast onto one
  * linear scan (`crossJoin(broadcast(anchors))`, the sampled-recall idiom).
  */
object PqSearch {

  /** Must mirror [[VectorOps.PqCodes]]'s geometry (8×8 over 64 dims, 16
    * codes) so `q_pq_topk` searches exactly the codes `q_pq_codes` proves.
    */
  private val M = 8 // subspaces
  private val Sub = 8 // dims per subspace
  private val K = 16 // centroids per codebook
  private val QueryMax = 30 // anchor queries (the Ivf eval-tier size)
  private val TopK = 10

  /** Quantized vectors: (vec_id, q). */
  private def quantized(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.plans.VectorExpressions.quantize_vec
    Graft.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), quantize_vec(col("embedding")).as("q"))
  }

  /** Exact integer L2 between two equal-length quantized arrays — the
    * native codegen kernel ([[graft.plans.PqExpressions.L2Long]]); the
    * composable `aggregate(zip_with(...))` spelling ran two interpreted
    * lambdas per element per pair and dominated the ADC bench (the same
    * finding that moved the cosine path to
    * [[graft.plans.VectorExpressions.DotLong]]).
    */
  private def l2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.plans.PqExpressions.l2_long(a, b)

  /** The sampled codebook as ONE broadcastable row: an array of M·K
    * subvectors indexed s·K + code (built by array_sort on the unique
    * index, so collect_list's nondeterministic order cannot leak).
    */
  private def codebookRow(prep: DataFrame): DataFrame =
    prep.filter(col("vec_id") < K)
      .select(col("vec_id").cast("int").as("code"),
        explode(sequence(lit(0), lit(M - 1))).as("s"), col("q"))
      .select(struct((col("s") * K + col("code")).as("k"),
        slice(col("q"), col("s") * Sub + 1, lit(Sub)).as("v")).as("e"))
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(transform(col("es"), e => e.getField("v")).as("cb"))

  /** Scan-side PQ code assignment against a broadcast codebook row:
    * argmin by (distance, code) per subspace — `q_pq_codes`' exact rule
    * (strict `<` over ascending code), as ONE native codegen loop
    * ([[graft.plans.PqExpressions.PqCodesExpr]]). The previous composable
    * fold ran M·K interpreted lambda steps per vector, each allocating a
    * subvector slice and an accumulator struct; the kernel does the
    * identical integer arithmetic in place (spec-differentialled).
    */
  private def codesExpr: org.apache.spark.sql.Column =
    graft.plans.PqExpressions.pq_codes(col("q"), col("cb"), M, Sub, K)

  /** ADC top-k per anchor query, restructured so NOTHING N-sized shuffles:
    * codes are assigned scan-side (broadcast codebook row), each anchor's
    * M·K lookup table is precomputed into a second broadcast row, the
    * candidate stream (vec × query, Q rows per vector) is produced and
    * summed inside the scan, and the per-query top-[[TopK]] runs as
    * row_number + filter — which Spark plans as WindowGroupLimit, keeping
    * only tasks·Q·k rows ahead of the one exchange. Shuffle volume is
    * therefore INDEPENDENT of N (measured: the join+aggregate formulation
    * this replaced shuffled Θ(Q·N) rows, 1.35M at sf1; this shape
    * shuffles a few thousand at any scale).
    */
  private def adcTopK(prep: DataFrame): DataFrame = {
    val cb = codebookRow(prep)
    val qts = prep.filter(col("vec_id") < QueryMax)
      .crossJoin(broadcast(cb))
      .select(struct(col("vec_id").cast("long").as("query_id"),
        // native ADC table build: table[s·K + c] = L2(subvector s, cb entry)
        // — same layout as the flatten(transform(transform(l2))) spelling
        graft.plans.PqExpressions.adc_table(col("q"), col("cb"), M, Sub, K)
          .as("table")).as("e"))
      .agg(array_sort(collect_list(col("e"))).as("qts"))
    val byQuery = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    prep.crossJoin(broadcast(cb))
      .select(col("vec_id"), codesExpr.as("codes"))
      .crossJoin(broadcast(qts))
      .select(col("vec_id").as("neighbor_id"), col("codes"),
        explode(col("qts")).as("qt"))
      .filter(col("neighbor_id") =!= col("qt.query_id"))
      .select(col("qt.query_id").as("query_id"), col("neighbor_id"),
        // native M-lookup ADC sum (Σ_s table[s·K + codes[s]])
        graft.plans.PqExpressions.adc_sum(col("codes"), col("qt.table"), K)
          .as("adist"))
      .withColumn("rank", row_number().over(byQuery))
      .filter(col("rank") <= TopK)
  }

  /** Shared oracle CTEs through the ADC top-k. */
  private def adcCtes: String =
    s"""q AS (
       |  SELECT vec_id, (i - 1) // $Sub AS s, (i - 1) % $Sub AS p,
       |         CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS q
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |               generate_subscripts(embedding, 1) AS i FROM embeddings)),
       |cent AS (
       |  SELECT s, p, CAST(vec_id AS INT) AS code, q AS cq
       |  FROM q WHERE vec_id < $K),
       |dists AS (
       |  SELECT q.vec_id, q.s, c.code,
       |         CAST(sum((q.q - c.cq) * (q.q - c.cq)) AS BIGINT) AS dist
       |  FROM q JOIN cent c ON q.s = c.s AND q.p = c.p
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT vec_id, s, code,
       |           row_number() OVER (PARTITION BY vec_id, s
       |                              ORDER BY dist, code) AS rn
       |    FROM dists) WHERE rn = 1),
       |adc AS (
       |  SELECT vec_id AS query_id, s, code, dist AS adist
       |  FROM dists WHERE vec_id < $QueryMax),
       |approx AS (
       |  SELECT a.query_id, c.vec_id AS neighbor_id,
       |         CAST(sum(a.adist) AS BIGINT) AS adist
       |  FROM codes c JOIN adc a ON a.s = c.s AND a.code = c.code
       |  WHERE c.vec_id <> a.query_id
       |  GROUP BY 1, 2),
       |approxk AS (
       |  SELECT query_id, neighbor_id, adist,
       |         CAST(rank AS INTEGER) AS rank FROM (
       |    SELECT query_id, neighbor_id, adist,
       |           row_number() OVER (PARTITION BY query_id
       |                              ORDER BY adist, neighbor_id) AS rank
       |    FROM approx) WHERE rank <= $TopK)""".stripMargin

  /** The ADC search readout itself: every anchor query's top-[[TopK]]
    * neighbors by asymmetric PQ distance, distances exact BIGINTs.
    */
  object PqTopK extends GraftQuery {
    val name = "q_pq_topk"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      adcTopK(quantized(spark, sfDir))
        .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"))
        .orderBy("query_id", "rank")
    val oracle = Some(
      s"""WITH $adcCtes
         |SELECT query_id, neighbor_id, adist, rank
         |FROM approxk ORDER BY query_id, rank""".stripMargin)
  }

  /** Recall@[[TopK]] of ADC against exact quantized-grid L2 — what the
    * M-byte code compression loses, the PQ sibling of `q_ivf_recall` (index
    * loss) and `q_trunc_recall` (representation loss). Exact side: anchors
    * broadcast onto one linear scan, integer L2, same tie-break.
    */
  object PqRecall extends GraftQuery {
    val name = "q_pq_recall"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // persisted barrier: the quantized scan feeds the anchor frame, the
      // exact brute-force side, the codebook row, the query tables, and
      // the candidate scan (harness clearCache releases it)
      val prep = quantized(spark, sfDir).persist()
      val anchors = prep.filter(col("vec_id") < QueryMax)
        .select(col("vec_id").as("query_id"), col("q").as("qq"))
      val byQuery = Window.partitionBy("query_id")
        .orderBy(col("dist").asc, col("neighbor_id").asc)
      val exactk = prep.crossJoin(broadcast(anchors))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          l2(col("q"), col("qq")).as("dist"))
        .withColumn("rank", row_number().over(byQuery))
        .filter(col("rank") <= TopK)
        .select(col("query_id"), col("neighbor_id"))
      val approxk = adcTopK(prep)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exactk.join(approxk, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
        .orderBy("query_id")
    }
    val oracle = Some(
      s"""WITH $adcCtes,
         |exact_d AS (
         |  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
         |         CAST(sum((qa.q - qb.q) * (qa.q - qb.q)) AS BIGINT) AS dist
         |  FROM q qa JOIN q qb ON qb.s = qa.s AND qb.p = qa.p
         |                     AND qb.vec_id <> qa.vec_id
         |  WHERE qa.vec_id < $QueryMax
         |  GROUP BY 1, 2),
         |exactk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id
         |                              ORDER BY dist, neighbor_id) AS rank
         |    FROM exact_d) WHERE rank <= $TopK)
         |SELECT e.query_id, count(*) AS n_exact,
         |       count(a.neighbor_id) AS n_hit,
         |       CAST(count(a.neighbor_id) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) AS recall
         |FROM exactk e LEFT JOIN approxk a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(PqTopK, PqRecall)
}
