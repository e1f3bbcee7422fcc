package graft.text

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skip-gram training-pair generation — the data-prep step of the word2vec
  * family (Mikolov et al. 2013) and the counting pass of GloVe (Pennington
  * et al. 2014): every (center, context) token pair within a ±[[W]] window,
  * weighted by distance. GloVe's harmonic 1/d weights are made EXACT by
  * scaling with lcm(1..W): for W = 3 the per-occurrence weight is
  * 6/d ∈ {6, 3, 2} — integer division with zero remainder by construction,
  * so the weighted counts are BIGINT-exact on both engines (the same
  * no-floats stance as the trainer tier).
  *
  * Scale shape: pair emission is scan-side (one nested transform over the
  * token array — the [[LmOps.bigramOccurrences]] shape widened to ±W), the
  * aggregate is one (center, context)-keyed map-side-combinable sum, and
  * the readout is a bounded distributed TakeOrdered — at 100 TB the only
  * shuffle is the pair-keyed aggregate, with 2·W rows per token, and
  * nothing all-pairs anywhere.
  */
object SkipGramOps {

  private[text] val W = 3 // window radius
  private[text] val Scale = 6 // lcm(1..W): exact harmonic weights 6/d
  private[text] val TopN = 300

  /** Directional windowed pair occurrences: (center, context, d) for every
    * ordered pair at distance d ≤ [[W]] — both directions, the word2vec
    * convention (each token is center once per neighbor). Emitted by the
    * native kernel ([[graft.plans.SkipGramExpression]]); the retired
    * nested-transform spelling ran two interpreted lambdas and a
    * 2-struct array allocation per (i, d) and dominated the query
    * (1.1 s of 1.4 s at sf0.1) — SkipGramExpressionSpec differentials the
    * kernel against it row for row.
    */
  private[text] def pairOccurrences(docs: DataFrame): DataFrame =
    docs.select(TextOps.tokens(col("text")).as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(explode(
        graft.plans.SkipGramExpression.skipgram_pairs(col("arr"), W)).as("p"))
      .select(col("p.center"), col("p.context"), col("p.d"))

  /** Top co-occurring pairs by exact distance-weighted count. */
  object SkipgramPairs extends GraftQuery {
    val name = "q_skipgram_pairs"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      pairOccurrences(Graft.table(spark, sfDir, "documents"))
        .groupBy("center", "context")
        .agg(count(lit(1)).as("n_pairs"),
          // `div` (integer division — `/` would widen to DOUBLE); exact:
          // d ∈ 1..W divides Scale = lcm(1..W) with zero remainder
          sum(expr(s"CAST($Scale AS BIGINT) div CAST(d AS BIGINT)"))
            .as("weight"))
        .orderBy(col("weight").desc, col("center").asc, col("context").asc)
        .limit(TopN)
    val oracle = Some(
      s"""WITH toks AS (
         |  SELECT string_split_regex(trim(text), '\\s+') AS l FROM documents),
         |occ AS (
         |  SELECT l[i] AS center, l[i + d] AS context, d
         |  FROM toks,
         |       LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) t,
         |       LATERAL (SELECT unnest(generate_series(1, $W)) AS d) s
         |  WHERE i + d <= len(l)
         |  UNION ALL
         |  SELECT l[i + d] AS center, l[i] AS context, d
         |  FROM toks,
         |       LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) t,
         |       LATERAL (SELECT unnest(generate_series(1, $W)) AS d) s
         |  WHERE i + d <= len(l))
         |SELECT center, context, count(*) AS n_pairs,
         |       CAST(sum($Scale // d) AS BIGINT) AS weight
         |FROM occ GROUP BY 1, 2
         |ORDER BY weight DESC, center ASC, context ASC LIMIT $TopN""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(SkipgramPairs)
}
