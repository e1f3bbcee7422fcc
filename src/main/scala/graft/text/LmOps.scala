package graft.text

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical language-model scoring over the corpus — the
  * perplexity-filter stage of a training-data pipeline (CCNet-style: score
  * each document under an n-gram LM and gate/bucket on the score; here the
  * LM is a bigram model with add-one smoothing trained on the corpus
  * itself, so the signal is "how typical is this document of the corpus").
  *
  * Determinism design: floating-point log-probabilities sum in
  * accumulation order, so a double-summed perplexity can never hash-match
  * across engines. Instead each bigram occurrence contributes its INTEGER
  * bit-surprisal
  *
  *   bits = floor(log2((c(w1) + V) / (c(w1 w2) + 1)))
  *        = length(bin((c1 + V) div (c12 + 1))) - 1
  *
  * — the integer part of the Shannon surprisal of the add-one-smoothed
  * conditional P(w2|w1) = (c12+1)/(c1+V). `floor(log2(floor(a/b))) =
  * floor(log2(a/b))` for a ≥ b, so integer division loses NOTHING of the
  * floor-log2 (no scaling constant needed, no overflow risk at any corpus
  * size), and `length(bin(x))` is exact in both engines. Per-occurrence
  * values are BIGINTs, partial sums are exact and order-independent, and
  * the final mean is one double division of identical operands — the same
  * exactness argument as [[CorpusOps]]' rarity score. Granularity is 1 bit
  * per occurrence; averaged over a document's hundreds of bigrams the
  * score resolves fractions of a bit, which is the resolution perplexity
  * gates actually use.
  */
object LmOps {

  /** Bigram occurrences (one row per adjacent token pair, NOT distinct —
    * an LM counts occurrences, unlike the shingle-dedup pipelines). The
    * pair list is built scan-side with the native
    * [[graft.plans.SkipGramExpression.adjacent_pairs]] kernel (one
    * primitive loop; the retired `transform(sequence(...))` spelling ran
    * an interpreted lambda per position): no self-join, no positional
    * explode — at 100 TB the bigram stream is emitted by the same task
    * that read the page.
    */
  def bigramOccurrences(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(col("doc_id"),
        explode(graft.plans.SkipGramExpression.adjacent_pairs(col("arr"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Score `docs` under a bigram LM trained on `corpus` (both in the
    * [[bigramOccurrences]] shape). Factored so the spec can train on one
    * frame and score another (held-out scoring); the registered query
    * trains and scores on the same corpus, which is the dedup-adjacent
    * "find the atypical documents" readout.
    *
    * Held-out contract: bigrams UNSEEN in training are exactly what
    * add-one smoothing prices, so the model joins are LEFT joins with
    * zero-count fallbacks — an unseen pair under a seen context scores
    * `floor(log2((c1 + V) / 1))`, and an unseen context scores
    * `floor(log2((0 + V) / 1))` = the uniform 1/V event. Inner joins here
    * would silently drop precisely those events and deflate
    * n_bigrams/bits_total (the train == score registered query never hits
    * this branch: every scored bigram is a trained bigram, so the left
    * joins degenerate to inner and the oracle is unchanged).
    */
  def surprisal(scoreOcc: DataFrame, trainOcc: DataFrame, vocabSize: DataFrame): DataFrame = {
    val big = trainOcc.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // c1 = Σ_w2 c12: derived from the bigram counts instead of a THIRD
    // full tokenize+emit pass over trainOcc — a context appears in ctx iff
    // it heads some training bigram (the exact same condition as appearing
    // in big), and its occurrence count is the sum of its bigrams' counts,
    // so the row set and values are identical to counting trainOcc directly.
    val ctx = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
    // two token-keyed shuffle joins (the tf-idf shape); the vocab size is a
    // broadcast scalar. c12 <= c1 (c12 null => c1 may be null too, both
    // coalesce to 0) guarantees the div argument >= 1 for V >= 1.
    scoreOcc.join(big, Seq("w1", "w2"), "left").join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocabSize))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("CAST(length(bin((coalesce(c1, 0L) + v) div " +
          "(coalesce(c12, 0L) + 1))) - 1 AS BIGINT)"))
          .as("bits_total"))
      .select(col("doc_id"), col("n_bigrams"), col("bits_total"),
        (col("bits_total").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_bits"))
      .orderBy("doc_id")
  }

  /** Per-document mean bigram surprisal (bits) under the corpus-trained
    * add-one bigram LM — low = boilerplate-typical, high = atypical. The
    * distributed shape is: one scan-side bigram emit, two token-keyed
    * aggregates (bigram and context counts), two equi-joins back onto the
    * occurrence stream, one doc-keyed aggregate. Nothing materializes
    * wider than (doc_id, w1, w2) and nothing is all-pairs.
    */
  object BigramSurprisal extends GraftQuery {
    val name = "q_lm_surprisal"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Graft.table(spark, sfDir, "documents")
      val occ = bigramOccurrences(docs)
      val vocab = docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
        .agg(countDistinct(col("tok")).as("v"))
      surprisal(occ, occ, vocab)
    }
    val oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) t),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM occ GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) AS c1 FROM occ GROUP BY 1),
        |vocab AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(l) AS tok FROM toks))
        |SELECT doc_id, count(*) AS n_bigrams,
        |       CAST(sum(length(bin((c1 + v) // (c12 + 1))) - 1) AS BIGINT)
        |         AS bits_total,
        |       CAST(CAST(sum(length(bin((c1 + v) // (c12 + 1))) - 1) AS BIGINT) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS mean_bits
        |FROM occ JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vocab
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  }

  /** CCNet-style perplexity-band selection (Wenzek 2020): bucket each
    * language's documents into head / middle / tail terciles by LM
    * surprisal and keep head+middle — the quality gate CCNet, RedPajama,
    * and their descendants run after language ID. Banding uses the
    * INTEGER scaled mean (bits_total · 10⁶ div n_bigrams) with a doc_id
    * tiebreak, so the tercile boundary is a total order both engines
    * replay exactly (a raw double mean would make boundary docs
    * accumulation-order-dependent). Output is the per-(lang, band)
    * audit: doc counts, the band's scaled-surprisal range, and the keep
    * decision. Plan: the surprisal joins (scan-side bigram emit + two
    * token-keyed aggregates), one lang-keyed ntile window, one tiny
    * aggregate — the window partitions by language, so at 100 TB each
    * language's rank runs in its own partition set; no global sort.
    */
  object PplBandSelect extends GraftQuery {
    val name = "q_ppl_band_select"
    private val Scale = 1000000L
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Graft.table(spark, sfDir, "documents")
      val occ = bigramOccurrences(docs)
      val vocab = docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
        .agg(countDistinct(col("tok")).as("v"))
      val scored = surprisal(occ, occ, vocab)
        .select(col("doc_id"), col("n_bigrams"), col("bits_total"))
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
        .withColumn("sbits", expr(s"bits_total * $Scale div n_bigrams"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("sbits").asc, col("doc_id").asc)
      scored.withColumn("band", ntile(3).over(w))
        .groupBy("lang", "band")
        .agg(count(lit(1)).as("n_docs"),
          min("sbits").as("sbits_min"), max("sbits").as("sbits_max"),
          sum(when(col("band") <= 2, 1L).otherwise(0L)).as("n_kept"))
        .orderBy("lang", "band")
    }
    val oracle = Some(
      s"""WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
        |  FROM documents),
        |occ AS (
        |  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) t),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM occ GROUP BY 1, 2),
        |ctx AS (SELECT w1, count(*) AS c1 FROM occ GROUP BY 1),
        |vocab AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(l) AS tok FROM toks)),
        |scored AS (
        |  SELECT occ.doc_id, count(*) AS n_bigrams,
        |         CAST(sum(length(bin((c1 + v) // (c12 + 1))) - 1) AS BIGINT)
        |           AS bits_total
        |  FROM occ JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vocab
        |  GROUP BY occ.doc_id),
        |banded AS (
        |  SELECT d.lang, s.doc_id,
        |         s.bits_total * $Scale // s.n_bigrams AS sbits,
        |         CAST(ntile(3) OVER (PARTITION BY d.lang
        |           ORDER BY s.bits_total * $Scale // s.n_bigrams, s.doc_id)
        |           AS INT) AS band
        |  FROM scored s JOIN documents d USING (doc_id))
        |SELECT lang, band, count(*) AS n_docs,
        |       min(sbits) AS sbits_min, max(sbits) AS sbits_max,
        |       CAST(sum(CASE WHEN band <= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_kept
        |FROM banded GROUP BY 1, 2 ORDER BY lang, band""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(BigramSurprisal, PplBandSelect)
}
