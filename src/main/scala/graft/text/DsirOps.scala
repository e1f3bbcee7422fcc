package graft.text

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw document
  * by the log-likelihood ratio of a TARGET hashed-n-gram model over a RAW
  * hashed-n-gram model, then keep the top-weighted documents. The target
  * here is one source's documents (`src0` — the "trusted domain" proxy the
  * paper instantiates with Wikipedia/books); the raw model is the whole
  * corpus.
  *
  * Determinism design (same trick as [[LmOps]]): the paper's per-feature
  * log(p_f/q_f) becomes the INTEGER bit-surprisal difference
  *
  *   delta_f = bits_raw(f) − bits_target(f)
  *   bits_m(f) = floor(log2((N_m + B) / (c_m(f) + 1)))      — add-one
  *
  * so a document's importance score is an exact, order-independent BIGINT
  * sum (positive ⇔ the document looks more target-like than corpus-like).
  * Resampling itself is rank-based (score desc, doc_id asc) rather than
  * Gumbel-noise-based — the reproducible analog, consistent with the
  * hash-deterministic sampling stance of `q_epoch_shuffle` /
  * `q_stratified_sample`.
  *
  * Scale shape — the best in the text tier: hashed-feature count tables
  * are bounded by B = 4096 rows REGARDLESS of corpus size, so both model
  * joins are broadcasts; the only data-sized operations are the scan-side
  * bigram emit and one doc-keyed aggregate. No token-keyed shuffle at
  * all (unlike tf-idf / `q_lm_surprisal`, whose vocab tables are
  * corpus-shaped).
  */
object DsirOps {

  /** Hash-bucket count (the paper's hashed n-gram featurization). */
  val B = 4096

  val TargetSource = "src0"

  /** (doc_id, source, f): one row per bigram occurrence, hashed into
    * [0, B) — emitted scan-side with source carried through, so no
    * doc-keyed join ever materializes. md5-derived so the oracle replays
    * bucket membership.
    */
  def features(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(col("doc_id"), col("source"), explode(
        graft.plans.PortableHashExpression.bigram_feats(col("arr"), B)).as("f"))

  /** (doc_id, source, n_feats, bits_delta, mean_delta) for every doc with
    * ≥ 1 bigram. source rides the group key (functionally dependent on
    * doc_id) so the selection step needs no join back to the table.
    */
  private def scored(spark: SparkSession, sfDir: String): DataFrame = {
    // persisted single-scan barrier (the q_merge_upsert idiom): the occ
    // subtree feeds BOTH ≤B-row model aggregates, both scalar totals,
    // and the scoring join — without the barrier each consumer
    // re-featurizes the corpus (5 scans); with it, one. The totals are
    // 1-row aggregates read as driver literals (the documented bounded
    // idiom), which also makes the count the barrier's materialization.
    val occ = features(Graft.table(spark, sfDir, "documents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRawV = occ.count()
    val nTgtV = occ.filter(col("source") === TargetSource).count()
    val raw = occ.groupBy("f").agg(count(lit(1)).as("c_raw"))
    val tgt = occ.filter(col("source") === TargetSource)
      .groupBy("f").agg(count(lit(1)).as("c_tgt"))
    occ.join(broadcast(raw), Seq("f"))
      .join(broadcast(tgt), Seq("f"), "left")
      .select(col("doc_id"), col("source"),
        expr(s"CAST(length(bin(($nRawV + $B) div (c_raw + 1))) " +
          s"- length(bin(($nTgtV + $B) div (coalesce(c_tgt, 0) + 1))) AS BIGINT)")
          .as("delta"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_feats"), sum(col("delta")).as("bits_delta"))
      .select(col("doc_id"), col("source"), col("n_feats"), col("bits_delta"),
        (col("bits_delta").cast("double") / col("n_feats").cast("double"))
          .as("mean_delta"))
  }

  private val scoredCtes =
    s"""toks AS (
       |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS l
       |  FROM documents),
       |occ AS (
       |  SELECT doc_id, source,
       |         ('0x' || substr(md5(l[i] || ' ' || l[i + 1]), 1, 15))::BIGINT
       |           % $B AS f
       |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) t),
       |raw AS (SELECT f, count(*) AS c_raw FROM occ GROUP BY 1),
       |tgt AS (SELECT f, count(*) AS c_tgt FROM occ
       |        WHERE source = '$TargetSource' GROUP BY 1),
       |n_raw AS (SELECT count(*) AS n_raw FROM occ),
       |n_tgt AS (SELECT count(*) AS n_tgt FROM occ
       |          WHERE source = '$TargetSource'),
       |scored AS (
       |  SELECT doc_id, source, count(*) AS n_feats,
       |         CAST(sum(length(bin((n_raw + $B) // (c_raw + 1)))
       |                  - length(bin((n_tgt + $B) // (coalesce(c_tgt, 0) + 1)))) AS BIGINT)
       |           AS bits_delta
       |  FROM occ JOIN raw USING (f)
       |           LEFT JOIN tgt USING (f)
       |           CROSS JOIN n_raw CROSS JOIN n_tgt
       |  GROUP BY doc_id, source)""".stripMargin

  /** Per-document DSIR importance score in integer bits. */
  object DsirScore extends GraftQuery {
    val name = "q_dsir_score"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      scored(spark, sfDir)
        .select(col("doc_id"), col("n_feats"), col("bits_delta"),
          col("mean_delta"))
        .orderBy("doc_id")
    val oracle = Some(
      s"""WITH $scoredCtes
         |SELECT doc_id, n_feats, bits_delta,
         |       CAST(bits_delta AS DOUBLE) / CAST(n_feats AS DOUBLE) AS mean_delta
         |FROM scored ORDER BY doc_id""".stripMargin)
  }

  /** The selection step: top-50 non-target documents by importance rank
    * (score desc, doc_id asc — the deterministic analog of the paper's
    * Gumbel resampling), with their sources — the "does the selected set
    * drift toward target-like material" readout. TakeOrderedAndProject,
    * not a global sort.
    */
  object DsirSelect extends GraftQuery {
    val name = "q_dsir_select"
    private val K = 50
    def run(spark: SparkSession, sfDir: String): DataFrame =
      scored(spark, sfDir)
        .filter(col("source") =!= TargetSource)
        .orderBy(col("bits_delta").desc, col("doc_id").asc)
        .limit(K)
        .select(col("doc_id"), col("source"), col("bits_delta"))
        .orderBy("doc_id")
    val oracle = Some(
      s"""WITH $scoredCtes,
         |sel AS (
         |  SELECT doc_id, source, bits_delta FROM scored
         |  WHERE source <> '$TargetSource'
         |  ORDER BY bits_delta DESC, doc_id ASC
         |  LIMIT $K)
         |SELECT doc_id, source, bits_delta FROM sel ORDER BY doc_id""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(DsirScore, DsirSelect)
}
