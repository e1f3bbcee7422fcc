package graft.text

import graft.{Graft, GraftQuery}
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-corpus cleaning pipeline — the end-to-end shape a
  * 100 TB text pipeline runs, built entirely from this engine's operators:
  *
  *   quality gate → exact dedup (md5 keep-min) → MinHash near-dup removal
  *
  * Each stage is shuffle-on-small-keys; document text itself shuffles only
  * in the exact-dedup hop (and even there could be keyed by fingerprint
  * alone — kept simple since the verify stage needs the text anyway).
  */
object TextPipeline {

  /** Quality gate: stopword-ratio and token-count thresholds (the
    * length/punct/stopword family from [[TextOps.QualityScore]]).
    */
  def qualityFilter(docs: DataFrame, minTokens: Int = 5, minStopRatio: Double = 0.0): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(TextOps.stopwords.map(lit): _*)))
    docs.filter(nTok >= minTokens &&
      (nStop.cast("double") / nTok.cast("double")) >= minStopRatio)
  }

  /** Exact dedup: keep the lowest doc_id per normalized-text fingerprint. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keep = docs
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("fp"))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(keep, "doc_id")
  }

  /** Near-dup removal: MinHash candidate pairs above the estimated-Jaccard
    * threshold; drop the higher doc_id of each pair (keep-first policy,
    * transitively applied).
    */
  def nearDedup(docs: DataFrame, minEstJaccard: Double = 0.7): DataFrame = {
    val drop = Dedup.minhashCandidatePairs(docs, minEstJaccard)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** The full pipeline. The exact-dedup survivor set is persisted: three
    * consumers read it (the MinHash signature build, the near-dup drop
    * list's anti-join probe, and the final output), and without a barrier
    * each re-runs the quality-gate tokenization and fingerprint join from
    * the scan. At 100 TB this stage is also the natural Parquet checkpoint
    * ([[graft.sources.Sources.checkpoint]]) between corpus-prep jobs.
    */
  def cleanCorpus(docs: DataFrame, minTokens: Int = 5,
      minEstJaccard: Double = 0.7): DataFrame = {
    val deduped = exactDedup(qualityFilter(docs, minTokens))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nearDedup(deduped, minEstJaccard)
  }

  /** The composed pipeline as a driver query: quality gate → exact dedup →
    * MinHash near-dup removal → per-language survivor stats. EVERY stage is
    * replayed by the DuckDB oracle — quality predicate, keep-min-id dedup,
    * the full MinHash signature/band/bucket math, the est-Jaccard ≥ 0.7
    * drop rule — so the hash match certifies the end-to-end cleaning
    * semantics, not just one operator. This is the flagship shape: what a
    * 100 TB corpus-prep run actually executes.
    */
  object CleanCorpus extends GraftQuery {
    val name = "q_clean_corpus"
    private val MinTokens = 5
    private val MinEstJaccard = 0.7
    def run(spark: SparkSession, sfDir: String): DataFrame =
      cleanCorpus(Graft.table(spark, sfDir, "documents"), MinTokens, MinEstJaccard)
        .select(col("lang"), col("doc_id"),
          size(TextOps.tokens(col("text"))).as("n_tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          min(col("doc_id")).as("min_doc"))
        .orderBy("lang")
    // est-Jaccard ≥ 0.7 over 16 minhashes ⇔ matches ≥ 12 (11/16 = 0.6875).
    // Derived by the SAME comparison the engine runs (m/N >= threshold in
    // IEEE doubles) — ceil(threshold*N) can overshoot when the double
    // product lands just above an exact integer (0.1*20 = 2.0000…4).
    private val minMatches =
      (0 to Dedup.NumHashes)
        .find(m => m.toDouble / Dedup.NumHashes >= MinEstJaccard).get
    val oracle = Some(
      s"""WITH q AS (
         |  SELECT doc_id, text, lang FROM documents
         |  WHERE len(string_split_regex(trim(text), '\\s+')) >= $MinTokens),
         |keep AS (
         |  SELECT min(doc_id) AS doc_id
         |  FROM (SELECT doc_id, md5(lower(trim(text))) AS fp FROM q)
         |  GROUP BY fp),
         |d AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
         |${Dedup.minhashOracleCtes("d")},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |  FROM bk a JOIN bk b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT c.da, c.db, count(*) FILTER (WHERE sa.s = sb.s) AS m
         |  FROM cand c JOIN sig sa ON sa.doc_id = c.da
         |              JOIN sig sb ON sb.doc_id = c.db AND sb.i = sa.i
         |  GROUP BY 1, 2),
         |dropd AS (SELECT DISTINCT db AS doc_id FROM est WHERE m >= $minMatches),
         |final AS (
         |  SELECT * FROM d
         |  WHERE NOT EXISTS (SELECT 1 FROM dropd WHERE dropd.doc_id = d.doc_id))
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
         |       min(doc_id) AS min_doc
         |FROM final GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(CleanCorpus)
}
