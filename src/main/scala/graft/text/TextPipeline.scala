package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
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

  /** The full pipeline. */
  def cleanCorpus(docs: DataFrame, minTokens: Int = 5,
      minEstJaccard: Double = 0.7): DataFrame =
    nearDedup(exactDedup(qualityFilter(docs, minTokens)), minEstJaccard)
}
