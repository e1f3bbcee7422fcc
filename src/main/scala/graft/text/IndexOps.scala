package graft.text

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index and lexicon-scoring operators — the retrieval-side
  * companions to the corpus-construction pack ([[CorpusOps]]): posting-list
  * construction for a bounded term band, and a unigram-lexicon document
  * score (mean corpus rank of each token occurrence — the log-free,
  * integer-exact stand-in for unigram-LM perplexity scoring).
  */
object IndexOps {

  /** Inverted-index construction: every token → its document frequency and
    * the HEAD of its sorted posting list (first [[Postings.Head]] doc ids).
    *
    * Scale shape: the head is rank-pruned BEFORE any list is materialized —
    * a per-token `row_number` over doc id runs as WindowGroupLimit (each
    * map task forwards at most Head rows per token it sees), so no
    * stop-word ever accumulates a corpus-sized collect state (the classic
    * inverted-index OOM); the full-df count is a separate plain aggregate.
    * A production caller materializing FULL posting lists instead shards
    * them — `groupBy(token, doc_id div shard)` — which is this same plan
    * with a compound key. The (doc,token) occurrence frame is persisted:
    * both the df aggregate and the head collect consume it, and without
    * the barrier the second consumer would re-run the corpus explode.
    */
  object Postings extends GraftQuery {
    val name = "q_postings"
    private val Head = 8
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val occ = Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfreq = occ.groupBy("token").agg(count(lit(1)).as("df"))
      val head = occ
        .withColumn("rk", row_number().over(
          Window.partitionBy("token").orderBy(col("doc_id").asc)))
        .filter(col("rk") <= Head)
        .groupBy("token")
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      dfreq.join(head, Seq("token"))
        .select(col("token"), col("df"),
          concat_ws(",", transform(col("docs"), d => d.cast("string")))
            .as("posting_head"))
        .orderBy("token")
    }
    val oracle = Some(
      s"""WITH occ AS (
         |  SELECT DISTINCT doc_id, token FROM (
         |    SELECT doc_id,
         |           unnest(string_split_regex(trim(text), '\\s+')) AS token
         |    FROM documents)),
         |dfreq AS (
         |  SELECT token, count(*) AS df FROM occ GROUP BY 1),
         |head AS (
         |  SELECT token, list_sort(list(doc_id)) AS docs FROM (
         |    SELECT token, doc_id,
         |           row_number() OVER (PARTITION BY token ORDER BY doc_id ASC)
         |             AS rk
         |    FROM occ)
         |  WHERE rk <= $Head GROUP BY token)
         |SELECT token, df,
         |       array_to_string(docs, ',') AS posting_head
         |FROM dfreq JOIN head USING (token)
         |ORDER BY token""".stripMargin)
  }

  /** Unigram-lexicon document scoring: rank every token by corpus
    * frequency (1 = most common), then score each document by the mean
    * rank of its token OCCURRENCES — low = built from common words
    * (boilerplate), high = unusual vocabulary. This is the order-statistic
    * twin of `q_rarity_score` (which weights by inverse df): rank sums are
    * exact BIGINTs through every shuffle, and the single final division is
    * the only floating-point op, so the score is engine-exact without the
    * `ln` that makes true perplexity un-oracle-able. Plan: token-keyed count
    * aggregate → vocab-sized rank window → occurrence⋈rank token join →
    * doc-keyed sum.
    */
  object MeanTokenRank extends GraftQuery {
    val name = "q_mean_token_rank"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val occ = Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      val ranked = occ.groupBy("token").agg(count(lit(1)).as("n"))
        .select(col("token"),
          row_number().over(Window.orderBy(col("n").desc, col("token").asc))
            .cast("long").as("rank"))
      occ.join(ranked, Seq("token"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("rank")).as("rank_sum"))
        .select(col("doc_id"), col("n_tokens"), col("rank_sum"),
          (col("rank_sum").cast("double") / col("n_tokens").cast("double"))
            .as("mean_rank"))
        .orderBy("doc_id")
    }
    val oracle = Some(
      """WITH occ AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents),
        |ranked AS (
        |  SELECT token,
        |         CAST(row_number() OVER (ORDER BY count(*) DESC, token ASC)
        |              AS BIGINT) AS rank
        |  FROM occ GROUP BY token)
        |SELECT doc_id, count(*) AS n_tokens,
        |       CAST(sum(rank) AS BIGINT) AS rank_sum,
        |       CAST(CAST(sum(rank) AS BIGINT) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS mean_rank
        |FROM occ JOIN ranked USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(Postings, MeanTokenRank)
}
