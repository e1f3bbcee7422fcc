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

  /** BM25 retrieval over the inverted-index family: top-10 documents for a
    * fixed 3-term query, scored with Okapi BM25 (k1 = 1.2, b = 0.75) under
    * the LOG-FREE rational idf `(N − df + 0.5)/(df + 0.5)` — the same
    * monotone-idf stance as `q_tfidf`, which is what lets every score
    * hash-match DuckDB bit-for-bit (the floating-point score is a FIXED
    * expression tree of exact integers — identical literals, identical
    * association on both engines — never a float reduction over rows: the
    * per-term contributions are summed as `(c1 + c2) + c3`, not
    * `sum()` over an unordered term set).
    *
    * Scale shape: the term filter sits on the token explode (only query
    * terms survive the scan side), tf is a doc-keyed conditional
    * aggregate, and the corpus stats (N, avgdl, per-term df) are ONE
    * 1-row aggregate broadcast onto the matches; top-10 is a
    * TakeOrdered. Nothing token-keyed ever shuffles except the three
    * query terms' postings.
    */
  object Bm25 extends GraftQuery {
    val name = "q_bm25"
    private val T1 = "spark"; private val T2 = "vector"; private val T3 = "dup"
    private val K = 10
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docsDl = Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("dl"))
      val occ = Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .filter(col("tok").isin(T1, T2, T3))
      val tf = occ.groupBy("doc_id").agg(
        count(when(col("tok") === T1, 1)).as("tf1"),
        count(when(col("tok") === T2, 1)).as("tf2"),
        count(when(col("tok") === T3, 1)).as("tf3"))
      val stats = docsDl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
      val dfs = occ.agg(
        countDistinct(when(col("tok") === T1, col("doc_id"))).as("df1"),
        countDistinct(when(col("tok") === T2, col("doc_id"))).as("df2"),
        countDistinct(when(col("tok") === T3, col("doc_id"))).as("df3"))
      def idf(dfc: org.apache.spark.sql.Column) =
        ((col("n_docs") - dfc).cast("double") + lit(0.5)) /
          (dfc.cast("double") + lit(0.5))
      def contrib(tfc: org.apache.spark.sql.Column, idfc: org.apache.spark.sql.Column) =
        idfc * ((tfc.cast("double") * lit(2.2)) /
          (tfc.cast("double") + lit(1.2) * col("norm")))
      tf.join(docsDl, "doc_id")
        .crossJoin(broadcast(stats))
        .crossJoin(broadcast(dfs))
        .withColumn("avgdl",
          col("total_dl").cast("double") / col("n_docs").cast("double"))
        .withColumn("norm",
          lit(0.25) + (lit(0.75) * col("dl").cast("double")) / col("avgdl"))
        .select(col("doc_id"),
          (contrib(col("tf1"), idf(col("df1"))) +
            contrib(col("tf2"), idf(col("df2"))) +
            contrib(col("tf3"), idf(col("df3")))).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(K)
    }
    val oracle = Some(
      s"""WITH dls AS (
         |  SELECT doc_id,
         |         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS dl
         |  FROM documents),
         |occ AS (
         |  SELECT doc_id, tok FROM (
         |    SELECT doc_id,
         |           unnest(string_split_regex(trim(text), '\\s+')) AS tok
         |    FROM documents)
         |  WHERE tok IN ('$T1', '$T2', '$T3')),
         |tf AS (
         |  SELECT doc_id,
         |         count(CASE WHEN tok = '$T1' THEN 1 END) AS tf1,
         |         count(CASE WHEN tok = '$T2' THEN 1 END) AS tf2,
         |         count(CASE WHEN tok = '$T3' THEN 1 END) AS tf3
         |  FROM occ GROUP BY 1),
         |stats AS (
         |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl
         |  FROM dls),
         |dfs AS (
         |  SELECT count(DISTINCT CASE WHEN tok = '$T1' THEN doc_id END) AS df1,
         |         count(DISTINCT CASE WHEN tok = '$T2' THEN doc_id END) AS df2,
         |         count(DISTINCT CASE WHEN tok = '$T3' THEN doc_id END) AS df3
         |  FROM occ),
         |scored AS (
         |  SELECT doc_id,
         |         (CAST(n_docs - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)
         |           * ((CAST(tf1 AS DOUBLE) * 2.2)
         |              / (CAST(tf1 AS DOUBLE) + 1.2 * norm))
         |         + (CAST(n_docs - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)
         |           * ((CAST(tf2 AS DOUBLE) * 2.2)
         |              / (CAST(tf2 AS DOUBLE) + 1.2 * norm))
         |         + (CAST(n_docs - df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5)
         |           * ((CAST(tf3 AS DOUBLE) * 2.2)
         |              / (CAST(tf3 AS DOUBLE) + 1.2 * norm)) AS score
         |  FROM (
         |    SELECT tf.doc_id, tf1, tf2, tf3, df1, df2, df3, n_docs,
         |           0.25 + (0.75 * CAST(dl AS DOUBLE))
         |             / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS norm
         |    FROM tf JOIN dls ON tf.doc_id = dls.doc_id
         |    CROSS JOIN stats CROSS JOIN dfs))
         |SELECT doc_id, score FROM scored
         |ORDER BY score DESC, doc_id ASC
         |LIMIT $K""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(Postings, MeanTokenRank, Bm25)
}
