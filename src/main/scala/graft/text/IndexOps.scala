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
      val ranked = graft.operators.Dist
        .globalRowNumber(occ.groupBy("token").agg(count(lit(1)).as("n")),
          "rank", col("n").desc, col("token").asc)
        .select(col("token"), col("rank"))
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

  /** Query terms shared by the retrieval queries ([[Bm25]], [[RrfFusion]]). */
  private val T1 = "spark"; private val T2 = "vector"; private val T3 = "dup"

  /** Shared query-term scoring frame: every document matching ≥ 1 query
    * term, with its per-term tfs, per-term dfs, corpus stats and the BM25
    * length norm — the input both retrieval scorers read.
    *
    * Persisted barriers: docsDl (narrow per-doc lengths) feeds the corpus
    * stats AND the score join; occ (only the query terms' postings survive
    * the filter — tiny) feeds tf AND df. Without the barriers each
    * consumer re-scans and re-tokenizes the corpus.
    */
  private def queryTermFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val docsDl = Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val occ = Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(T1, T2, T3))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = occ.groupBy("doc_id").agg(
      count(when(col("tok") === T1, 1)).as("tf1"),
      count(when(col("tok") === T2, 1)).as("tf2"),
      count(when(col("tok") === T3, 1)).as("tf3"))
    val stats = docsDl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val dfs = occ.agg(
      countDistinct(when(col("tok") === T1, col("doc_id"))).as("df1"),
      countDistinct(when(col("tok") === T2, col("doc_id"))).as("df2"),
      countDistinct(when(col("tok") === T3, col("doc_id"))).as("df3"))
    tf.join(docsDl, "doc_id")
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfs))
      .withColumn("avgdl",
        col("total_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("norm",
        lit(0.25) + (lit(0.75) * col("dl").cast("double")) / col("avgdl"))
  }

  /** The Okapi BM25 score over [[queryTermFrame]] — the fixed expression
    * tree both [[Bm25]] and [[RrfFusion]] rank by.
    */
  private def bm25Score: org.apache.spark.sql.Column = {
    def idf(dfc: org.apache.spark.sql.Column) =
      ((col("n_docs") - dfc).cast("double") + lit(0.5)) /
        (dfc.cast("double") + lit(0.5))
    def contrib(tfc: org.apache.spark.sql.Column, idfc: org.apache.spark.sql.Column) =
      idfc * ((tfc.cast("double") * lit(2.2)) /
        (tfc.cast("double") + lit(1.2) * col("norm")))
    contrib(col("tf1"), idf(col("df1"))) +
      contrib(col("tf2"), idf(col("df2"))) +
      contrib(col("tf3"), idf(col("df3")))
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
    private val K = 10
    def run(spark: SparkSession, sfDir: String): DataFrame =
      queryTermFrame(spark, sfDir)
        .select(col("doc_id"), bm25Score.as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(K)
    val oracle = Some(
      s"""WITH $queryTermOracleCtes
         |SELECT doc_id, score FROM bm
         |ORDER BY score DESC, doc_id ASC
         |LIMIT $K""".stripMargin)
  }

  /** Oracle-side twin of [[queryTermFrame]] + [[bm25Score]]: CTEs ending
    * with `qf` (the joined scoring frame) and `bm` (doc_id, BM25 score) —
    * spliced by both retrieval oracles so the scoring math has one source
    * of truth per engine.
    */
  private def queryTermOracleCtes: String =
    s"""dls AS (
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
       |qf AS (
       |  SELECT tf.doc_id, tf1, tf2, tf3, df1, df2, df3, n_docs,
       |         0.25 + (0.75 * CAST(dl AS DOUBLE))
       |           / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS norm
       |  FROM tf JOIN dls ON tf.doc_id = dls.doc_id
       |  CROSS JOIN stats CROSS JOIN dfs),
       |bm AS (
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
       |  FROM qf)""".stripMargin

  /** Reciprocal-rank fusion — the hybrid-retrieval combiner: the BM25
    * ranking and a query-likelihood tf-idf ranking (per-term
    * tf·(N/df) under the same log-free rational idf stance as `q_tfidf`)
    * are fused as RRF(d) = 1/(60+rank_bm25) + 1/(60+rank_tfidf), the
    * standard k = 60 form. Both rankings are total orders over the SAME
    * candidate set (every doc matching ≥ 1 query term, ties broken by
    * doc_id), so each doc has both ranks and the fused score is a fixed
    * two-term double tree — bit-exact cross-engine, since ranks are
    * integers.
    *
    * Scale shape: one [[queryTermFrame]] (postings-bounded — only the
    * query terms' matches survive the scan), then two global rank
    * windows over that bounded candidate set. The global window is the
    * right plan at candidate scale (a query hits a vanishing fraction of
    * a 100 TB corpus); a caller fusing corpus-sized rankings swaps in the
    * two-stage rank (per-partition rank + offset by partition counts).
    */
  object RrfFusion extends GraftQuery {
    val name = "q_rrf_fusion"
    private val K = 10
    private val RrfK = 60.0
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val tfidf3 =
        col("tf1").cast("double") *
          (col("n_docs").cast("double") / col("df1").cast("double")) +
          col("tf2").cast("double") *
            (col("n_docs").cast("double") / col("df2").cast("double")) +
          col("tf3").cast("double") *
            (col("n_docs").cast("double") / col("df3").cast("double"))
      val scored = queryTermFrame(spark, sfDir)
        .select(col("doc_id"), bm25Score.as("bm25"), tfidf3.as("tfidf3"))
      // candidate set = docs matching the query terms (top-k-bounded by
      // retrieval contract); lit(0) marks the audited single-partition frame
      val byBm = Window.partitionBy(graft.operators.Dist.boundedOne(col("doc_id")))
        .orderBy(col("bm25").desc, col("doc_id").asc)
      val byTf = Window.partitionBy(graft.operators.Dist.boundedOne(col("doc_id")))
        .orderBy(col("tfidf3").desc, col("doc_id").asc)
      scored
        .withColumn("rank_bm25", row_number().over(byBm).cast("long"))
        .withColumn("rank_tfidf", row_number().over(byTf).cast("long"))
        .select(col("doc_id"), col("rank_bm25"), col("rank_tfidf"),
          (lit(1.0) / (lit(RrfK) + col("rank_bm25").cast("double")) +
            lit(1.0) / (lit(RrfK) + col("rank_tfidf").cast("double"))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
        .limit(K)
    }
    val oracle = Some(
      s"""WITH $queryTermOracleCtes,
         |tfidf AS (
         |  SELECT doc_id,
         |         CAST(tf1 AS DOUBLE)
         |           * (CAST(n_docs AS DOUBLE) / CAST(df1 AS DOUBLE))
         |         + CAST(tf2 AS DOUBLE)
         |           * (CAST(n_docs AS DOUBLE) / CAST(df2 AS DOUBLE))
         |         + CAST(tf3 AS DOUBLE)
         |           * (CAST(n_docs AS DOUBLE) / CAST(df3 AS DOUBLE)) AS tscore
         |  FROM qf),
         |rb AS (
         |  SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
         |              AS BIGINT) AS rank_bm25
         |  FROM bm),
         |rt AS (
         |  SELECT doc_id,
         |         CAST(row_number() OVER (ORDER BY tscore DESC, doc_id ASC)
         |              AS BIGINT) AS rank_tfidf
         |  FROM tfidf)
         |SELECT doc_id, rank_bm25, rank_tfidf,
         |       1.0 / ($RrfK + CAST(rank_bm25 AS DOUBLE))
         |         + 1.0 / ($RrfK + CAST(rank_tfidf AS DOUBLE)) AS rrf
         |FROM rb JOIN rt USING (doc_id)
         |ORDER BY rrf DESC, doc_id ASC
         |LIMIT $K""".stripMargin)
  }

  /** Exact phrase search over the POSITIONAL index — the retrieval
    * primitive [[Postings]]' document-level index can't answer (bag-of-words
    * loses adjacency). Token occurrences carry their 1-based position
    * (matching DuckDB's `generate_subscripts`); a phrase match is an
    * equi-join of the two term-posting slices on (doc, pos+1). Scale shape:
    * the scan explodes once, both join sides are pre-filtered to the
    * phrase's terms (token-selective — the same reason positional indexes
    * work), and the join key is (doc_id, pos): no windows, no regex over
    * the raw text, no full-corpus self-join.
    */
  object PhraseSearch extends GraftQuery {
    val name = "q_phrase_search"
    private val W1 = "fast"
    private val W2 = "hash"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val occ = Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("token"))
      val t1 = occ.filter(col("token") === W1)
        .select(col("doc_id"), col("pos"))
      val t2 = occ.filter(col("token") === W2)
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      t1.join(t2, Seq("doc_id", "pos"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
        .orderBy("doc_id")
    }
    val oracle = Some(
      s"""WITH toks AS (
         |  SELECT doc_id, t.tok, t.i
         |  FROM (SELECT doc_id,
         |               string_split_regex(trim(text), '\\s+') AS l FROM documents) d,
         |       LATERAL (SELECT unnest(l) AS tok, generate_subscripts(l, 1) AS i) t),
         |m AS (
         |  SELECT t1.doc_id, t1.i AS pos
         |  FROM toks t1 JOIN toks t2
         |    ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
         |  WHERE t1.tok = '$W1' AND t2.tok = '$W2')
         |SELECT doc_id, count(*) AS n_matches, min(pos) AS first_pos
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(Postings, MeanTokenRank, Bm25, RrfFusion,
    PhraseSearch)
}
