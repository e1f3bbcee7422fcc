package graft.similarity

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-column operators beyond search itself: kNN label prediction
  * (the evaluation loop of every embedding model) and int8 scalar
  * quantization (the storage/serving compression step). Both are pure
  * column expressions with full DuckDB oracles — the quantization math is
  * floor-based (no `round`, whose half-way semantics differ per dialect)
  * and every float enters the arithmetic through an exact float→double
  * widening.
  */
object VectorOps {

  /** kNN majority-vote label prediction over the exact cosine top-k
    * ([[Similarity.bruteForceTopK]]): for each query vector, the predicted
    * label is the most frequent label among its k nearest neighbors
    * (ties → smaller label). The vote is a (query, label) hash aggregate
    * over k rows per query — negligible next to the search itself, so the
    * operator inherits the search's scale path (swap in LSH/IVF top-k for
    * the brute-force baseline and the vote is unchanged).
    */
  object KnnLabel extends GraftQuery {
    val name = "q_knn_label"
    private val K = 10
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val emb = Graft.table(spark, sfDir, "embeddings")
      val queries = emb.filter(col("vec_id") < 15)
      val nbrs = Similarity.bruteForceTopK(queries, emb, K)
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label").as("nbr_label")),
          Seq("neighbor_id"))
      val votes = nbrs.groupBy("query_id", "nbr_label")
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("votes").desc, col("nbr_label").asc)
      votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(emb.select(col("vec_id").as("query_id"), col("label").as("true_label")),
          Seq("query_id"))
        .select(col("query_id"), col("true_label"),
          col("nbr_label").as("pred_label"), col("votes"),
          when(col("nbr_label") === col("true_label"), 1).otherwise(0)
            .cast("int").as("correct"))
        .orderBy("query_id")
    }
    val oracle = Some(
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS true_label
         |           FROM embeddings WHERE vec_id < 15),
         |pairs AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS nbr_label,
         |         q.qe, e.embedding AS ce
         |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
         |comp AS (
         |  SELECT query_id, neighbor_id, nbr_label,
         |         sum(qa * qb) AS dot, sum(qa * qa) AS na, sum(qb * qb) AS nb
         |  FROM (SELECT query_id, neighbor_id, nbr_label,
         |               CAST(round(CAST(a AS DOUBLE) * 1000000.0) AS BIGINT) AS qa,
         |               CAST(round(CAST(b AS DOUBLE) * 1000000.0) AS BIGINT) AS qb
         |        FROM (SELECT query_id, neighbor_id, nbr_label,
         |                     unnest(qe) AS a, unnest(ce) AS b
         |              FROM pairs))
         |  GROUP BY 1, 2, 3),
         |topk AS (
         |  SELECT query_id, nbr_label
         |  FROM (SELECT query_id, nbr_label,
         |               row_number() OVER (PARTITION BY query_id ORDER BY
         |                 CAST(dot AS DOUBLE)
         |                 / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |                 neighbor_id ASC) AS rank
         |        FROM comp)
         |  WHERE rank <= $K),
         |votes AS (
         |  SELECT query_id, nbr_label, count(*) AS votes
         |  FROM topk GROUP BY 1, 2),
         |best AS (
         |  SELECT query_id, nbr_label, votes
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY votes DESC, nbr_label ASC) AS rn
         |        FROM votes)
         |  WHERE rn = 1)
         |SELECT b.query_id, q.true_label, b.nbr_label AS pred_label, b.votes,
         |       CAST(CASE WHEN b.nbr_label = q.true_label THEN 1 ELSE 0 END AS INT) AS correct
         |FROM best b JOIN q ON b.query_id = q.query_id
         |ORDER BY b.query_id""".stripMargin)
  }

  /** Int8 scalar quantization of the embedding column: per-dimension global
    * [min, max] → 256 uniform cells, code = floor((x-min) * 255 / (max-min))
    * (so only the exact maximum lands in cell 255), midpoint dequantization,
    * per-label reconstruction-error report. The per-dim stats are one tiny
    * aggregate (dims × 2 doubles) broadcast back onto the scan — at 100 TB
    * the stats pass and the encode pass are both embarrassingly parallel,
    * and the codes pack 4× smaller than float32 before columnar encoding
    * even sees them.
    *
    * The integer `q_checksum` pins the exact code assignment (a BIGINT sum
    * is order-independent and exact); `max_abs_err` pins the dequantization
    * arithmetic (max of identically-computed doubles).
    */
  object EmbedQuantize extends GraftQuery {
    val name = "q_embed_quantize"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val dims = Graft.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("d", "xf")))
        .select(col("vec_id"), col("label"), col("d"),
          col("xf").cast("double").as("x"))
      val stats = dims.groupBy("d")
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      val coded = dims.join(broadcast(stats), Seq("d"))
        .select(col("label"),
          when(col("mx") > col("mn"),
            floor((col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))))
            .otherwise(lit(0L)).as("q"),
          col("x"), col("mn"), col("mx"))
        .select(col("label"), col("q"),
          abs(col("x") - (col("mn") +
            (col("q").cast("double") + lit(0.5)) *
              ((col("mx") - col("mn")) / lit(255.0)))).as("err"))
      coded.groupBy("label")
        .agg(count(lit(1)).as("n_values"),
          sum(col("q")).as("q_checksum"),
          max(col("err")).as("max_abs_err"))
        .orderBy("label")
    }
    val oracle = Some(
      """WITH dims AS (
        |  SELECT vec_id, label, d - 1 AS d, CAST(x AS DOUBLE) AS x
        |  FROM (SELECT vec_id, label,
        |               unnest(embedding) AS x,
        |               generate_subscripts(embedding, 1) AS d
        |        FROM embeddings)),
        |stats AS (SELECT d, min(x) AS mn, max(x) AS mx FROM dims GROUP BY 1),
        |coded AS (
        |  SELECT label,
        |         CASE WHEN mx > mn
        |              THEN CAST(floor((x - mn) * 255.0 / (mx - mn)) AS BIGINT)
        |              ELSE 0 END AS q,
        |         x, mn, mx
        |  FROM dims JOIN stats USING (d)),
        |errs AS (
        |  SELECT label, q,
        |         abs(x - (mn + (CAST(q AS DOUBLE) + 0.5) * ((mx - mn) / 255.0))) AS err
        |  FROM coded)
        |SELECT label, count(*) AS n_values,
        |       CAST(sum(q) AS BIGINT) AS q_checksum,
        |       max(err) AS max_abs_err
        |FROM errs GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Product quantization (PQ) — the vector-compression standard for
    * billion-scale ANN serving (the "PQ" in IVF-PQ): the 64-dim embedding
    * splits into [[M]] subspaces of 8 dims; each subvector is coded as the
    * id of its nearest centroid in a per-subspace [[K]]-entry codebook, so
    * a vector stores as M bytes instead of 64 floats. Completes the
    * compression family next to scalar int8 ([[EmbedQuantize]]).
    *
    * Codebooks are SAMPLED (the first K vectors' subvectors — the same
    * deterministic-codebook stance as [[Ivf.SampledIvfTopK]]; a k-means
    * refinement would be float-iteration-dependent and un-replayable).
    * Distances are exact BIGINTs over the engine's quantized integer grid
    * ([[graft.plans.VectorExpressions.quantize_vec]]), so every code and
    * the reported per-subspace distortion hash-match the oracle.
    *
    * Scale shape: the codebook is M·K subvectors — broadcast against the
    * candidate scan; assignment is scan-side (explode M rows per vector,
    * broadcast join on subspace, partial top-1 below any exchange via
    * WindowGroupLimit). No shuffle touches raw vectors.
    */
  object PqCodes extends GraftQuery {
    val name = "q_pq_codes"
    private val M = 8 // subspaces
    private val Sub = 8 // dims per subspace
    private val K = 16 // centroids per codebook
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.plans.VectorExpressions.quantize_vec
      val prep = Graft.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), quantize_vec(col("embedding")).as("q"))
      // Scan-side assignment via the native argmin kernel
      // ([[graft.plans.PqExpressions.PqAssign]]) against a 1-row broadcast
      // codebook (array indexed s·K + code, built order-insensitively via
      // array_sort on the unique index — the PqSearch.codebookRow shape).
      // The old plan EXPLODED M rows per vector, broadcast-joined K
      // centroids onto each (N·M·K interpreted-lambda distance rows) and
      // ran a (vec_id, s)-keyed window argmin — one full exchange + sort
      // of the N·M·K stream. Same (dist, code)-ascending winner, strict
      // `<` over ascending code; the only exchange left is the final
      // presentation sort.
      val cb = prep.filter(col("vec_id") < K)
        .select(col("vec_id").cast("int").as("code"),
          explode(sequence(lit(0), lit(M - 1))).as("s"), col("q"))
        .select(struct((col("s") * K + col("code")).as("k"),
          slice(col("q"), col("s") * Sub + 1, lit(Sub)).as("v")).as("e"))
        .agg(array_sort(collect_list(col("e"))).as("es"))
        .select(transform(col("es"), e => e.getField("v")).as("cb"))
      prep.crossJoin(broadcast(cb))
        .select(col("vec_id"), posexplode(
          graft.plans.PqExpressions.pq_assign(col("q"), col("cb"), M, Sub, K)))
        .select(col("vec_id"), col("pos").as("subspace"),
          col("col.code").as("code"), col("col.dist").as("distortion"))
        .orderBy("vec_id", "subspace")
    }
    val oracle = Some(
      s"""WITH q AS (
         |  SELECT vec_id, (i - 1) // $Sub AS s, (i - 1) % $Sub AS p,
         |         CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS q
         |  FROM (SELECT vec_id, unnest(embedding) AS v,
         |               generate_subscripts(embedding, 1) AS i FROM embeddings)),
         |cent AS (
         |  SELECT s, p, CAST(vec_id AS INT) AS code, q AS cq
         |  FROM q WHERE vec_id < $K),
         |dists AS (
         |  SELECT q.vec_id, q.s, c.code,
         |         sum((q.q - c.cq) * (q.q - c.cq)) AS dist
         |  FROM q JOIN cent c ON q.s = c.s AND q.p = c.p
         |  GROUP BY 1, 2, 3)
         |SELECT vec_id, s AS subspace, code,
         |       CAST(dist AS BIGINT) AS distortion
         |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s
         |                                   ORDER BY dist, code) AS rn
         |      FROM dists)
         |WHERE rn = 1
         |ORDER BY vec_id, subspace""".stripMargin)
  }

  /** Dimension-truncation recall — the Matryoshka-style ablation every
    * embedding deployment runs before shipping shorter vectors: recall@10
    * of exact cosine over the FIRST 16 of 64 dims against exact cosine
    * over all dims. Complements the index evaluations (`q_ann_recall` /
    * `q_ivf_recall` / `q_simhash_recall`): those measure what the INDEX
    * loses, this measures what the REPRESENTATION loses — the two
    * independent knobs of a vector-search cost budget. Both sides reuse
    * [[Similarity.bruteForceTopK]] (truncation is a `slice` on the float
    * array before quantization), so the comparison is exact-vs-exact with
    * identical tie-breaking.
    */
  object TruncRecall extends GraftQuery {
    val name = "q_trunc_recall"
    private val K = 10
    private val Dims = 16
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val emb = Graft.table(spark, sfDir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      def trunc(df: DataFrame) = df.select(col("vec_id"),
        slice(col("embedding"), 1, Dims).as("embedding"))
      val exact = Similarity.bruteForceTopK(queries, emb, K)
        .select(col("query_id"), col("neighbor_id"))
      val truncated = Similarity.bruteForceTopK(trunc(queries), trunc(emb), K)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(truncated, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
        .orderBy("query_id")
    }
    val oracle = Some(
      s"""WITH q AS (
         |  SELECT vec_id, i,
         |         CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS q
         |  FROM (SELECT vec_id, unnest(embedding) AS v,
         |               generate_subscripts(embedding, 1) AS i FROM embeddings)),
         |norms AS (SELECT vec_id, sqrt(CAST(sum(q*q) AS DOUBLE)) AS nrm
         |          FROM q GROUP BY 1),
         |tnorms AS (SELECT vec_id, sqrt(CAST(sum(q*q) AS DOUBLE)) AS nrm
         |           FROM q WHERE i <= $Dims GROUP BY 1),
         |exact_comp AS (
         |  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
         |         sum(qa.q * qb.q) AS dot
         |  FROM q qa JOIN q qb ON qb.i = qa.i AND qb.vec_id <> qa.vec_id
         |  WHERE qa.vec_id < 50
         |  GROUP BY 1, 2),
         |exactk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) DESC,
         |                      neighbor_id ASC) AS rank
         |    FROM exact_comp JOIN norms na ON query_id = na.vec_id
         |                    JOIN norms nb ON neighbor_id = nb.vec_id)
         |  WHERE rank <= $K),
         |trunc_comp AS (
         |  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
         |         sum(qa.q * qb.q) AS dot
         |  FROM q qa JOIN q qb ON qb.i = qa.i AND qb.vec_id <> qa.vec_id
         |  WHERE qa.vec_id < 50 AND qa.i <= $Dims AND qb.i <= $Dims
         |  GROUP BY 1, 2),
         |trunck AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) DESC,
         |                      neighbor_id ASC) AS rank
         |    FROM trunc_comp JOIN tnorms na ON query_id = na.vec_id
         |                    JOIN tnorms nb ON neighbor_id = nb.vec_id)
         |  WHERE rank <= $K)
         |SELECT e.query_id, count(*) AS n_exact,
         |       count(t.neighbor_id) AS n_hit,
         |       CAST(count(t.neighbor_id) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) AS recall
         |FROM exactk e LEFT JOIN trunck t
         |  ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Per-label cluster inertia — the k-means objective as an evaluation
    * metric: mean squared distance of each label's vectors to their own
    * centroid, WITHOUT ever materializing the centroid or a per-row
    * distance. The identity Σ‖x−μ‖² = Σ‖x‖² − (Σ_d (Σx_d)²)/n turns the
    * whole metric into per-(label,dim) integer sums: one posexplode
    * aggregate (the [[Similarity.LabelCentroid]] shuffle shape — (label,
    * dim, long) triples), one label-level rollup in DECIMAL(38,0) (the
    * squares pass 2^63), one fixed double tree. No float accumulates
    * anywhere, so the tightness/overlap readout is engine-exact.
    */
  object LabelInertia extends GraftQuery {
    val name = "q_label_inertia"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.plans.VectorExpressions.quantize_vec
      val byDim = Graft.table(spark, sfDir, "embeddings")
        .select(col("label"), posexplode(quantize_vec(col("embedding"))))
        .select(col("label"), col("pos").as("dim"), col("col").as("q"))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("cnt"), sum(col("q")).as("sq"),
          sum((col("q") * col("q")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("sqq"))
      // widen BEFORE the square: Σq reaches ~1e15 at 1e9 vectors, so the
      // long×long product would wrap; decimal×long stays exact
      val perLabel = byDim.groupBy("label")
        .agg(max(col("cnt")).as("n_vecs"), sum(col("sqq")).as("a"),
          sum(col("sq").cast(org.apache.spark.sql.types.DecimalType(19, 0))
            * col("sq")).as("b"))
      val nd = col("n_vecs").cast("double")
      perLabel.select(col("label"), col("n_vecs"),
          (((nd * col("a").cast("double") - col("b").cast("double")) /
            (nd * nd)) / lit(1e12)).as("inertia"))
        .orderBy("label")
    }
    val oracle = Some(
      """WITH q AS (
        |  SELECT label, vec_id, generate_subscripts(embedding, 1) AS dim,
        |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        |  FROM embeddings),
        |bydim AS (
        |  SELECT label, dim, count(*) AS cnt,
        |         CAST(sum(q) AS BIGINT) AS sq, sum(q * q) AS sqq
        |  FROM q GROUP BY 1, 2),
        |perlabel AS (
        |  SELECT label, max(cnt) AS n_vecs, sum(sqq) AS a,
        |         sum(CAST(sq AS HUGEINT) * sq) AS b
        |  FROM bydim GROUP BY 1)
        |SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
        |       ((CAST(n_vecs AS DOUBLE) * CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |        / (CAST(n_vecs AS DOUBLE) * CAST(n_vecs AS DOUBLE))) / 1e12
        |         AS inertia
        |FROM perlabel ORDER BY label""".stripMargin)
  }

  /** Cross-modal join — text statistics per embedding cluster: documents
    * and their embeddings are separate tables keyed doc_id = vec_id (the
    * usual layout: vectors in a vector store, text in the corpus store);
    * per label, how many member docs, their exact character mass, mean
    * length and mean token count. The readout that tells you WHAT each
    * embedding cluster is (short boilerplate? long articles?) — the first
    * debugging query after any clustering. One key equi-join (neither
    * side broadcast-assumed at scale), exact BIGINT sums, single
    * divisions.
    */
  object TextEmbedJoin extends GraftQuery {
    val name = "q_text_embed_join"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("n_chars"),
          size(graft.text.TextOps.tokens(col("text"))).cast("long").as("n_toks"))
      val emb = Graft.table(spark, sfDir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("label"))
      docs.join(emb, "doc_id")
        .groupBy("label")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_toks")).as("total_toks"))
        .select(col("label"), col("n_docs"), col("total_chars"),
          (col("total_chars").cast("double") / col("n_docs").cast("double"))
            .as("mean_chars"),
          (col("total_toks").cast("double") / col("n_docs").cast("double"))
            .as("mean_toks"))
        .orderBy("label")
    }
    val oracle = Some(
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |         len(string_split_regex(trim(text), '\s+')) AS n_toks
        |  FROM documents),
        |j AS (
        |  SELECT label, n_chars, n_toks
        |  FROM d JOIN embeddings ON doc_id = vec_id)
        |SELECT label, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_chars,
        |       CAST(sum(n_toks) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_toks
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** kNN confusion matrix — [[KnnLabel]]'s per-query verdicts rolled into
    * the (true, predicted) grid over a wider query population: which
    * labels the embedding space confuses with which, the readout that
    * tells you WHERE the representation is weak (beside `q_lang_confusion`
    * for the text kernel). Same vote chain, labels-squared output, exact
    * counts with per-true-row shares.
    */
  object KnnConfusion extends GraftQuery {
    val name = "q_knn_confusion"
    private val K = 10
    private val NQueries = 100
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val emb = Graft.table(spark, sfDir, "embeddings")
      val queries = emb.filter(col("vec_id") < NQueries)
      val nbrs = Similarity.bruteForceTopK(queries, emb, K)
        .join(emb.select(col("vec_id").as("neighbor_id"),
          col("label").as("nbr_label")), Seq("neighbor_id"))
      val votes = nbrs.groupBy("query_id", "nbr_label")
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("votes").desc, col("nbr_label").asc)
      val preds = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(emb.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), Seq("query_id"))
      val cells = preds.groupBy(col("true_label"),
          col("nbr_label").as("pred_label"))
        .agg(count(lit(1)).as("n"))
      val rowTot = cells.groupBy("true_label").agg(sum(col("n")).as("row_n"))
      cells.join(rowTot, "true_label")
        .select(col("true_label"), col("pred_label"), col("n"),
          (col("n").cast("double") / col("row_n").cast("double")).as("row_share"))
        .orderBy("true_label", "pred_label")
    }
    val oracle = Some(
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS true_label
         |           FROM embeddings WHERE vec_id < $NQueries),
         |pairs AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS nbr_label,
         |         q.qe, e.embedding AS ce
         |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
         |comp AS (
         |  SELECT query_id, neighbor_id, nbr_label,
         |         sum(qa * qb) AS dot, sum(qa * qa) AS na, sum(qb * qb) AS nb
         |  FROM (SELECT query_id, neighbor_id, nbr_label,
         |               CAST(round(CAST(a AS DOUBLE) * 1000000.0) AS BIGINT) AS qa,
         |               CAST(round(CAST(b AS DOUBLE) * 1000000.0) AS BIGINT) AS qb
         |        FROM (SELECT query_id, neighbor_id, nbr_label,
         |                     unnest(qe) AS a, unnest(ce) AS b
         |              FROM pairs))
         |  GROUP BY 1, 2, 3),
         |topk AS (
         |  SELECT query_id, nbr_label
         |  FROM (SELECT query_id, nbr_label,
         |               row_number() OVER (PARTITION BY query_id ORDER BY
         |                 CAST(dot AS DOUBLE)
         |                 / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |                 neighbor_id ASC) AS rank
         |        FROM comp)
         |  WHERE rank <= $K),
         |votes AS (
         |  SELECT query_id, nbr_label, count(*) AS votes
         |  FROM topk GROUP BY 1, 2),
         |best AS (
         |  SELECT query_id, nbr_label
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY votes DESC, nbr_label ASC) AS rn
         |        FROM votes)
         |  WHERE rn = 1),
         |cells AS (
         |  SELECT q.true_label, b.nbr_label AS pred_label, count(*) AS n
         |  FROM best b JOIN q ON b.query_id = q.query_id
         |  GROUP BY 1, 2),
         |rowtot AS (
         |  SELECT true_label, CAST(sum(n) AS BIGINT) AS row_n
         |  FROM cells GROUP BY 1)
         |SELECT true_label, pred_label, n,
         |       CAST(n AS DOUBLE) / CAST(row_n AS DOUBLE) AS row_share
         |FROM cells JOIN rowtot USING (true_label)
         |ORDER BY true_label, pred_label""".stripMargin)
  }

  /** Embedding outliers — vectors far from their OWN label's centroid
    * (mislabeled or genuinely anomalous members, the per-vector drill-down
    * of [[LabelInertia]]'s aggregate). Everything stays exact and
    * centroid-free: the n²-scaled squared distance of vector x to its
    * label centroid is Σ_d (n·q_d − S_d)², and 3σ against the label's
    * mean squared distance is d²·n² > 9·(n·A − B) — a pure
    * integer/decimal comparison with NO division, NO sqrt, NO float
    * anywhere in the flag. Per-label (dim, sum) stats broadcast back onto
    * one posexplode pass; deviations widen to decimal before squaring.
    */
  object EmbedOutliers extends GraftQuery {
    val name = "q_embed_outliers"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.plans.VectorExpressions.quantize_vec
      import org.apache.spark.sql.types.DecimalType
      val q = Graft.table(spark, sfDir, "embeddings")
        .select(col("label"), col("vec_id"),
          posexplode(quantize_vec(col("embedding"))))
        .select(col("label"), col("vec_id"), col("pos").as("dim"),
          col("col").as("q"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dimStats = q.groupBy("label", "dim")
        .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
          sum((col("q") * col("q")).cast(DecimalType(38, 0))).as("sqq"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // D2(x) = Σ_d (n·q − S_d)² = n²·d²(x); mean_x d² = (n·A − B)/n²,
      // so the 3σ-of-mean flag d² > 9·mean is EXACTLY D2 > 9·(n·A − B)
      val labelStats = dimStats.groupBy("label")
        .agg(max(col("n")).as("n"), sum(col("sqq")).as("a"),
          sum(col("s").cast(DecimalType(19, 0)) * col("s")).as("b"))
        .select(col("label"), col("n"),
          (lit(9).cast(DecimalType(38, 0)) *
            (col("n").cast(DecimalType(19, 0)) * col("a") - col("b")))
            .as("thr"))
      val perVec = q.join(dimStats.select("label", "dim", "n", "s"),
          Seq("label", "dim"))
        .select(col("label"), col("vec_id"),
          ((col("n") * col("q") - col("s")).cast(DecimalType(19, 0)) *
            (col("n") * col("q") - col("s"))).as("dev2"))
        .groupBy("label", "vec_id")
        .agg(sum(col("dev2")).as("d2n2"))
      perVec.join(broadcast(labelStats), "label")
        .groupBy("label")
        .agg(max(col("n")).as("n_vecs"),
          sum(when(col("d2n2") > col("thr"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("label")
    }
    val oracle = Some(
      """WITH q AS (
        |  SELECT label, vec_id, generate_subscripts(embedding, 1) AS dim,
        |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        |  FROM embeddings),
        |dimstats AS (
        |  SELECT label, dim, count(*) AS n,
        |         CAST(sum(q) AS BIGINT) AS s, sum(q * q) AS sqq
        |  FROM q GROUP BY 1, 2),
        |labelstats AS (
        |  SELECT label, max(n) AS n,
        |         9 * (max(n) * sum(sqq) - sum(CAST(s AS HUGEINT) * s)) AS thr
        |  FROM dimstats GROUP BY 1),
        |pervec AS (
        |  SELECT q.label, vec_id,
        |         sum(CAST(n * q.q - s AS HUGEINT) * (n * q.q - s)) AS d2n2
        |  FROM q JOIN dimstats ON q.label = dimstats.label AND q.dim = dimstats.dim
        |  GROUP BY 1, 2)
        |SELECT p.label, CAST(max(l.n) AS BIGINT) AS n_vecs,
        |       CAST(sum(CASE WHEN d2n2 > thr THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers
        |FROM pervec p JOIN labelstats l ON p.label = l.label
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(KnnLabel, EmbedQuantize, PqCodes, TruncRecall,
    LabelInertia, TextEmbedJoin, KnnConfusion, EmbedOutliers)
}
