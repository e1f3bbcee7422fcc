package graft.similarity

import graft.{Graft, GraftQuery}
import graft.plans.VectorExpressions.{dot_long, quantize_vec}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random-projection (Johnson–Lindenstrauss) dimensionality reduction for
  * the embedding column — the third representation-compression path next
  * to int8 quantization (`q_embed_quantize`) and product quantization
  * (`q_pq_codes`), and the data-independent cousin of the Matryoshka
  * truncation ablation (`q_trunc_recall`): truncation keeps trained
  * prefix dims, a JL projection works on ANY embedding with no training
  * pass, at the cost of mixing all dims into each output coordinate.
  *
  * The projection matrix is the Achlioptas sparse-sign construction
  * (Achlioptas 2003, "Database-friendly random projections"): entries
  * s_ij ∈ {+1, 0, −1} with probabilities {1/6, 2/3, 1/6} — the √3 scale
  * factor of the original construction cancels in cosine, so it is
  * dropped. Signs derive from md5("rp:i:j") mod 6 (0→+1, 1→−1, else 0),
  * the same [[graft.functions.PortableHash]] trick the LSH planes use, so
  * the ENTIRE approximate result replays in the DuckDB oracle. All
  * arithmetic is exact BIGINT on the quantized grid: projected coord
  * |p_j| ≤ 64·5.3e5 ≈ 3.4e7, projected dot ≤ 16·(3.4e7)² ≈ 1.8e16 ≪ 2⁶³.
  *
  * Scale shape: projection is 16 literal-matrix [[dot_long]]s evaluated
  * scan-side in whole-stage codegen — no shuffle, no training state, and
  * downstream search moves 16-long arrays instead of 64-float ones (4×
  * less shuffle weight before any indexing).
  */
object RandProj {

  val SrcDim = 64
  val ProjDim = 16

  /** Deterministic Achlioptas sign for matrix cell (i, j) — md5-derived so
    * the oracle recomputes it in ANSI SQL:
    * `('0x' || substr(md5('rp:' || i || ':' || j), 1, 15))::BIGINT % 6`.
    */
  def sign(i: Int, j: Int): Long = {
    val hex = graft.functions.PortableHash.md5Hex(s"rp:$i:$j")
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 6 match {
      case 0 => 1L
      case 1 => -1L
      case _ => 0L
    }
  }

  /** Row j of the projection matrix (length [[SrcDim]]). */
  def signRow(j: Int): Array[Long] = Array.tabulate(SrcDim)(i => sign(i, j))

  /** array<long> (quantized embedding) → array<long> of [[ProjDim]]
    * projected coords: 16 literal sign-vector dots, fully scan-side.
    */
  def project(q: Column): Column =
    array((0 until ProjDim).map(j => dot_long(q, lit(signRow(j)))): _*)

  /** Brute-force cosine top-k in the PROJECTED space — same contract as
    * [[Similarity.bruteForceTopK]] (ties by neighbor_id, exact integer
    * dots), but over 16-long arrays built scan-side by [[project]].
    */
  def projTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    def prep(df: DataFrame, idAs: String, pAs: String, nAs: String) =
      df.select(col("vec_id").as(idAs),
          project(quantize_vec(col("embedding"))).as(pAs))
        .select(col(idAs), col(pAs),
          sqrt(dot_long(col(pAs), col(pAs)).cast("double")).as(nAs))
    val q = prep(queries, "query_id", "pq", "qn")
    val c = prep(candidates, "neighbor_id", "pc", "cn")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot_long(col("pq"), col("pc")).cast("double") / (col("qn") * col("cn")))
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Shared oracle CTEs: quantized components, Achlioptas signs, projected
    * coords + norms. Spark's 0-based md5 key is `i - 1` of DuckDB's
    * 1-based `generate_subscripts`.
    */
  private def oraclePrelude: String =
    s"""WITH q AS (
       |  SELECT vec_id, i,
       |         CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS q
       |  FROM (SELECT vec_id, unnest(embedding) AS v,
       |               generate_subscripts(embedding, 1) AS i FROM embeddings)),
       |signs AS (
       |  SELECT i.i, j.j,
       |         CASE ('0x' || substr(md5('rp:' || (i.i - 1)::VARCHAR || ':' ||
       |                  j.j::VARCHAR), 1, 15))::BIGINT % 6
       |           WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS s
       |  FROM (SELECT unnest(generate_series(1, $SrcDim)) AS i) i,
       |       (SELECT unnest(generate_series(0, ${ProjDim - 1})) AS j) j),
       |proj AS (
       |  SELECT q.vec_id, s.j, sum(q.q * s.s) AS p
       |  FROM q JOIN signs s ON q.i = s.i
       |  GROUP BY 1, 2),
       |pnorms AS (SELECT vec_id, sqrt(CAST(sum(p * p) AS DOUBLE)) AS nrm
       |           FROM proj GROUP BY 1)""".stripMargin

  /** JL-projected cosine top-3 for the fixed small query set — the
    * projected-space twin of `q_cosine_topk`, fully oracle-replayable.
    */
  object RandProjTopK extends GraftQuery {
    val name = "q_randproj_topk"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val emb = Graft.table(spark, sfDir, "embeddings")
      projTopK(emb.filter(col("vec_id") < 5), emb, 3)
    }
    val oracle = Some(
      s"""$oraclePrelude,
         |comp AS (
         |  SELECT pa.vec_id AS query_id, pb.vec_id AS neighbor_id,
         |         sum(pa.p * pb.p) AS dot
         |  FROM proj pa JOIN proj pb
         |    ON pb.j = pa.j AND pb.vec_id <> pa.vec_id
         |  WHERE pa.vec_id < 5
         |  GROUP BY 1, 2)
         |SELECT query_id,
         |       CAST(row_number() OVER (PARTITION BY query_id
         |         ORDER BY CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) DESC,
         |                  neighbor_id ASC) AS INT) AS rank,
         |       neighbor_id,
         |       CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) AS cosine
         |FROM comp JOIN pnorms na ON query_id = na.vec_id
         |          JOIN pnorms nb ON neighbor_id = nb.vec_id
         |QUALIFY rank <= 3
         |ORDER BY query_id, rank""".stripMargin)
  }

  /** Recall@10 of projected-space cosine against full-space exact cosine —
    * the representation-loss measurement for the JL path, keeping the
    * every-approximate-family-ships-its-recall invariant. Both sides use
    * identical tie-breaking, so the readout is engine-exact.
    */
  object RandProjRecall extends GraftQuery {
    val name = "q_randproj_recall"
    private val K = 10
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val emb = Graft.table(spark, sfDir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val exact = Similarity.bruteForceTopK(queries, emb, K)
        .select(col("query_id"), col("neighbor_id"))
      val projected = projTopK(queries, emb, K)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(projected, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
        .orderBy("query_id")
    }
    val oracle = Some(
      s"""$oraclePrelude,
         |norms AS (SELECT vec_id, sqrt(CAST(sum(q * q) AS DOUBLE)) AS nrm
         |          FROM q GROUP BY 1),
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
         |proj_comp AS (
         |  SELECT pa.vec_id AS query_id, pb.vec_id AS neighbor_id,
         |         sum(pa.p * pb.p) AS dot
         |  FROM proj pa JOIN proj pb
         |    ON pb.j = pa.j AND pb.vec_id <> pa.vec_id
         |  WHERE pa.vec_id < 50
         |  GROUP BY 1, 2),
         |projk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) DESC,
         |                      neighbor_id ASC) AS rank
         |    FROM proj_comp JOIN pnorms na ON query_id = na.vec_id
         |                   JOIN pnorms nb ON neighbor_id = nb.vec_id)
         |  WHERE rank <= $K)
         |SELECT e.query_id, count(*) AS n_exact,
         |       count(p.neighbor_id) AS n_hit,
         |       CAST(count(p.neighbor_id) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) AS recall
         |FROM exactk e LEFT JOIN projk p
         |  ON e.query_id = p.query_id AND e.neighbor_id = p.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(RandProjTopK, RandProjRecall)
}
