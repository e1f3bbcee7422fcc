package graft.similarity

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a seeded
  * random-hyperplane LSH bucketing as the scale path (bucket-equi-join
  * instead of cross join; at 100 TB the cross join is the thing to kill).
  *
  * All math is pure column expressions (`zip_with` + `aggregate`) —
  * codegen'd, no UDFs. Dot products run in exact quantized-integer units so
  * the result is independent of accumulation order and bit-identical to the
  * DuckDB oracle (see the note on [[Similarity.dotExact]]).
  */
object Similarity {

  /** Quantization scale for exact dot products: floats are snapped to 1e-6
    * units and multiplied as BIGINTs. `x * 1e6` and `round()` are single
    * identical IEEE ops in Spark and DuckDB (both round halves away from
    * zero), and the integer sums are exact and order-independent — so the
    * cosine is bit-deterministic across engines. (A DECIMAL accumulator is
    * NOT: DuckDB's double→decimal cast runs through a double multiply that
    * is inexact beyond ~15 fractional digits, which showed up as 1-ulp
    * mismatches in testing.) Quantization error is ~1e-6 relative — noise
    * for ANN ranking, whose own recall tolerance is far looser.
    */
  import graft.plans.VectorExpressions.{dot_long, quantize_vec}

  /** Order-independent quantized dot product of two float-array columns,
    * in units of Q² (Q=1e6). Max |v|≈0.53 ⇒ |q|≤5.3e5, 64-dim sum ≤ 1.8e13
    * ≪ 2^63. Runs as native codegen'd expressions
    * ([[graft.plans.VectorExpressions]]) — the composable
    * `aggregate(zip_with(...))` fold allocates arrays and closures per pair
    * and dominated the ANN bench.
    */
  def dotExact(a: Column, b: Column): Column =
    dot_long(quantize_vec(a), quantize_vec(b))

  /** Deterministic cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    dotExact(a, b).cast("double") /
      (sqrt(dotExact(a, a).cast("double")) * sqrt(dotExact(b, b).cast("double")))

  /** Exact brute-force cosine top-k: every query row against every candidate.
    * Correct at any scale but O(|Q|·|C|) — keep |Q| bounded; the scale path
    * is [[lshTopK]].
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    // quantize + norm once per SIDE, not per pair: the join then multiplies
    // pre-quantized long arrays only (same bits — sqrt(na) is the same
    // number either way)
    val q = queries.select(col("vec_id").as("query_id"),
      quantize_vec(col("embedding")).as("qq"),
      sqrt(dot_long(quantize_vec(col("embedding")), quantize_vec(col("embedding")))
        .cast("double")).as("qn"))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      quantize_vec(col("embedding")).as("cq"),
      sqrt(dot_long(quantize_vec(col("embedding")), quantize_vec(col("embedding")))
        .cast("double")).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot_long(col("qq"), col("cq")).cast("double") / (col("qn") * col("cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Exact cosine top-3 for a fixed small query set — the DuckDB-verifiable
    * baseline of the ANN surface.
    */
  object CosineTopK extends GraftQuery {
    val name = "q_cosine_topk"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val emb = Graft.table(spark, sfDir, "embeddings")
      bruteForceTopK(emb.filter(col("vec_id") < 5), emb, 3)
    }
    val oracle = Some(
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id, q.qe, e.embedding AS ce
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
        |comp AS (
        |  SELECT query_id, neighbor_id,
        |         sum(qa * qb) AS dot, sum(qa * qa) AS na, sum(qb * qb) AS nb
        |  FROM (SELECT query_id, neighbor_id,
        |               CAST(round(CAST(a AS DOUBLE) * 1000000.0) AS BIGINT) AS qa,
        |               CAST(round(CAST(b AS DOUBLE) * 1000000.0) AS BIGINT) AS qb
        |        FROM (SELECT query_id, neighbor_id, unnest(qe) AS a, unnest(ce) AS b
        |              FROM pairs))
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         CAST(dot AS DOUBLE)
        |         / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) AS cosine
        |  FROM comp)
        |SELECT query_id,
        |       CAST(row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank,
        |       neighbor_id, cosine
        |FROM scored
        |QUALIFY rank <= 3
        |ORDER BY query_id, rank""".stripMargin)
  }

  // ---------------------------------------------------------------- LSH ANN

  /** Multi-table sign-LSH layout. Per-table recall for a neighbor at angle θ
    * is ≈(1-θ/π)^planes; T independent tables lift it to 1-(1-p)^T. Defaults
    * (8 tables × 4 planes) give ≈0.7 recall at cosine 0.4 — sized for the
    * weakly-clustered test embeddings. At production scale raise
    * `planesPerTable` toward log2(N / desired bucket size): selectivity
    * grows with planes, recall is recovered by adding tables.
    */
  val NumTables = 8
  val PlanesPerTable = 4

  /** Deterministic ±1 ("Rademacher") hyperplane for (table, plane): sign i
    * comes from the low bit of md5("t_p_i"). Two wins over seeded Gaussian
    * planes: the dot product is an exact BIGINT sum of quantized components
    * (no float association-order issues), and md5 is computable in ANSI SQL,
    * so bucket membership — hence the whole ANN result — replays in the
    * DuckDB oracle. Sign projections are a standard SRP variant; recall is
    * within noise of Gaussian planes at these widths (spec-asserted).
    */
  def signPlane(table: Int, plane: Int, dim: Int): Array[Long] =
    Array.tabulate(dim) { i =>
      val hex = graft.functions.PortableHash.md5Hex(s"${table}_${plane}_$i")
      if ((Character.digit(hex.charAt(0), 16) & 1) == 1) 1L else -1L
    }

  /** Sign-hash bucket id (0 .. 2^planes-1) for one table, over the
    * QUANTIZED embedding (see [[dotExact]] — pass `quantize_vec(e)`).
    */
  def lshBucketQ(q: Column, dim: Int, table: Int = 0,
      nPlanes: Int = PlanesPerTable): Column =
    (0 until nPlanes).map { p =>
      when(dot_long(q, lit(signPlane(table, p, dim))) >= 0, lit(1 << p))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** [[lshBucketQ]] over a raw float embedding column. */
  def lshBucket(e: Column, dim: Int, table: Int = 0, nPlanes: Int = PlanesPerTable): Column =
    lshBucketQ(quantize_vec(e), dim, table, nPlanes)

  /** All tables' bucket keys over the quantized embedding, namespaced as
    * table*2^planes + bucket. Composable reference form — [[lshKeysNative]]
    * is the fused expression the queries run (bit-equivalent,
    * spec-verified).
    */
  def lshKeysQ(q: Column, dim: Int, tables: Int = NumTables,
      nPlanes: Int = PlanesPerTable): Column =
    array((0 until tables).map(t =>
      lshBucketQ(q, dim, t, nPlanes) + lit(t << nPlanes)): _*)

  /** [[lshKeysQ]] as ONE native expression: all tables×planes sign dots in
    * a single loop over a plane matrix reference, instead of 32 fused
    * literal-array dot expressions whose generated code dominated cold
    * compile time.
    */
  def lshKeysNative(q: Column, dim: Int, tables: Int = NumTables,
      nPlanes: Int = PlanesPerTable): Column =
    graft.plans.LshExpression.lsh_keys(q,
      for (t <- 0 until tables; p <- 0 until nPlanes)
        yield signPlane(t, p, dim),
      tables, nPlanes)

  /** Approximate top-k: bucket both sides in T sign-LSH tables, equi-join on
    * the (table, bucket) key, dedup candidate pairs, exact-cosine rerank.
    * The join is a shuffle on small int keys — the plan survives 1000
    * executors where a cross join would not.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, dim: Int, k: Int,
      tables: Int = NumTables, nPlanes: Int = PlanesPerTable): DataFrame = {
    // quantize ONCE behind a projection boundary — the norm and all
    // tables×planes sign dots reference the same staged array
    def prep(df: DataFrame, idAs: String, qAs: String, nAs: String) =
      df.select(col("vec_id").as(idAs), quantize_vec(col("embedding")).as(qAs))
        .select(col(idAs), col(qAs),
          sqrt(dot_long(col(qAs), col(qAs)).cast("double")).as(nAs),
          explode(lshKeysNative(col(qAs), dim, tables, nPlanes)).as("key"))
    val q = prep(queries, "query_id", "qq", "qn")
    val c = prep(candidates, "neighbor_id", "cq", "cn")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    c.join(q, Seq("key"))
      .filter(col("neighbor_id") =!= col("query_id"))
      // score BEFORE dedup: a pair found in d tables costs d cheap dot
      // products, but the dedup shuffle then carries (id, id, double)
      // rows instead of two 64-long arrays per row
      .select(col("query_id"), col("neighbor_id"),
        (dot_long(col("qq"), col("cq")).cast("double") / (col("qn") * col("cn"))).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed ANN as a driver query. The md5-derived sign planes and
    * exact integer dots make bucket membership — and therefore the entire
    * approximate result set — reproducible in ANSI SQL, so this carries a
    * full DuckDB oracle (recall vs the exact baseline is additionally
    * asserted in ScalaTest).
    */
  object LshTopK extends GraftQuery {
    val name = "q_lsh_topk"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val emb = Graft.table(spark, sfDir, "embeddings")
      lshTopK(emb.filter(col("vec_id") < 50), emb, 64, 3)
    }
    val oracle = Some(
      s"""WITH planes AS (
         |  SELECT t.t, p.p, i.i,
         |         CASE WHEN ('0x' || substr(md5(t.t::VARCHAR || '_' ||
         |                      p.p::VARCHAR || '_' || i.i::VARCHAR), 1, 1))::INT
         |                   % 2 = 1
         |              THEN 1 ELSE -1 END AS w
         |  FROM (SELECT unnest(generate_series(0, ${NumTables - 1})) AS t) t,
         |       (SELECT unnest(generate_series(0, ${PlanesPerTable - 1})) AS p) p,
         |       (SELECT unnest(generate_series(0, 63)) AS i) i),
         |q AS (
         |  SELECT vec_id, i,
         |         CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS q
         |  FROM (SELECT vec_id, unnest(embedding) AS v,
         |               generate_subscripts(embedding, 1) AS i FROM embeddings)),
         |dots AS (
         |  SELECT q.vec_id, pl.t, pl.p, sum(q.q * pl.w) AS d
         |  FROM q JOIN planes pl ON q.i = pl.i + 1
         |  GROUP BY 1, 2, 3),
         |keys AS (
         |  SELECT vec_id,
         |         t * ${1 << PlanesPerTable}
         |         + CAST(sum(CASE WHEN d >= 0 THEN (1 << p) ELSE 0 END) AS INT) AS key
         |  FROM dots GROUP BY vec_id, t),
         |cand AS (
         |  SELECT DISTINCT kq.vec_id AS query_id, kc.vec_id AS neighbor_id
         |  FROM keys kq JOIN keys kc ON kq.key = kc.key
         |  WHERE kq.vec_id < 50 AND kc.vec_id <> kq.vec_id),
         |norms AS (SELECT vec_id, sqrt(CAST(sum(q*q) AS DOUBLE)) AS nrm
         |          FROM q GROUP BY 1),
         |comp AS (
         |  SELECT c.query_id, c.neighbor_id, sum(qa.q * qb.q) AS dot
         |  FROM cand c JOIN q qa ON qa.vec_id = c.query_id
         |              JOIN q qb ON qb.vec_id = c.neighbor_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |         CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) AS cosine
         |  FROM comp JOIN norms na ON query_id = na.vec_id
         |            JOIN norms nb ON neighbor_id = nb.vec_id)
         |SELECT query_id,
         |       CAST(row_number() OVER (PARTITION BY query_id
         |                               ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank,
         |       neighbor_id, cosine
         |FROM scored QUALIFY rank <= 3
         |ORDER BY query_id, rank""".stripMargin)
  }

  /** ANN-quality evaluation: per-query recall@10 of the sign-LSH index
    * ([[lshTopK]]) against the exact cosine top-10 ([[bruteForceTopK]]) —
    * the embedding-side twin of `q_minhash_recall`, and the measurement
    * that decides the tables × planes trade before an index is trusted at
    * scale. Hits are exact counts (both result sets are deterministic down
    * to tie order); recall is one IEEE division. The oracle replays BOTH
    * chains — sharing the quantized-component and norm CTEs — in one SQL
    * statement.
    *
    * Plan shape: the exact side is the audited bounded-query broadcast
    * (50 queries), the LSH side the audited bucket equi-join; the
    * evaluation is a left join on (query, neighbor) + a 50-key aggregate.
    * At production scale the exact side runs on a SAMPLE of queries —
    * which is precisely this query's shape.
    */
  object AnnRecall extends GraftQuery {
    val name = "q_ann_recall"
    private val K = 10
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val emb = Graft.table(spark, sfDir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val exact = bruteForceTopK(queries, emb, K)
        .select(col("query_id"), col("neighbor_id"))
      val approx = lshTopK(queries, emb, 64, K)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
        .orderBy("query_id")
    }
    val oracle = Some(
      s"""WITH planes AS (
         |  SELECT t.t, p.p, i.i,
         |         CASE WHEN ('0x' || substr(md5(t.t::VARCHAR || '_' ||
         |                      p.p::VARCHAR || '_' || i.i::VARCHAR), 1, 1))::INT
         |                   % 2 = 1
         |              THEN 1 ELSE -1 END AS w
         |  FROM (SELECT unnest(generate_series(0, ${NumTables - 1})) AS t) t,
         |       (SELECT unnest(generate_series(0, ${PlanesPerTable - 1})) AS p) p,
         |       (SELECT unnest(generate_series(0, 63)) AS i) i),
         |q AS (
         |  SELECT vec_id, i,
         |         CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS q
         |  FROM (SELECT vec_id, unnest(embedding) AS v,
         |               generate_subscripts(embedding, 1) AS i FROM embeddings)),
         |norms AS (SELECT vec_id, sqrt(CAST(sum(q*q) AS DOUBLE)) AS nrm
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
         |dots AS (
         |  SELECT q.vec_id, pl.t, pl.p, sum(q.q * pl.w) AS d
         |  FROM q JOIN planes pl ON q.i = pl.i + 1
         |  GROUP BY 1, 2, 3),
         |keys AS (
         |  SELECT vec_id,
         |         t * ${1 << PlanesPerTable}
         |         + CAST(sum(CASE WHEN d >= 0 THEN (1 << p) ELSE 0 END) AS INT) AS key
         |  FROM dots GROUP BY vec_id, t),
         |cand AS (
         |  SELECT DISTINCT kq.vec_id AS query_id, kc.vec_id AS neighbor_id
         |  FROM keys kq JOIN keys kc ON kq.key = kc.key
         |  WHERE kq.vec_id < 50 AND kc.vec_id <> kq.vec_id),
         |lsh_comp AS (
         |  SELECT c.query_id, c.neighbor_id, sum(qa.q * qb.q) AS dot
         |  FROM cand c JOIN q qa ON qa.vec_id = c.query_id
         |              JOIN q qb ON qb.vec_id = c.neighbor_id AND qb.i = qa.i
         |  GROUP BY 1, 2),
         |lshk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) DESC,
         |                      neighbor_id ASC) AS rank
         |    FROM lsh_comp JOIN norms na ON query_id = na.vec_id
         |                  JOIN norms nb ON neighbor_id = nb.vec_id)
         |  WHERE rank <= $K)
         |SELECT e.query_id, count(*) AS n_exact,
         |       count(l.neighbor_id) AS n_hit,
         |       CAST(count(l.neighbor_id) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) AS recall
         |FROM exactk e LEFT JOIN lshk l
         |  ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Per-label embedding centroids — the vector-aggregation shape (class
    * centroids feed semantic dedup and IVF coarse quantizers). posexplode →
    * groupBy(label, dim) → exact integer sum → one double divide; the
    * shuffle carries (label, dim, long) triples, so the plan is a plain
    * two-key hash aggregate at any scale. Dim is 1-based to match DuckDB's
    * `generate_subscripts`.
    */
  object LabelCentroid extends GraftQuery {
    val name = "q_label_centroid"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "embeddings")
        .select(col("label"), posexplode(quantize_vec(col("embedding"))))
        .select(col("label"), (col("pos") + 1).as("dim"), col("col").as("q"))
        .groupBy("label", "dim")
        .agg((sum(col("q")).cast("double") /
          (count(lit(1)) * lit(1000000L)).cast("double")).as("centroid"),
          count(lit(1)).as("n_vecs"))
        .orderBy("label", "dim")
    val oracle = Some(
      """SELECT label, dim,
        |       CAST(sum(q) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS centroid,
        |       count(*) AS n_vecs
        |FROM (SELECT label, generate_subscripts(embedding, 1) AS dim,
        |             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        |      FROM embeddings)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Triplet mining for contrastive training: for each query vector, the
    * nearest SAME-label item (the positive) and the nearest
    * DIFFERENT-label item (the hardest negative), with the triplet margin
    * pos_sim − neg_sim — negative margin ⇒ the hardest negative is closer
    * than the best positive, exactly the triplets a metric-learning run
    * wants surfaced. Exact over the bounded query set (the verify tier,
    * like [[CosineTopK]]); at production scale the candidate set comes
    * from the LSH/IVF index and this ranking runs per bucket. Queries
    * whose label has no other member drop out (no positive exists) — an
    * inner join in both engines.
    */
  object HardNegatives extends GraftQuery {
    val name = "q_hard_negatives"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val emb = Graft.table(spark, sfDir, "embeddings")
      val q = emb.filter(col("vec_id") < 30)
        .select(col("vec_id").as("query_id"), col("label").as("q_label"),
          quantize_vec(col("embedding")).as("qq"))
        .withColumn("qn", sqrt(dot_long(col("qq"), col("qq")).cast("double")))
      val c = emb
        .select(col("vec_id").as("neighbor_id"), col("label").as("c_label"),
          quantize_vec(col("embedding")).as("cq"))
        .withColumn("cn", sqrt(dot_long(col("cq"), col("cq")).cast("double")))
      val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("q_label"), col("neighbor_id"), col("c_label"),
          (dot_long(col("qq"), col("cq")).cast("double") / (col("qn") * col("cn")))
            .as("cosine"))
      val byCos = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      val pos = scored.filter(col("c_label") === col("q_label"))
        .withColumn("rn", row_number().over(byCos)).filter(col("rn") === 1)
        .select(col("query_id"), col("neighbor_id").as("pos_id"),
          col("cosine").as("pos_sim"))
      val neg = scored.filter(col("c_label") =!= col("q_label"))
        .withColumn("rn", row_number().over(byCos)).filter(col("rn") === 1)
        .select(col("query_id"), col("neighbor_id").as("neg_id"),
          col("cosine").as("neg_sim"))
      pos.join(neg, Seq("query_id"))
        .select(col("query_id"), col("pos_id"), col("pos_sim"),
          col("neg_id"), col("neg_sim"),
          (col("pos_sim") - col("neg_sim")).as("margin"))
        .orderBy("query_id")
    }
    val oracle = Some(
      """WITH q AS (
        |  SELECT vec_id, label, i,
        |         CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        |  FROM (SELECT vec_id, label, unnest(embedding) AS v,
        |               generate_subscripts(embedding, 1) AS i FROM embeddings)),
        |norms AS (SELECT vec_id, sqrt(CAST(sum(q*q) AS DOUBLE)) AS nrm
        |          FROM q GROUP BY 1),
        |labels AS (SELECT DISTINCT vec_id, label FROM q),
        |comp AS (
        |  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
        |         sum(qa.q * qb.q) AS dot
        |  FROM q qa JOIN q qb ON qb.i = qa.i AND qb.vec_id <> qa.vec_id
        |  WHERE qa.vec_id < 30
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT query_id, neighbor_id, la.label AS q_label, lb.label AS c_label,
        |         CAST(dot AS DOUBLE) / (na.nrm * nb.nrm) AS cosine
        |  FROM comp JOIN norms na ON query_id = na.vec_id
        |            JOIN norms nb ON neighbor_id = nb.vec_id
        |            JOIN labels la ON query_id = la.vec_id
        |            JOIN labels lb ON neighbor_id = lb.vec_id),
        |pos AS (
        |  SELECT query_id, neighbor_id AS pos_id, cosine AS pos_sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id ASC) AS rn
        |    FROM scored WHERE c_label = q_label) WHERE rn = 1),
        |neg AS (
        |  SELECT query_id, neighbor_id AS neg_id, cosine AS neg_sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id ASC) AS rn
        |    FROM scored WHERE c_label <> q_label) WHERE rn = 1)
        |SELECT query_id, pos_id, pos_sim, neg_id, neg_sim,
        |       pos_sim - neg_sim AS margin
        |FROM pos JOIN neg USING (query_id)
        |ORDER BY query_id""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(CosineTopK, LshTopK, LabelCentroid, Ivf.SampledIvfTopK, AnnRecall,
      Ivf.IvfRecall, HardNegatives)
}
