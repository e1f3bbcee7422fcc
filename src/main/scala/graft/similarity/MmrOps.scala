package graft.similarity

import graft.{Graft, GraftQuery}
import graft.plans.VectorExpressions.{dot_long, quantize_vec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998) —
  * the diversity-aware retrieval step RAG pipelines run between ANN
  * candidate generation and context assembly: greedily pick k items
  * maximizing λ·sim(query, c) − (1−λ)·max_{s∈selected} sim(c, s).
  *
  * Determinism: λ = 1/2, so both products are exact IEEE halvings, the
  * penalty is a max over identical doubles, and every cosine is the
  * engine-exact quantized-integer form ([[Similarity.dotExact]]) — the
  * greedy trace is bit-reproducible in ANSI SQL, ties broken by vec_id.
  *
  * Scale shape: the selected set is ≤ k BY CONSTRUCTION, so each round is
  * one pass over the persisted candidate set, a broadcast join against ≤ k
  * selected vectors, and a TakeOrdered(1) — k bounded driver collects of
  * one row each (the k-means/BPE bounded-collect pattern). The oracle
  * replays the greedy unrolled round-by-round, looking up sims in an
  * all-pairs CTE (oracle-side only; the engine never materializes
  * all-pairs).
  */
object MmrOps {

  /** Greedy MMR over the embeddings table, anchored at query vector 0. */
  object MmrSelect extends GraftQuery {
    val name = "q_mmr_select"
    private val K = 5
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val prep = Graft.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), quantize_vec(col("embedding")).as("q"))
        .select(col("vec_id"), col("q"),
          sqrt(dot_long(col("q"), col("q")).cast("double")).as("n"))
      val anchor = prep.filter(col("vec_id") === 0)
        .select(col("q").as("q0"), col("n").as("n0"))
      val cands = prep.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(anchor))
        .select(col("vec_id"), col("q"), col("n"),
          (dot_long(col("q"), col("q0")).cast("double") / (col("n") * col("n0")))
            .as("rel"))
        .persist()
      try {
        var picked = Vector.empty[(Int, Long, Double)] // (rank, vec_id, score)
        var selVecs = Vector.empty[(Long, Seq[Long], Double)] // (id, q, n)
        for (r <- 1 to K) {
          val notSel = cands.filter(!col("vec_id")
            .isInCollection(picked.map(_._2) :+ -1L))
          val scoredDf =
            if (selVecs.isEmpty)
              notSel.select(col("vec_id"),
                (lit(0.5) * col("rel")).as("score"))
            else {
              val selDf = selVecs.toDF("s_id", "s_q", "s_n")
              notSel.crossJoin(broadcast(selDf))
                .select(col("vec_id"), col("rel"),
                  (dot_long(col("q"), col("s_q")).cast("double") /
                    (col("n") * col("s_n"))).as("sim"))
                // rel is constant per vec_id, so max() carries it exactly
                .groupBy("vec_id")
                .agg(max(col("rel")).as("rel"), max(col("sim")).as("pen"))
                .select(col("vec_id"),
                  (lit(0.5) * col("rel") - lit(0.5) * col("pen")).as("score"))
            }
          val top = scoredDf
            .orderBy(col("score").desc, col("vec_id").asc).limit(1)
            .collect()(0)
          val id = top.getAs[Long]("vec_id")
          picked :+= ((r, id, top.getAs[Double]("score")))
          val row = cands.filter(col("vec_id") === id)
            .select(col("q"), col("n")).collect()(0)
          selVecs :+= ((id, row.getSeq[Long](0), row.getDouble(1)))
        }
        picked.toDF("rank", "vec_id", "score").orderBy("rank")
      } finally cands.unpersist()
    }
    // join-based penalty (a correlated max-subquery re-evaluates the cos
    // CTE per candidate row in DuckDB — quadratic oracle time)
    private def round(r: Int): String = {
      val prev = (1 until r).map(i => s"SELECT vec_id FROM sel$i")
        .mkString(" UNION ALL ")
      s"""pen$r AS (
         |  SELECT c.a AS vec_id, max(c.sim) AS pen
         |  FROM cos c JOIN ($prev) s ON c.b = s.vec_id
         |  GROUP BY 1),
         |sc$r AS (
         |  SELECT rel.vec_id, 0.5 * rel.rel - 0.5 * pen$r.pen AS score
         |  FROM rel JOIN pen$r USING (vec_id)
         |  WHERE rel.vec_id NOT IN ($prev)),
         |sel$r AS (SELECT vec_id, score FROM sc$r
         |          ORDER BY score DESC, vec_id ASC LIMIT 1)""".stripMargin
    }
    val oracle = Some(
      s"""WITH q AS (
         |  SELECT vec_id, i,
         |         CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS q
         |  FROM (SELECT vec_id, unnest(embedding) AS v,
         |               generate_subscripts(embedding, 1) AS i FROM embeddings)),
         |norms AS (SELECT vec_id, sqrt(CAST(sum(q * q) AS DOUBLE)) AS nrm
         |          FROM q GROUP BY 1),
         |cos AS MATERIALIZED (
         |  SELECT qa.vec_id AS a, qb.vec_id AS b,
         |         CAST(sum(qa.q * qb.q) AS DOUBLE) / (na.nrm * nb.nrm) AS sim
         |  FROM q qa JOIN q qb ON qb.i = qa.i AND qb.vec_id <> qa.vec_id
         |       JOIN norms na ON qa.vec_id = na.vec_id
         |       JOIN norms nb ON qb.vec_id = nb.vec_id
         |  GROUP BY 1, 2, na.nrm, nb.nrm),
         |rel AS (SELECT b AS vec_id, sim AS rel FROM cos WHERE a = 0),
         |sel1 AS (SELECT vec_id, 0.5 * rel AS score FROM rel
         |         ORDER BY score DESC, vec_id ASC LIMIT 1),
         |${(2 to 5).map(round).mkString(",\n")}
         |SELECT * FROM (
         |  SELECT 1 AS rank, vec_id, score FROM sel1
         |  ${(2 to 5).map(r => s"UNION ALL SELECT $r AS rank, vec_id, score FROM sel$r")
             .mkString("\n  ")})
         |ORDER BY rank""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(MmrSelect)
}
