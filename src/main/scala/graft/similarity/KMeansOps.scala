package graft.similarity

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over the embedding column, and the
  * SemDeDup-style semantic dedup built on top of it (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication" — public arXiv paper): cluster the corpus with k-means,
  * then look for near-duplicate pairs ONLY inside each cluster, so the
  * quadratic all-pairs cosine scan shrinks to per-cluster blocks.
  *
  * This is the third candidate generator of the embedding-dedup family —
  * `q_embed_neardup` (bounded brute force, the truth tier),
  * `q_embed_neardup_lsh` (random-hyperplane buckets), and now learned
  * centroid buckets. Like the LSH variant it trades recall for a linear
  * plan, and like every approximate family in this engine it ships a
  * measured recall against the exact truth (`q_semdedup_recall`).
  *
  * Scale shape (the 100 TB story):
  *   - Every per-round step is one shuffle: the assign step is a
  *     broadcast of k centroids (k·dim longs — kilobytes) against a scan
  *     of the corpus plus a vec_id-partitioned window argmin; the update
  *     step is a (cluster, pos) hash aggregate whose output is k·dim rows
  *     regardless of corpus size. Rounds are BOUNDED (a fixed constant,
  *     not data-driven), mirroring MLlib's own KMeans loop: centers live
  *     on the driver between rounds because they are k·dim values — the
  *     documented bounded-collect pattern (same contract as the BPE
  *     trainer's 1-row argmax per round).
  *   - The within-cluster pair scan is quadratic in CLUSTER size, not
  *     corpus size. At scale k grows with the corpus (the paper uses
  *     ~n/10k clusters) so cluster sizes stay bounded and the total work
  *     is n × avg_cluster_size — the same contract as the LSH band join.
  *     Here k is a fixed registry parameter sized for the test corpus.
  *
  * All arithmetic is exact: embeddings are quantized to 1e-6 integer
  * units ([[graft.plans.VectorExpressions.quantize_vec]]), distances and
  * centroid sums are BIGINT, and the centroid update divides with
  * truncating integer `div` — DuckDB's `//` truncates toward zero the
  * same way, so the oracle (which unrolls the rounds as CTEs exactly like
  * `q_pagerank`) reproduces every assignment bit-for-bit. The only
  * doubles are the final cosines: `dot / (sqrt(na)·sqrt(nb))` over exact
  * integers, each step an IEEE-exact deterministic op (same argument as
  * [[graft.dedup.Dedup.EmbedNearDup]]).
  *
  * Reference tie-in: the reference's own k-means is per-image dominant
  * color (`pyspark_dominant.py:74-108`, re-expressed in
  * `images/ImageOps.scala:208`); this is the corpus-level counterpart the
  * training-data north star needs.
  */
object KMeansOps {

  import graft.plans.VectorExpressions.{dot_long, quantize_vec}

  /** Registry parameters — fixed so the oracle text is static. */
  val K = 8
  val Rounds = 3
  val Tau = 0.3

  /** Quantized corpus frame: (vec_id, q: array<long>, nq2 = q·q). */
  private[similarity] def quantized(spark: SparkSession, sfDir: String): DataFrame =
    Graft.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), quantize_vec(col("embedding")).as("q"))
      .withColumn("nq2", dot_long(col("q"), col("q")))

  /** One assignment pass: broadcast the k centroids, score every vector
    * against each with the exact integer identity
    * ‖q−c‖² = q·q − 2·q·c + c·c, and keep the argmin (ties → smallest
    * cluster id, same as the oracle's `ORDER BY d, cluster`). The window
    * partitions by vec_id — high-cardinality, never a partitionless
    * window.
    */
  private def assignStep(e: DataFrame, cents: Seq[(Long, Array[Long])]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cdf = cents.map { case (cl, cv) =>
      (cl, cv, cv.map(x => x * x).sum)
    }.toDF("cluster", "cv", "nc2")
    val rn = row_number().over(
      Window.partitionBy("vec_id").orderBy(col("d"), col("cluster")))
    e.crossJoin(broadcast(cdf))
      .withColumn("d", col("nq2") - lit(2L) * dot_long(col("q"), col("cv")) + col("nc2"))
      .withColumn("rn", rn)
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cluster"), col("q"), col("nq2"))
  }

  /** Centroid update: per-(cluster, dimension) exact integer mean
    * (truncating `div`, matching DuckDB `//`). The aggregate output is
    * k·dim rows whatever the corpus size — the bounded collect.
    */
  private def updateStep(assigned: DataFrame): Seq[(Long, Array[Long])] = {
    val rows: Array[Row] = assigned
      .select(col("cluster"), posexplode(col("q")))
      .groupBy("cluster", "pos")
      .agg(expr("sum(col) div count(1)").as("cv"))
      .collect()
    rows.groupBy(_.getLong(0)).toSeq
      .map { case (cl, rs) =>
        (cl, rs.sortBy(_.getInt(1)).map(_.getLong(2)).toArray)
      }
      .sortBy(_._1)
  }

  /** Lloyd's loop: seed centroids are the first k vectors (vec_id < k —
    * deterministic, matching the oracle's c0), then `rounds` assign
    * passes with `rounds − 1` interleaved updates. Returns the final
    * assignment frame (vec_id, cluster, q, nq2). Callers should persist
    * `e`: it is scanned once per round.
    */
  private[similarity] def fit(e: DataFrame, k: Int, rounds: Int): DataFrame = {
    var cents: Seq[(Long, Array[Long])] = e
      .filter(col("vec_id") < k)
      .select(col("vec_id"), col("q"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
      .toSeq
    var assigned: DataFrame = null
    for (r <- 1 to rounds) {
      assigned = assignStep(e, cents)
      if (r < rounds) cents = updateStep(assigned)
    }
    assigned
  }

  /** Within-cluster near-dup pairs over the fitted assignment: a
    * cluster-equi self-join (never a cartesian), exact quantized cosine,
    * threshold τ. Output (cluster, id_a, id_b, cosine).
    */
  private def clusterPairs(assigned: DataFrame): DataFrame = {
    val withNorm = assigned.withColumn(
      "nrm", sqrt(col("nq2").cast("double")))
    val a = withNorm.select(col("cluster"), col("vec_id").as("id_a"),
      col("q").as("qa"), col("nrm").as("na"))
    val b = withNorm.select(col("cluster").as("cluster_b"),
      col("vec_id").as("id_b"), col("q").as("qb"), col("nrm").as("nb"))
    a.join(b, col("cluster") === col("cluster_b") && col("id_a") < col("id_b"))
      .select(col("cluster").cast("int").as("cluster"), col("id_a"), col("id_b"),
        (dot_long(col("qa"), col("qb")).cast("double") /
          (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= lit(Tau))
  }

  // ---------------------------------------------------------------- oracle

  /** Shared oracle text: quantize + k-means rounds unrolled as CTEs (the
    * `q_pagerank` pattern). Yields CTE list ending at `a<rounds>`.
    */
  private def kmeansCtes(kSql: String, rounds: Int): String = {
    def assignCte(a: String, c: String): String =
      s"""$a AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY d ASC, cluster ASC) AS rn
         |    FROM (SELECT qq.vec_id, c.cluster,
         |                 sum((qq.qv - c.cv) * (qq.qv - c.cv)) AS d
         |          FROM qq JOIN $c c ON qq.pos = c.pos
         |          GROUP BY 1, 2))
         |  WHERE rn = 1)""".stripMargin
    def updateCte(c: String, a: String): String =
      s"""$c AS (
         |  SELECT a.cluster, qq.pos,
         |         CAST(sum(qq.qv) AS BIGINT) // count(*) AS cv
         |  FROM qq JOIN $a a ON qq.vec_id = a.vec_id
         |  GROUP BY 1, 2)""".stripMargin
    val ctes = scala.collection.mutable.ArrayBuffer(
      s"""qq AS (
         |  SELECT vec_id, i - 1 AS pos,
         |         CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT) AS qv
         |  FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |               unnest(embedding) AS v FROM embeddings))""".stripMargin,
      s"c0 AS (SELECT vec_id AS cluster, pos, qv AS cv FROM qq WHERE vec_id < $kSql)")
    for (r <- 1 to rounds) {
      ctes += assignCte(s"a$r", s"c${r - 1}")
      if (r < rounds) ctes += updateCte(s"c$r", s"a$r")
    }
    ctes.mkString(",\n")
  }

  /** norms + within-cluster scored pairs on top of [[kmeansCtes]]. */
  private def pairsCtes(rounds: Int): String =
    s"""norms AS (SELECT vec_id, sqrt(CAST(sum(qv * qv) AS DOUBLE)) AS nrm
       |          FROM qq GROUP BY 1),
       |pdots AS (
       |  SELECT aa.cluster, aa.vec_id AS id_a, bb.vec_id AS id_b,
       |         CAST(sum(qa.qv * qb.qv) AS DOUBLE) AS dot
       |  FROM a$rounds aa JOIN a$rounds bb
       |    ON aa.cluster = bb.cluster AND aa.vec_id < bb.vec_id
       |  JOIN qq qa ON qa.vec_id = aa.vec_id
       |  JOIN qq qb ON qb.vec_id = bb.vec_id AND qa.pos = qb.pos
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT cluster, id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine
       |  FROM pdots JOIN norms na ON id_a = na.vec_id
       |             JOIN norms nb ON id_b = nb.vec_id)""".stripMargin

  // --------------------------------------------------------------- queries

  /** Corpus k-means assignment — K clusters, Rounds Lloyd's rounds. */
  object KMeansEmbed extends GraftQuery {
    val name = "q_kmeans_embed"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // persisted barrier: every round's assign pass and both update
      // aggregates re-read the quantized frame. The harness (Verify /
      // Bench) clears the cache after each query — the engine-wide
      // persist-lifecycle convention.
      val e = quantized(spark, sfDir).persist()
      fit(e, K, Rounds)
        .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
        .orderBy("vec_id")
    }
    val oracle = Some(
      s"""WITH ${kmeansCtes(K.toString, Rounds)}
         |SELECT vec_id, CAST(cluster AS INT) AS cluster
         |FROM a$Rounds ORDER BY vec_id""".stripMargin)
  }

  /** SemDeDup candidate pairs: within-cluster exact cosine ≥ τ. */
  object SemDedup extends GraftQuery {
    val name = "q_semdedup"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = quantized(spark, sfDir).persist()
      clusterPairs(fit(e, K, Rounds)).orderBy("id_a", "id_b")
    }
    val oracle = Some(
      s"""WITH ${kmeansCtes(K.toString, Rounds)},
         |${pairsCtes(Rounds)}
         |SELECT CAST(cluster AS INT) AS cluster, id_a, id_b, cosine
         |FROM scored WHERE cosine >= $Tau
         |ORDER BY id_a, id_b""".stripMargin)
  }

  /** SemDeDup prune summary: per cluster, how many vectors survive the
    * keep-smallest-id rule (a vector is dropped iff some smaller-id
    * cluster-mate sits within τ).
    */
  object SemDedupPrune extends GraftQuery {
    val name = "q_semdedup_prune"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = quantized(spark, sfDir).persist()
      // both the size rollup and the pair scan read the final assignment
      val assigned = fit(e, K, Rounds).persist()
      val sizes = assigned.groupBy(col("cluster").cast("int").as("cluster"))
        .agg(count(lit(1)).as("n_vecs"))
      val dropped = clusterPairs(assigned)
        .groupBy("cluster")
        .agg(countDistinct(col("id_b")).as("n_dropped"))
      sizes.join(dropped, Seq("cluster"), "left")
        .select(col("cluster"), col("n_vecs"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          (col("n_vecs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
        .orderBy("cluster")
    }
    val oracle = Some(
      s"""WITH ${kmeansCtes(K.toString, Rounds)},
         |${pairsCtes(Rounds)},
         |dropped AS (SELECT cluster, count(DISTINCT id_b) AS n_dropped
         |            FROM scored WHERE cosine >= $Tau GROUP BY 1),
         |sizes AS (SELECT cluster, count(*) AS n_vecs FROM a$Rounds GROUP BY 1)
         |SELECT CAST(s.cluster AS INT) AS cluster, s.n_vecs,
         |       COALESCE(d.n_dropped, 0) AS n_dropped,
         |       s.n_vecs - COALESCE(d.n_dropped, 0) AS n_kept
         |FROM sizes s LEFT JOIN dropped d ON s.cluster = d.cluster
         |ORDER BY 1""".stripMargin)
  }

  /** Recall of the cluster-bucketed candidate generator against the exact
    * all-pairs truth at the same τ — the eval query of this family
    * (same stance as `q_ann_recall` / `q_minhash_recall`: the truth tier
    * is quadratic by definition and exists to measure, not to run at
    * corpus scale).
    */
  object SemDedupRecall extends GraftQuery {
    val name = "q_semdedup_recall"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = quantized(spark, sfDir).persist()
      val caught = clusterPairs(fit(e, K, Rounds))
        .select(col("id_a"), col("id_b"))
      val withNorm = e.withColumn("nrm", sqrt(col("nq2").cast("double")))
      val ta = withNorm.select(col("vec_id").as("id_a"),
        col("q").as("qa"), col("nrm").as("na"))
      val tb = withNorm.select(col("vec_id").as("id_b"),
        col("q").as("qb"), col("nrm").as("nb"))
      val truth = ta.join(broadcast(tb), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (dot_long(col("qa"), col("qb")).cast("double") /
            (col("na") * col("nb"))).as("cosine"))
        .filter(col("cosine") >= lit(Tau))
        .select(col("id_a"), col("id_b"))
      truth.join(caught.withColumn("hit", lit(1)),
          Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_true"), count(col("hit")).as("n_caught"),
          (count(col("hit")).cast("double") /
            count(lit(1)).cast("double")).as("recall"))
    }
    val oracle = Some(
      s"""WITH ${kmeansCtes(K.toString, Rounds)},
         |${pairsCtes(Rounds)},
         |caught AS (SELECT id_a, id_b FROM scored WHERE cosine >= $Tau),
         |tdots AS (
         |  SELECT qa.vec_id AS id_a, qb.vec_id AS id_b,
         |         CAST(sum(qa.qv * qb.qv) AS DOUBLE) AS dot
         |  FROM qq qa JOIN qq qb
         |    ON qa.pos = qb.pos AND qa.vec_id < qb.vec_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT id_a, id_b
         |  FROM tdots JOIN norms na ON id_a = na.vec_id
         |             JOIN norms nb ON id_b = nb.vec_id
         |  WHERE dot / (na.nrm * nb.nrm) >= $Tau)
         |SELECT count(*) AS n_true, count(c.id_a) AS n_caught,
         |       CAST(count(c.id_a) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
         |FROM truth t LEFT JOIN caught c
         |  ON t.id_a = c.id_a AND t.id_b = c.id_b""".stripMargin)
  }

  /** Anchor-sample size for the PRODUCTION recall tier — fixed so the
    * oracle text is static.
    */
  val AnchorCount = 64

  /** Recall of the cluster-bucketed candidate generator measured on a
    * FIXED hash-selected anchor sample — the production form of
    * [[SemDedupRecall]], closing the round-6 `weak` flag: the exact
    * all-pairs truth tier is quadratic at corpus scale, while this truth
    * side is O(sample × corpus) — the 64 anchors (smallest portable md5
    * of vec_id, tie-broken by vec_id: a deterministic uniform sample)
    * broadcast against one scan of the corpus. Every production recall
    * eval runs this shape: recall over a fixed query subset, not over all
    * pairs. Truth = anchor-touching pairs with exact cosine ≥ τ
    * (normalized to id_a < id_b, DISTINCT because both endpoints can be
    * anchors); caught = the SemDeDup within-cluster pairs. The anchor
    * selection is a TakeOrdered(64) — top-k, not a sort of the corpus —
    * and the anchor frame is the documented bounded broadcast
    * (64 × (dim+2) values).
    */
  object SemDedupRecallSampled extends GraftQuery {
    val name = "q_semdedup_recall_sampled"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val e = quantized(spark, sfDir).persist()
      val caught = clusterPairs(fit(e, K, Rounds))
        .select(col("id_a"), col("id_b"))
      val withNorm = e.withColumn("nrm", sqrt(col("nq2").cast("double")))
      val anchors = withNorm
        .select(col("vec_id").as("aid"), col("q").as("qa"), col("nrm").as("na"))
        .orderBy(pHash60(col("aid").cast("string")), col("aid"))
        .limit(AnchorCount)
      val truth = withNorm
        .select(col("vec_id").as("bid"), col("q").as("qb"), col("nrm").as("nb"))
        .crossJoin(broadcast(anchors))
        .filter(col("aid") =!= col("bid"))
        .select(least(col("aid"), col("bid")).as("id_a"),
          greatest(col("aid"), col("bid")).as("id_b"),
          (dot_long(col("qa"), col("qb")).cast("double") /
            (col("na") * col("nb"))).as("cosine"))
        .filter(col("cosine") >= lit(Tau))
        .select(col("id_a"), col("id_b")).distinct()
      truth.join(caught.withColumn("hit", lit(1)),
          Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_true"), count(col("hit")).as("n_caught"),
          (count(col("hit")).cast("double") /
            count(lit(1)).cast("double")).as("recall"))
    }
    val oracle = Some(
      s"""WITH ${kmeansCtes(K.toString, Rounds)},
         |${pairsCtes(Rounds)},
         |scat AS (SELECT id_a, id_b FROM scored WHERE cosine >= $Tau),
         |anch AS (
         |  SELECT vec_id FROM (SELECT DISTINCT vec_id FROM qq) t
         |  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT,
         |           vec_id
         |  LIMIT $AnchorCount),
         |tdots AS (
         |  SELECT qa.vec_id AS aid, qb.vec_id AS bid,
         |         CAST(sum(qa.qv * qb.qv) AS DOUBLE) AS dot
         |  FROM qq qa JOIN anch an ON qa.vec_id = an.vec_id
         |  JOIN qq qb ON qa.pos = qb.pos AND qa.vec_id <> qb.vec_id
         |  GROUP BY 1, 2),
         |struth AS (
         |  SELECT DISTINCT least(aid, bid) AS id_a, greatest(aid, bid) AS id_b
         |  FROM tdots JOIN norms na ON aid = na.vec_id
         |             JOIN norms nb ON bid = nb.vec_id
         |  WHERE dot / (na.nrm * nb.nrm) >= $Tau)
         |SELECT count(*) AS n_true, count(c.id_a) AS n_caught,
         |       CAST(count(c.id_a) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
         |FROM struth t LEFT JOIN scat c
         |  ON t.id_a = c.id_a AND t.id_b = c.id_b""".stripMargin)
  }

  /** [[SemDedup]] with the cluster count ADAPTED to the corpus — the
    * paper's own stance (k grows with n so cluster sizes, and with them
    * the within-cluster pair volume, stay constant), which the round-7
    * shuffle audit measured the fixed-k harness variant violating (107×
    * shuffled rows for 10× vectors ≈ the n²/k law with k fixed). Here
    * k = ⌈n / 64⌉ from a 1-row count (bounded-collect pattern; target
    * mean cluster size 64), so pair volume ≈ n·64/2 — linear. The
    * oracle replays the choice as `(count(*) + 63) // 64` and feeds it
    * into the SAME CTE-unrolled Lloyd's machinery (the k literal was
    * the only k-specific text in it). Same τ, same exact integer
    * arithmetic, same seeds-are-first-k rule.
    */
  object SemDedupAdaptive extends GraftQuery {
    val name = "q_semdedup_adaptive"
    val TargetCluster = 64
    /** ⌈n / TargetCluster⌉, exact in integers. */
    def kFor(n: Long): Int = ((n + TargetCluster - 1) / TargetCluster).toInt
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = quantized(spark, sfDir).persist()
      val k = kFor(e.count()) // bounded: one count action, 1 row
      clusterPairs(fit(e, k, Rounds)).orderBy("id_a", "id_b")
    }
    val oracle = Some(
      s"""WITH kk AS (
         |  SELECT (count(*) + ${TargetCluster - 1}) // $TargetCluster AS k
         |  FROM embeddings),
         |${kmeansCtes("(SELECT k FROM kk)", Rounds)},
         |${pairsCtes(Rounds)}
         |SELECT CAST(cluster AS INT) AS cluster, id_a, id_b, cosine
         |FROM scored WHERE cosine >= $Tau
         |ORDER BY id_a, id_b""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(KMeansEmbed, SemDedup, SemDedupAdaptive, SemDedupPrune,
      SemDedupRecall, SemDedupRecallSampled)
}
