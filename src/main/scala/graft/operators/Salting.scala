package graft.operators

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew tools for 100 TB keys (SURVEY §7 "scale hardening").
  *
  * AQE's skew-join splitting handles joins; *aggregations* over a hot key
  * still funnel that key's rows into one task. The classic fix is salting:
  * aggregate on (key, salt) first — partial results spread over N tasks —
  * then merge partials per key. For algebraic aggregates (sum/count/min/
  * max) the two-phase result is exactly the single-phase result; our
  * decimal-exact sums stay order-independent through both hops.
  */
object Salting {

  /** Two-phase salted sum/count per key.
    *
    * @param salts number of partial buckets per key (≈ the worst key's
    *              row-share divided by a healthy task size)
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame = {
    // deterministic salt: spreads a hot key's rows without an RNG (rand()
    // would break retry-idempotence — a retried task must re-salt the same
    // row identically or partials double-count)
    val salt = pmod(hash(value), lit(salts))
    df.select(key.as("key"), value.as("v"), salt.as("salt"))
      .groupBy("key", "salt")
      .agg(sum(graft.plans.DecimalExpressions.double_to_decimal6(col("v"))).as("ps"), count(lit(1)).as("pc"))
      .groupBy("key")
      .agg(sum(col("ps")).cast("double").as("total"), sum(col("pc")).as("n"))
  }

  /** The salted two-phase aggregate as a driver query, over the most skewed
    * grouping in the testdata (3 return-flag values × 600k rows at sf0.1 —
    * each key's rows would otherwise land on a single reducer). The oracle
    * is the PLAIN single-phase GROUP BY: hash equality proves the salted
    * rewrite is result-identical, which is exactly the property that makes
    * it safe to apply mechanically to hot keys at 100 TB.
    */
  object SaltedAgg extends GraftQuery {
    val name = "q_salted_agg"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      saltedSumCount(
        Graft.table(spark, sfDir, "lineitem"),
        col("l_returnflag"), col("l_extendedprice"), salts = 32)
        .withColumnRenamed("key", "l_returnflag")
        .orderBy("l_returnflag")
    val oracle = Some(
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS total,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Join-key skew diagnostic — the measurement that DECIDES when the
    * salting/AQE machinery above is needed: for a prospective shuffle key
    * (event user_id here), the top-10 heaviest keys with their exact row
    * share, plus the uniform-share baseline (1/distinct-keys) each row
    * carries for comparison. A key whose share is many multiples of the
    * uniform share is the task that will straggle.
    *
    * One scan → key-count aggregate; the totals broadcast back onto the
    * 10-row top-k (TakeOrdered), so the diagnostic costs one map-side-
    * combinable pass regardless of table size — cheap enough to run
    * routinely before expensive joins, which is its entire point.
    */
  object KeySkew extends GraftQuery {
    val name = "q_key_skew"
    private val K = 10
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // persisted barrier (caller-owned lifecycle, as everywhere): the
      // key-count aggregate has two consumers (the totals and the top-k)
      // and is orders of magnitude narrower than the fact table —
      // without it each consumer re-scans the events table
      val per = Graft.table(spark, sfDir, "events")
        .groupBy(col("user_id").as("key"))
        .agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = per.agg(sum(col("n")).as("total_rows"),
        count(lit(1)).as("n_keys"))
      per.crossJoin(broadcast(tot))
        .select(col("key"), col("n"), col("total_rows"), col("n_keys"),
          (col("n").cast("double") / col("total_rows").cast("double"))
            .as("share"),
          (col("n").cast("double") * col("n_keys").cast("double") /
            col("total_rows").cast("double")).as("x_uniform"))
        .orderBy(col("n").desc, col("key").asc)
        .limit(K)
    }
    val oracle = Some(
      s"""WITH per AS (
         |  SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS total_rows,
         |         count(*) AS n_keys FROM per)
         |SELECT key, n, total_rows, n_keys,
         |       CAST(n AS DOUBLE) / CAST(total_rows AS DOUBLE) AS share,
         |       CAST(n AS DOUBLE) * CAST(n_keys AS DOUBLE)
         |         / CAST(total_rows AS DOUBLE) AS x_uniform
         |FROM per CROSS JOIN tot
         |ORDER BY n DESC, key ASC
         |LIMIT $K""".stripMargin)
  }

  /** The salted JOIN — [[SaltedAgg]]'s sibling for the join side: when one
    * join key carries most of the fact rows, the standard rewrite salts
    * the fact side (deterministic value-hash, retry-idempotent) and
    * REPLICATES each dim row across all salts, turning one straggler
    * partition into `salts` even ones. AQE's skew splitting does this
    * adaptively for sort-merge joins; the explicit rewrite is the form
    * that also covers aggregating-after-join and pre-AQE engines, and —
    * run here over the most skewed key in the testdata (3 return flags ×
    * 600k rows at sf0.1) — it is HASH-PROVEN result-identical to the
    * plain join, which the oracle states directly as the unsalted query.
    *
    * The dim is hash-derived per key (a fee-rate lookup), replicated
    * `salts`× by a scan-side explode — dim replication cost is
    * |dim|·salts rows, the deliberate trade against the hot partition.
    * Each weighted element is ONE IEEE product, summed decimal-exact.
    */
  object SaltedJoin extends GraftQuery {
    val name = "q_salted_join"
    private val Salts = 32
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash28
      val fact = Graft.table(spark, sfDir, "lineitem")
        .select(col("l_returnflag").as("key"), col("l_extendedprice").as("v"),
          pmod(hash(col("l_extendedprice")), lit(Salts)).as("salt"))
      val dim = Graft.table(spark, sfDir, "lineitem")
        .select(col("l_returnflag").as("key")).distinct()
        .select(col("key"),
          (pHash28(concat(lit("rate:"), col("key"))) % 50 + 1).as("rate"))
        .select(col("key"), col("rate"),
          explode(sequence(lit(0), lit(Salts - 1))).as("salt"))
      fact.join(dim, Seq("key", "salt"))
        .groupBy("key")
        .agg(count(lit(1)).as("n"),
          sum(graft.plans.DecimalExpressions.double_to_decimal6(col("v") * col("rate"))).cast("double")
            .as("weighted_total"))
        .withColumnRenamed("key", "l_returnflag")
        .orderBy("l_returnflag")
    }
    val oracle = Some(
      """WITH dim AS (
        |  SELECT DISTINCT l_returnflag AS key,
        |         ('0x' || substr(md5('rate:' || l_returnflag), 1, 7))::BIGINT
        |           % 50 + 1 AS rate
        |  FROM lineitem)
        |SELECT l.l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(l.l_extendedprice * d.rate AS DECIMAL(27,6)))
        |            AS DOUBLE) AS weighted_total
        |FROM lineitem l JOIN dim d ON l.l_returnflag = d.key
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }
}
