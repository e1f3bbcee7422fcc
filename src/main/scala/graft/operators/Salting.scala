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
      .agg(sum(col("v").cast("decimal(27,6)")).as("ps"), count(lit(1)).as("pc"))
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
}
