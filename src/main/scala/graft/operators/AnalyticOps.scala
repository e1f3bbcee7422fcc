package graft.operators

import graft.{Graft, GraftQuery}
import graft.functions.SafeMath._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic operators beyond the reference surface (SURVEY §2.9 lists what
  * it lacks): calendar buckets, exact percentiles, regex extraction,
  * gap-based sessionization. Each carries a DuckDB oracle written to the
  * same deterministic formulation.
  */
object AnalyticOps {

  /** Calendar-month revenue rollup (date dimension — absent from the
    * reference, which had no date/time functions at all).
    */
  object OrdersByMonth extends GraftQuery {
    val name = "q_orders_by_month"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "orders")
        .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          exactSum(col("o_totalprice")).as("revenue"))
        .orderBy("month")
    val oracle = Some(
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Exact median order price per segment — defined as the value at rank
    * ⌈n/2⌉ under a total order (no interpolation: engines disagree on
    * percentile interpolation, so the engine defines median positionally
    * and both sides compute the same row).
    */
  object MedianPrice extends GraftQuery {
    val name = "q_median_price"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders")
      val c = Graft.table(spark, sfDir, "customer")
      val j = o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("o_totalprice"), col("o_orderkey"))
      val w = Window.partitionBy("segment")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      j.select(col("segment"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(Window.partitionBy("segment")).as("n"))
        .filter(col("rn") === expr("(n + 1) div 2")) // integer div — `/` on longs is double division in Spark
        .select(col("segment"), col("o_totalprice").as("median_price"), col("n"))
        .orderBy("segment")
    }
    val oracle = Some(
      """SELECT segment, o_totalprice AS median_price, n FROM (
        |  SELECT c_mktsegment AS segment, o_totalprice,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        |         count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn = (n + 1) // 2
        |ORDER BY segment""".stripMargin)
  }

  /** Regex field extraction (the F1 path→id shape, exercised relationally):
    * first word of each part name → histogram.
    */
  object RegexExtract extends GraftQuery {
    val name = "q_regex_extract"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "part")
        .select(regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"))
        .groupBy("first_word").agg(count(lit(1)).as("n"))
        .orderBy("first_word")
    val oracle = Some(
      """SELECT regexp_extract(p_name, '^(\w+)', 1) AS first_word, count(*) AS n
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Gap-based sessionization: a new session starts when a user is idle
    * > 30 minutes. lag → gap flag → cumulative session id → per-session
    * rollup. Timestamps handled in epoch seconds (identical integer math in
    * both engines). The batch twin of streaming state sessionization.
    */
  object Sessionize extends GraftQuery {
    val name = "q_sessionize"
    private val GapSeconds = 1800L
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"),
          // ts is nanos-as-long; integer div — a double round-trip drifts
          expr("ts div 1000000000").as("sec"), col("value"))
      val byUser = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
      val flagged = ev.select(col("user_id"), col("event_id"), col("sec"), col("value"),
        when(col("sec") - lag(col("sec"), 1).over(byUser) > GapSeconds, 1L)
          .otherwise(lit(0L)).as("new_sess"))
      val sessions = flagged.select(col("user_id"), col("sec"), col("value"),
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("sess_id"))
      sessions.groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          (max(col("sec")) - min(col("sec"))).as("duration_sec"),
          exactSum(col("value")).as("total_value"))
        .orderBy("user_id", "sess_id")
    }
    val oracle = Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_id,
         |         epoch_ns(ts) // 1000000000 AS sec, value
         |  FROM events),
         |flagged AS (
         |  SELECT user_id, sec, value,
         |         CASE WHEN sec - lag(sec, 1) OVER w > $GapSeconds
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         |sessions AS (
         |  SELECT user_id, sec, value,
         |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
         |  FROM flagged)
         |SELECT user_id, sess_id, count(*) AS n_events,
         |       CAST(max(sec) - min(sec) AS BIGINT) AS duration_sec,
         |       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
         |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Approximate distinct (A6's scale variant): HLL++ estimate next to the
    * exact count per return flag. Rows-only check — sketch internals have
    * no DuckDB equivalent; the tolerance contract is asserted in ScalaTest.
    */
  object ApproxDistinct extends GraftQuery {
    val name = "q_approx_distinct"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy("l_returnflag")
    val oracle = None // HLL sketch internals differ per engine
  }

  val all: Seq[GraftQuery] =
    Seq(OrdersByMonth, MedianPrice, RegexExtract, Sessionize, ApproxDistinct)
}
