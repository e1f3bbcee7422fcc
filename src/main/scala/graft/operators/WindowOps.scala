package graft.operators

import graft.{Graft, GraftQuery}
import graft.functions.SafeMath._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window and time-bucket operators (absent from the reference — SURVEY §2.5
  * notes it has none; these complete the analytic surface).
  */
object WindowOps {

  /** Running per-supplier revenue ordered by ship date. The frame sum runs
    * through DECIMAL so the running value is order-of-association independent
    * (DuckDB evaluates window sums with segment trees; double addition would
    * differ in the last ulp). Tie-broken to a total order.
    */
  object RunningSum extends GraftQuery {
    val name = "q_window_running"
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem —
    // only the full row tuple is. The frame order must be total or the
    // running prefix is engine-dependent, so sort on every column.
    private val tieBreak = Seq("l_shipdate", "l_orderkey", "l_linenumber",
      "l_partkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus")
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
      val w = Window.partitionBy("l_suppkey")
        .orderBy(tieBreak.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(graft.plans.DecimalExpressions.double_to_decimal6(col("l_extendedprice"))).over(w)
            .cast("double").as("running_revenue"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("running_revenue"))
    }
    private val tieBreakSql = tieBreak.mkString(", ")
    val oracle = Some(
      s"""SELECT l_suppkey, l_orderkey, l_linenumber,
         |       CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6)))
         |            OVER (PARTITION BY l_suppkey
         |                  ORDER BY $tieBreakSql
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |            AS DOUBLE) AS running_revenue
         |FROM lineitem
         |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_revenue""".stripMargin)
  }

  /** GLOBAL exact running total WITHOUT a global window: the naive
    * `sum() OVER (ORDER BY key)` with no partition moves every row to one
    * partition — the formulation that dies first at 100 TB. This operator
    * computes the identical result with the distributed two-phase prefix
    * sum (the `q_pps_sample` decomposition applied to decimal money):
    * per-bucket decimal sums → exclusive offsets via a window over the
    * BUCKET frame (rows = table/B — the one deliberately-tiny
    * single-partition spot) → within-bucket windows under
    * HashPartitioning(bkt). The oracle IS the naive global cumsum, so the
    * green hash proves the decomposition exact — decimal addition is
    * associative, which is the whole trick.
    */
  object RunningTotalDist extends GraftQuery {
    val name = "q_running_total_dist"
    private val B = 10000L // orders per prefix-sum bucket
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val bOff = o.groupBy(expr(s"o_orderkey div $B").as("bkt"))
        .agg(sum(graft.plans.DecimalExpressions.double_to_decimal6(col("o_totalprice"))).as("bw"))
        // bucket-offset frame: n/B rows, single-partition by design
        .withColumn("b_off",
          coalesce(sum(col("bw")).over(
            Window.partitionBy(Dist.boundedOne(col("bkt"))).orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0).cast(DecimalType(27, 6))))
        .select("bkt", "b_off")
      val inB = Window.partitionBy("bkt").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.withColumn("bkt", expr(s"o_orderkey div $B"))
        .join(broadcast(bOff), "bkt")
        .select(col("o_orderkey"), col("o_totalprice"),
          (col("b_off") +
            sum(graft.plans.DecimalExpressions.double_to_decimal6(col("o_totalprice"))).over(inB))
            .cast("double").as("running_total"))
        .orderBy("o_orderkey")
    }
    val oracle = Some(
      """SELECT o_orderkey, o_totalprice,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(27,6)))
        |            OVER (ORDER BY o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_orderkey""".stripMargin)
  }

  /** Ranking window — top-3 orders per customer by price. */
  object TopNPerGroup extends GraftQuery {
    val name = "q_topn_per_group"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    }
    val oracle = Some(
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin)
  }

  /** Tumbling event-time window — the batch shape of the Structured
    * Streaming aggregation in [[graft.streaming.EventStream]]; hourly
    * count + exact sum per event type. Window start emitted as a formatted
    * UTC string so both engines hash the same value.
    */
  object TumblingWindow extends GraftQuery {
    val name = "q_tumbling_window"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "events")
        .groupBy(
          window(Graft.tsFromNanos("ts"), "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("win_start", "event_type")
    val oracle = Some(
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Hopping (sliding) window aggregate — 6-hour windows advancing every
    * 3 hours, so each event lands in exactly size/slide = 2 windows. Spark's
    * `window(ts, size, slide)` plans this as a generator (one output row per
    * covering window) feeding a plain hash aggregate: the fan-out factor is
    * the constant size/slide, NOT data-dependent, and the shuffle key stays
    * (window_start, event_type) — small-key, map-side combinable, the same
    * scale shape as the tumbling twin. The oracle replays the window set
    * arithmetically: the covering starts of epoch-second e are
    * `(e div slide - j) * slide` for j in [0, size/slide).
    */
  object HoppingWindow extends GraftQuery {
    val name = "q_hopping_window"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "events")
        .groupBy(
          window(Graft.tsFromNanos("ts"), "6 hours", "3 hours").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("win_start", "event_type")
    val oracle = Some(
      """WITH ev AS (
        |  SELECT epoch_ns(ts) // 1000000000 AS sec, event_type, value
        |  FROM events),
        |hop AS (
        |  SELECT ((sec // 10800) - j) * 10800 AS start_sec, event_type, value
        |  FROM ev CROSS JOIN (SELECT unnest([0, 1]) AS j))
        |SELECT strftime(make_timestamp(start_sec * 1000000),
        |                '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
        |FROM hop GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Trailing 7-day revenue — a RANGE frame (value-based window bounds,
    * the family the row-frame queries don't cover): per calendar day, the
    * sum over days [d−6, d]. The range window runs over the DAILY
    * AGGREGATE, whose size is bounded by the calendar, not the fact
    * table — the fact-table shuffle is the plain (day)-keyed hash
    * aggregate; the single-partition window after it touches ~2.4k rows
    * regardless of scale (partition by year — or supplier, region, any
    * dimension — to parallelize if the day domain ever grows). Integer
    * epoch days + decimal daily sums keep both engines bit-identical.
    */
  object Rolling7d extends GraftQuery {
    val name = "q_rolling_7d"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val daily = Graft.table(spark, sfDir, "orders")
        .select(
          datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1970-01-01")))
            .as("day"),
          col("o_totalprice"))
        .groupBy("day")
        .agg(sum(graft.plans.DecimalExpressions.double_to_decimal6(col("o_totalprice"))).as("rev"))
      // day-bucket frame (time-span bounded), single-partition by design
      val w = Window.partitionBy(Dist.boundedOne(col("day"))).orderBy("day").rangeBetween(-6, 0)
      daily.select(col("day"), col("rev").cast("double").as("day_rev"),
          sum(col("rev")).over(w).cast("double").as("rev_7d"))
        .orderBy("day")
    }
    val oracle = Some(
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
        |         sum(CAST(o_totalprice AS DECIMAL(27,6))) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT day, CAST(rev AS DOUBLE) AS day_rev,
        |       CAST(sum(rev) OVER (ORDER BY day
        |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS rev_7d
        |FROM daily ORDER BY day""".stripMargin)
  }

  /** Analytic-function pack — lead, ntile, first_value over one totally
    * ordered per-customer window (the ranking/navigation family beyond
    * row_number/lag used elsewhere). Bounded to 3 customers' order
    * histories so the full row set stays verifiable.
    */
  object WindowPack extends GraftQuery {
    val name = "q_window_pack"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders")
        .filter(col("o_custkey") < 3)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      o.select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
          date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd").as("next_d"),
          ntile(4).over(w).as("quartile"),
          first(col("o_totalprice")).over(w).as("first_price"))
        .orderBy("o_custkey", "o_orderkey")
    }
    val oracle = Some(
      """SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS d,
        |       strftime(lead(o_orderdate, 1) OVER w, '%Y-%m-%d') AS next_d,
        |       CAST(ntile(4) OVER w AS INT) AS quartile,
        |       first_value(o_totalprice) OVER w AS first_price
        |FROM orders WHERE o_custkey < 3
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  /** Relative-standing ranks: `percent_rank` and `cume_dist` of every
    * part's price within its brand. Both are pure rank arithmetic —
    * (rank−1)/(n−1) and rank_with_ties/n — single IEEE divisions of exact
    * integers, so ties and values hash-match the oracle exactly. One
    * brand-keyed sort-shuffle; the output is row-per-input (the
    * feature-engineering shape: rank features joined back to the entity),
    * not an aggregate.
    */
  object PercentileRank extends GraftQuery {
    val name = "q_percentile_rank"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").asc)
      Graft.table(spark, sfDir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("p_brand", "p_partkey")
    }
    val oracle = Some(
      """SELECT p_brand, p_partkey, p_retailprice,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice ASC)
        |ORDER BY p_brand, p_partkey""".stripMargin)
  }

  /** OHLC resampling — the time-series downsample every monitoring and
    * finance pipeline runs: per event type and 6-hour bar, the opening,
    * highest, lowest and closing value. Open/close are decided by a
    * total order ((sec, event_id) — unique), expressed as a single
    * `min(struct(...))`/`max(struct(...))` inside the SAME hash aggregate
    * as the extremes: structs order lexicographically, so the aggregate
    * state is one struct per bound and the whole op is one
    * map-side-combinable pass — no rank window over the fact, no second
    * scan. Cents integers end-to-end; the streaming twin is
    * [[graft.streaming.EventStream.ohlcBars]].
    */
  object OhlcBars extends GraftQuery {
    val name = "q_ohlc_bars"
    private val BarSec = 21600L // 6-hour bars
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"),
          expr("ts div 1000000000").as("sec"),
          graft.plans.DecimalExpressions.money_cents(col("value")).as("cents"))
        .withColumn("bar_start", expr(s"(sec div $BarSec) * $BarSec"))
      ev.groupBy("event_type", "bar_start")
        .agg(
          min(struct(col("sec"), col("event_id"), col("cents"))).as("o"),
          max(col("cents")).as("high"),
          min(col("cents")).as("low"),
          max(struct(col("sec"), col("event_id"), col("cents"))).as("c"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("bar_start"),
          col("o.cents").as("open"), col("high"), col("low"),
          col("c.cents").as("close"), col("n"))
        .orderBy("event_type", "bar_start")
    }
    val oracle = Some(
      s"""WITH ev AS (
         |  SELECT event_type, event_id,
         |         epoch_ns(ts) // 1000000000 AS sec,
         |         CAST(round(value * 100) AS BIGINT) AS cents,
         |         (epoch_ns(ts) // 1000000000 // $BarSec) * $BarSec AS bar_start
         |  FROM events),
         |ranked AS (
         |  SELECT *,
         |         row_number() OVER (PARTITION BY event_type, bar_start
         |                            ORDER BY sec ASC, event_id ASC) AS ra,
         |         row_number() OVER (PARTITION BY event_type, bar_start
         |                            ORDER BY sec DESC, event_id DESC) AS rd
         |  FROM ev)
         |SELECT event_type, bar_start,
         |       min(CASE WHEN ra = 1 THEN cents END) AS open,
         |       max(cents) AS high, min(cents) AS low,
         |       min(CASE WHEN rd = 1 THEN cents END) AS close,
         |       count(*) AS n
         |FROM ranked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Dense-rank top-k WITH ties — the rank semantic [[TopNPerGroup]]'s
    * row_number deliberately avoids: the top 3 revenue DAYS per event
    * type, where every day tied on a kept rank is kept (dense_rank has
    * no tie-break, so equal revenues share a rank and all emit). The
    * output is a complete, deterministic set without inventing an order
    * among ties — the correct semantic for leaderboards where dropping a
    * tied row is a lie. Days frame first, so the rank window is tiny.
    */
  object DenseTopK extends GraftQuery {
    val name = "q_dense_topk"
    private val K = 3
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val daily = Graft.table(spark, sfDir, "events")
        .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
        .agg(sum(graft.plans.DecimalExpressions.money_cents(col("value"))).as("rev"))
      daily
        .withColumn("rk", dense_rank().over(
          Window.partitionBy("event_type").orderBy(col("rev").desc)))
        .filter(col("rk") <= K)
        .select(col("event_type"), col("rk").cast("int").as("rk"), col("day"),
          col("rev"))
        .orderBy("event_type", "rk", "day")
    }
    val oracle = Some(
      s"""WITH daily AS (
         |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
         |  FROM events GROUP BY 1, 2)
         |SELECT event_type, CAST(rk AS INT) AS rk, day, rev FROM (
         |  SELECT *, dense_rank() OVER (PARTITION BY event_type
         |                               ORDER BY rev DESC) AS rk
         |  FROM daily)
         |WHERE rk <= $K ORDER BY event_type, rk, day""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(RunningSum, RunningTotalDist, TopNPerGroup, TumblingWindow,
      HoppingWindow, Rolling7d, WindowPack, PercentileRank, OhlcBars,
      DenseTopK)
}
