package graft.operators

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical inference & time-series diagnostics: OLS regression, serial
  * autocorrelation, and the two-sample Kolmogorov–Smirnov test — the
  * model-fitting / drift-testing tier above [[StatOps]]' descriptive moments
  * (none of which the reference's image-stats pipeline has, SURVEY §2.9).
  *
  * Numeric stance (same as [[StatOps.Correlation]]): every sufficient
  * statistic is an exact integer sum (BIGINT, or DECIMAL(38,0) where a
  * square-sum can pass 2^63) — order-independent through every shuffle —
  * and the closed-form expression over them is a FIXED double tree,
  * identically associated in both engines, so results are bit-exact.
  */
object InferenceOps {

  /** Ordinary-least-squares fit of line revenue on quantity, per return
    * flag: slope / intercept / R² from the six moment sums in ONE
    * map-side-combinable aggregate (a shuffle of 7 numbers per group —
    * the same cost as a count at any scale).
    *
    * Overflow budget: x = quantity ∈ [1,50] and y = price cents < 2^24 keep
    * Σxy under 2^63 beyond sf100, but Σy² reaches ~6·10^19 already at
    * sf0.1 — that one sum runs as DECIMAL(38,0) (per-row y·y is still a
    * safe BIGINT; only the accumulation widens). DuckDB's BIGINT sum
    * auto-widens to HUGEINT, so both engines carry the exact value and the
    * final correctly-rounded cast to double agrees bit-for-bit.
    */
  object LinReg extends GraftQuery {
    val name = "q_linreg"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          graft.plans.DecimalExpressions.money_cents(col("l_extendedprice")).as("y"))
      val m = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum((col("y") * col("y")).cast(DecimalType(38, 0))).as("syy"))
      val nd = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val covN = nd * d("sxy") - d("sx") * d("sy") // n·cov, shared subtree
      val varXN = nd * d("sxx") - d("sx") * d("sx") // n·var(x)
      val varYN = nd * d("syy") - d("sy") * d("sy")
      val slope = covN / varXN
      m.select(col("l_returnflag"), col("n"),
          slope.as("slope"),
          ((d("sy") - slope * d("sx")) / nd).as("intercept"),
          ((covN * covN) / (varXN * varYN)).as("r2"))
        .orderBy("l_returnflag")
    }
    val oracle = Some(
      """WITH li AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         sum(y * y) AS syy
        |  FROM li GROUP BY 1),
        |f AS (
        |  SELECT l_returnflag, n,
        |         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
        |         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
        |         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn,
        |         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM m)
        |SELECT l_returnflag, n,
        |       covn / varxn AS slope,
        |       (syd - (covn / varxn) * sxd) / CAST(n AS DOUBLE) AS intercept,
        |       (covn * covn) / (varxn * varyn) AS r2
        |FROM f ORDER BY l_returnflag""".stripMargin)
  }

  /** Serial autocorrelation of the daily event-count series at lags 1 and
    * 7 (day-over-day persistence and weekly seasonality) — the
    * model-selection companion to [[StatOps.EventSpike]]'s alarm and
    * [[BehaviorOps]]' burstiness. The series is first reduced to one row
    * per day (a count aggregate — the only pass over the fact), so the
    * lag self-joins and moment sums run on a DAYS-sized frame: persisting
    * it costs nothing and stops the two lag branches re-scanning events.
    * Pearson r over (c_d, c_{d+lag}) pairs from exact BIGINT moments.
    */
  object Autocorr extends GraftQuery {
    val name = "q_autocorr"
    private val Lags = Seq(1L, 7L)
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val daily = Graft.table(spark, sfDir, "events")
        .groupBy(expr("ts div 1000000000 div 86400").as("day"))
        .agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = Lags.map { lag =>
        daily.as("a").join(daily.as("b"), col("b.day") === col("a.day") + lag)
          .select(lit(lag).as("lag"), col("a.c").as("x"), col("b.c").as("y"))
      }.reduce(_.unionAll(_))
      val m = pairs.groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      val nd = col("n_pairs").cast("double")
      def d(c: String) = col(c).cast("double")
      m.select(col("lag"), col("n_pairs"),
          ((nd * d("sxy") - d("sx") * d("sy")) /
            (sqrt(nd * d("sxx") - d("sx") * d("sx")) *
              sqrt(nd * d("syy") - d("sy") * d("sy")))).as("autocorr_r"))
        .orderBy("lag")
    }
    val oracle = Some(
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 1000000000 // 86400 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |pairs AS (
        |  SELECT v.lag, a.c AS x, b.c AS y
        |  FROM (VALUES (1), (7)) v(lag)
        |  JOIN daily a ON true
        |  JOIN daily b ON b.day = a.day + v.lag),
        |m AS (
        |  SELECT lag, count(*) AS n_pairs,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pairs GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
        |       (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
        |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |          * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |         AS autocorr_r
        |FROM m ORDER BY lag""".stripMargin)
  }

  /** Two-sample Kolmogorov–Smirnov test on the order-price distribution
    * between the two halves of the portable md5 key split — the
    * CONTINUOUS-distribution drift test beside `q_dist_drift`'s
    * categorical chi-square. D = max over distinct values of
    * |F_A(v) − F_B(v)|, decided entirely in integers:
    * |cumA·nB − cumB·nA| with ONE final division.
    *
    * Scale shape: prices collapse to one row per DISTINCT cent value
    * (map-side combinable), and the ECDFs come from the two-phase
    * distributed prefix sum of [[WindowOps.RunningTotalDist]] — per-bucket
    * count sums, exclusive offsets over the BUCKET frame (the one
    * deliberately-tiny single-partition spot), within-bucket windows under
    * HashPartitioning. No corpus-sized global window anywhere; the oracle
    * IS the naive global cumsum, so the green hash proves the
    * decomposition exact. The 1-row group totals broadcast back.
    * reject_05 applies the large-sample α=0.05 critical value
    * 1.358·sqrt((nA+nB)/(nA·nB)) as a fixed double tree.
    */
  object KsTest extends GraftQuery {
    val name = "q_ks_test"
    private val VB = 1000000L // cents per ECDF prefix-sum bucket ($10k)
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val t = Graft.table(spark, sfDir, "orders")
        .select(graft.plans.DecimalExpressions.money_cents(col("o_totalprice")).as("v"),
          when(pmod(pHash60(col("o_orderkey").cast("string")), lit(2L)) === 0L,
            1L).otherwise(0L).as("g1"))
      val perVal = t.groupBy("v")
        .agg(sum(col("g1")).as("c1"), sum(lit(1L) - col("g1")).as("c2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bOff = perVal.groupBy(expr(s"v div $VB").as("bkt"))
        .agg(sum(col("c1")).as("b1"), sum(col("c2")).as("b2"))
        // value-bucket offset frame: |values|/VB rows, single-partition by
        // design (lit(0) marks the audited bound)
        .select(col("bkt"),
          coalesce(sum(col("b1")).over(
            Window.partitionBy(Dist.boundedOne(col("bkt"))).orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)).as("off1"),
          coalesce(sum(col("b2")).over(
            Window.partitionBy(Dist.boundedOne(col("bkt"))).orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)).as("off2"))
      val inB = Window.partitionBy("bkt").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = perVal.withColumn("bkt", expr(s"v div $VB"))
        .join(broadcast(bOff), "bkt")
        .select(col("v"),
          (col("off1") + sum(col("c1")).over(inB)).as("cum1"),
          (col("off2") + sum(col("c2")).over(inB)).as("cum2"))
      val tot = perVal.agg(sum(col("c1")).as("n_a"), sum(col("c2")).as("n_b"))
      val d = cum.crossJoin(broadcast(tot))
        .agg(max(abs(col("cum1") * col("n_b") - col("cum2") * col("n_a")))
          .as("dnum"))
      val nad = col("n_a").cast("double")
      val nbd = col("n_b").cast("double")
      val dStat = col("dnum").cast("double") / (nad * nbd)
      d.crossJoin(broadcast(tot))
        .select(col("n_a"), col("n_b"), dStat.as("d_stat"),
          when(dStat > lit(1.358) * sqrt((nad + nbd) / (nad * nbd)), 1)
            .otherwise(0).as("reject_05"))
    }
    val oracle = Some(
      """WITH t AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |         CASE WHEN ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
        |              THEN 1 ELSE 0 END AS g1
        |  FROM orders),
        |perval AS (
        |  SELECT v, CAST(sum(g1) AS BIGINT) AS c1,
        |         CAST(sum(1 - g1) AS BIGINT) AS c2
        |  FROM t GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |         CAST(sum(c1) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        |         CAST(sum(c2) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
        |  FROM perval),
        |tot AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n_a,
        |         CAST(sum(c2) AS BIGINT) AS n_b FROM perval),
        |d AS (
        |  SELECT CAST(max(abs(cum1 * n_b - cum2 * n_a)) AS BIGINT) AS dnum
        |  FROM cum CROSS JOIN tot)
        |SELECT n_a, n_b,
        |       CAST(dnum AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d_stat,
        |       CASE WHEN CAST(dnum AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |                 > 1.358 * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |                                / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
        |            THEN 1 ELSE 0 END AS reject_05
        |FROM d CROSS JOIN tot""".stripMargin)
  }

  /** Maximum drawdown of the cumulative daily purchase-revenue series —
    * the worst peak-to-trough fall, the risk statistic that summarizes a
    * monotone-hoped curve in one number. Like [[Autocorr]], the fact
    * reduces to a DAYS-sized frame first (one aggregate pass); cumulative
    * sum, running max and the argmax of the gap are windows over that tiny
    * frame. The trough day of the MAXIMUM drawdown is picked by struct
    * ordering (dd desc, day asc) in a single aggregate — deterministic
    * under ties. Cents integers end-to-end.
    */
  object Drawdown extends GraftQuery {
    val name = "q_drawdown"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val daily = Graft.table(spark, sfDir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(expr("ts div 86400000000000").as("day"))
        .agg(sum(graft.plans.DecimalExpressions.money_cents(col("value"))).as("rev"))
      // day-bucket frame (corpus time span in days), single-partition by
      // design — lit(0) marks the audited bound
      val cumW = Window.partitionBy(Dist.boundedOne(col("day"))).orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = daily
        .withColumn("cum", sum(col("rev")).over(cumW))
        .withColumn("peak", max(col("cum")).over(cumW))
        .withColumn("dd", col("peak") - col("cum"))
      dd.agg(max(struct(col("dd"), (-col("day")).as("negday"))).as("m"),
          count(lit(1)).as("n_days"))
        .select(col("n_days"), col("m.dd").as("max_drawdown_cents"),
          (-col("m.negday")).as("trough_day"))
    }
    val oracle = Some(
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |curve AS (
        |  SELECT day,
        |         CAST(max(sum_cum) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           - sum_cum AS dd
        |  FROM (SELECT day,
        |               CAST(sum(rev) OVER (ORDER BY day
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |                 AS sum_cum
        |        FROM daily))
        |SELECT count(*) AS n_days,
        |       max(dd) AS max_drawdown_cents,
        |       min(CASE WHEN dd = (SELECT max(dd) FROM curve) THEN day END)
        |         AS trough_day
        |FROM curve""".stripMargin)
  }

  /** Bootstrap confidence interval for the mean purchase value — the
    * resampling machinery done scale-right: the Poissonized bootstrap
    * (each row enters replica r with weight k ~ Poisson(1), the standard
    * large-n approximation of multinomial resampling) with weights drawn
    * DETERMINISTICALLY from the portable 28-bit hash of (replica, event):
    * k is the bucket of u·2²⁸ under the fixed integer CDF thresholds
    * below, so both engines draw the identical resample. One scan with a
    * constant B-fold fan-out into B weighted-moment sums (map-side
    * combinable — the shuffle carries B rows), means as single divisions,
    * and the CI as positional order statistics over the B-row frame.
    */
  object BootstrapCi extends GraftQuery {
    val name = "q_bootstrap_ci"
    private val B = 32
    // floor(cdf(k) * 2^28) for Poisson(1), k = 0..5 (tail collapses to 6)
    private val Cdf = Seq(98751885L, 197503771L, 246879713L, 263338361L,
      267453023L, 268275955L)
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash28
      val ev = Graft.table(spark, sfDir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          graft.plans.DecimalExpressions.money_cents(col("value")).as("cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val point = ev.agg(
        (sum(col("cents")).cast("double") / count(lit(1)).cast("double"))
          .as("point_mean"))
      val reps = ev
        .select(col("event_id"), col("cents"),
          explode(array((0 until B).map(lit): _*)).as("r"))
        .withColumn("u", pHash28(concat(col("r").cast("string"), lit(":"),
          col("event_id").cast("string"))))
        .withColumn("w",
          Cdf.zipWithIndex.foldRight(lit(Cdf.length): Column) {
            case ((thr, k), els) => when(col("u") < thr, k).otherwise(els)
          }.cast("long"))
      val means = reps.groupBy("r")
        .agg((sum(col("w") * col("cents")).cast("double") /
          sum(col("w")).cast("double")).as("mean_r"))
      // replica-means frame: exactly B rows — single-partition by design
      val ranked = means.select(col("mean_r"),
        row_number().over(Window.partitionBy(Dist.boundedOne(col("r")))
          .orderBy(col("mean_r").asc)).as("rk"))
      ranked.agg(
          min(when(col("rk") === math.ceil(0.05 * B).toInt, col("mean_r")))
            .as("ci_lo"),
          min(when(col("rk") === math.ceil(0.95 * B).toInt, col("mean_r")))
            .as("ci_hi"),
          count(lit(1)).as("n_replicas"))
        .crossJoin(broadcast(point))
        .select(col("point_mean"), col("ci_lo"), col("ci_hi"), col("n_replicas"))
    }
    val oracle = Some {
      val caseArms = Cdf.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ")
      s"""WITH ev AS (
         |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |point AS (
         |  SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |           AS point_mean FROM ev),
         |reps AS (
         |  SELECT r.r, cents,
         |         ('0x' || substr(md5(r.r::VARCHAR || ':' || event_id::VARCHAR), 1, 7))::BIGINT AS u
         |  FROM ev CROSS JOIN (SELECT unnest(range($B)) AS r) r),
         |weighted AS (
         |  SELECT r, cents,
         |         CAST(CASE $caseArms ELSE ${Cdf.length} END AS BIGINT) AS w
         |  FROM reps),
         |means AS (
         |  SELECT r, CAST(sum(w * cents) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
         |           AS mean_r
         |  FROM weighted GROUP BY 1),
         |ranked AS (
         |  SELECT mean_r, row_number() OVER (ORDER BY mean_r ASC) AS rk
         |  FROM means)
         |SELECT point_mean,
         |       min(CASE WHEN rk = ${math.ceil(0.05 * B).toInt} THEN mean_r END) AS ci_lo,
         |       min(CASE WHEN rk = ${math.ceil(0.95 * B).toInt} THEN mean_r END) AS ci_hi,
         |       count(*) AS n_replicas
         |FROM ranked CROSS JOIN point
         |GROUP BY point_mean""".stripMargin
    }
  }

  /** Rolling 7-day median of daily revenue — the robust trend line
    * (medians shrug off the spike days that wreck a rolling mean). Same
    * frame discipline as [[Drawdown]]: the fact collapses to days first;
    * then each day fans out to the ≤7 future windows it participates in
    * (the constant-fan-out trick of `q_active_users` — a rolling rank
    * window would re-sort per row; this is one explode + one positional
    * pick per window), and the per-window median is the positional rule
    * over ≤7 values. Integer cents; only days with a FULL 7-day history
    * emit.
    */
  object RollingMedian extends GraftQuery {
    val name = "q_rolling_median"
    private val W = 7
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val daily = Graft.table(spark, sfDir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(expr("ts div 86400000000000").as("day"))
        .agg(sum(graft.plans.DecimalExpressions.money_cents(col("value"))).as("rev"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val fanned = daily
        .select(col("rev"), explode(sequence(col("day"),
          col("day") + (W - 1))).as("win_end"))
      val ranked = fanned
        .withColumn("rn", row_number().over(Window.partitionBy("win_end")
          .orderBy(col("rev").asc)))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("win_end")))
      ranked
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .crossJoin(broadcast(span))
        // full windows only: the first W-1 days and fabricated future ends drop
        .filter(col("win_end") >= col("d0") + (W - 1) &&
          col("win_end") <= col("d1"))
        .select(col("win_end").as("day"), col("cnt").as("n_days"),
          col("rev").as("rolling_median_cents"))
        .orderBy("day")
    }
    val oracle = Some(
      s"""WITH daily AS (
         |  SELECT epoch_ns(ts) // 86400000000000 AS day,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         |fanned AS (
         |  SELECT rev, day + o AS win_end
         |  FROM daily, LATERAL (SELECT unnest(range($W)) AS o) g),
         |ranked AS (
         |  SELECT win_end, rev,
         |         row_number() OVER (PARTITION BY win_end ORDER BY rev ASC) AS rn,
         |         count(*) OVER (PARTITION BY win_end) AS cnt
         |  FROM fanned)
         |SELECT win_end AS day, cnt AS n_days, rev AS rolling_median_cents
         |FROM ranked CROSS JOIN span
         |WHERE rn = (cnt + 1) // 2 AND win_end >= d0 + ${W - 1} AND win_end <= d1
         |ORDER BY day""".stripMargin)
  }

  /** Pairwise correlation matrix of the lineitem numeric columns —
    * the profiling step before any feature selection, generalizing
    * [[graft.operators.StatOps.Correlation]]'s single pair to all 6 pairs
    * of 4 columns in ONE aggregate: every Σx, Σx² and Σxy moment rides
    * the same map-side-combinable pass (14 sums total), and each pair's r
    * is the usual fixed double tree. Cents/units are lossless integer
    * encodings; the two square sums that can pass 2^63 run as
    * DECIMAL(38,0).
    */
  object CorrMatrix extends GraftQuery {
    val name = "q_corr_matrix"
    private val Cols = Seq("qty", "price", "disc", "tax")
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      val li = Graft.table(spark, sfDir, "lineitem")
        .select(col("l_quantity").cast("long").as("qty"),
          graft.plans.DecimalExpressions.money_cents(col("l_extendedprice")).as("price"),
          graft.plans.DecimalExpressions.money_cents(col("l_discount")).as("disc"),
          graft.plans.DecimalExpressions.money_cents(col("l_tax")).as("tax"))
      def wide(c: String) = c == "price" // the only column whose squares wrap
      def mom(c: String) =
        if (wide(c)) sum((col(c) * col(c)).cast(DecimalType(38, 0))).as(s"s_${c}_$c")
        else sum(col(c) * col(c)).as(s"s_${c}_$c")
      def cross(a: String, b: String) =
        if (wide(a) || wide(b))
          sum((col(a) * col(b)).cast(DecimalType(38, 0))).as(s"s_${a}_$b")
        else sum(col(a) * col(b)).as(s"s_${a}_$b")
      val pairs = for {
        i <- Cols.indices; j <- Cols.indices if i < j
      } yield (Cols(i), Cols(j))
      val aggs = Seq(count(lit(1)).as("n")) ++
        Cols.map(c => sum(col(c)).as(s"s_$c")) ++
        Cols.map(mom) ++ pairs.map { case (a, b) => cross(a, b) }
      val m = li.agg(aggs.head, aggs.tail: _*)
      val nd = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val rows = pairs.map { case (a, b) =>
        val varA = nd * d(s"s_${a}_$a") - d(s"s_$a") * d(s"s_$a")
        val varB = nd * d(s"s_${b}_$b") - d(s"s_$b") * d(s"s_$b")
        // zero-variance columns have no defined correlation: NULL, not a
        // divide-by-zero (ANSI) or NaN (IEEE) — and the guard compares the
        // same doubles both engines compute
        struct(lit(a).as("col_a"), lit(b).as("col_b"),
          when(varA > 0 && varB > 0,
            (nd * d(s"s_${a}_$b") - d(s"s_$a") * d(s"s_$b")) /
              (sqrt(varA) * sqrt(varB))).as("pearson_r"))
      }
      m.select(explode(array(rows: _*)).as("p"))
        .select(col("p.col_a"), col("p.col_b"), col("p.pearson_r"))
        .orderBy("col_a", "col_b")
    }
    val oracle = Some {
      val pairs = for {
        i <- Cols.indices; j <- Cols.indices if i < j
      } yield (Cols(i), Cols(j))
      val arms = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           |  CASE WHEN (CAST(n AS DOUBLE) * CAST(s_${a}_$a AS DOUBLE)
           |             - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)) > 0
           |        AND (CAST(n AS DOUBLE) * CAST(s_${b}_$b AS DOUBLE)
           |             - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)) > 0
           |       THEN (CAST(n AS DOUBLE) * CAST(s_${a}_$b AS DOUBLE)
           |             - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
           |            / (sqrt(CAST(n AS DOUBLE) * CAST(s_${a}_$a AS DOUBLE)
           |                    - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
           |               * sqrt(CAST(n AS DOUBLE) * CAST(s_${b}_$b AS DOUBLE)
           |                      - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))
           |       END AS pearson_r
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH li AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS qty,
         |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
         |         CAST(round(l_discount * 100) AS BIGINT) AS disc,
         |         CAST(round(l_tax * 100) AS BIGINT) AS tax
         |  FROM lineitem),
         |m AS (
         |  SELECT count(*) AS n,
         |         ${Cols.map(c => s"CAST(sum($c) AS BIGINT) AS s_$c").mkString(", ")},
         |         ${Cols.map(c => s"sum($c * $c) AS s_${c}_$c").mkString(", ")},
         |         ${pairs.map { case (a, b) => s"sum($a * $b) AS s_${a}_$b" }.mkString(", ")}
         |  FROM li)
         |SELECT col_a, col_b, pearson_r FROM (
         |$arms)
         |ORDER BY col_a, col_b""".stripMargin
    }
  }

  val all: Seq[GraftQuery] = Seq(LinReg, Autocorr, KsTest, Drawdown,
    BootstrapCi, RollingMedian, CorrMatrix)
}
