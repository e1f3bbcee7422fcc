package graft.operators

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream — the funnel / cohort
  * retention family every product-analytics engine ships and the reference
  * (an image-stats pipeline, SURVEY §2.9) lacks entirely.
  *
  * Both operators run on integer epoch math (`ts div 1e9` seconds,
  * `div 86400` days) so every comparison and bucket is bit-identical to the
  * DuckDB oracle. Both cost one scan plus user-keyed shuffles: the funnel
  * is one sort-shuffle feeding chained running-min windows, retention is a
  * distinct plus a per-user min window — no joins, no driver-side state.
  */
object BehaviorOps {

  /** Ordered conversion funnel view → click → purchase. A user counts for a
    * stage only if the stage event happens STRICTLY AFTER their entry into
    * the previous stage and within the conversion window (min-timestamp
    * semantics, the standard "ordered windowed funnel").
    *
    * Single-pass formulation: ONE scan of events, ONE sort-shuffle on
    * `user_id`, three CHAINED conditional running-mins over the same window
    * frame (Spark plans them as one sort + stacked Window operators) —
    * versus the naive per-stage filter-aggregate-join chain, which scans
    * the event table twice per stage. Equivalence: the prefix-min of
    * qualifying stage-k times at any row equals the global min whenever it
    * can affect the strict `sec > prev` comparison (a prefix min only
    * shrinks toward the global min, and rows before the global min fail
    * the strict inequality anyway).
    */
  object Funnel extends GraftQuery {
    val name = "q_funnel"
    private[operators] val WindowSec = 86400L // 24h stage-to-stage window

    /** The per-user stage frame (user_id, v_sec, c_sec, p_sec) — factored
      * so variant cuts ([[FunnelVariant]]) reuse the exact same funnel
      * semantics and plan (one scan, one user sort, chained prefix-mins).
      */
    private[operators] def perUserStages(spark: SparkSession,
        sfDir: String): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000000").as("sec"))
      val staged = ev
        .withColumn("fv",
          min(when(col("event_type") === "view", col("sec"))).over(w))
        .withColumn("qc",
          min(when(col("event_type") === "click" && col("fv").isNotNull &&
            col("sec") > col("fv") && col("sec") <= col("fv") + WindowSec,
            col("sec"))).over(w))
        .withColumn("qp",
          min(when(col("event_type") === "purchase" && col("qc").isNotNull &&
            col("sec") > col("qc") && col("sec") <= col("qc") + WindowSec,
            col("sec"))).over(w))
      staged.groupBy("user_id")
        .agg(min(col("fv")).as("v_sec"), min(col("qc")).as("c_sec"),
          min(col("qp")).as("p_sec"))
    }

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val perUser = perUserStages(spark, sfDir)
      perUser
        .agg(count(col("v_sec")).as("nv"), count(col("c_sec")).as("nc"),
          count(col("p_sec")).as("np"))
        .selectExpr("stack(3, 1, 'view', nv, 2, 'click', nc, " +
          "3, 'purchase', np) AS (stage_ord, stage, n_users)")
        .select(col("stage_ord").cast("int"), col("stage"), col("n_users"))
        .orderBy("stage_ord")
    }
    val oracle = Some(
      s"""WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |staged AS (
        |  SELECT user_id, event_id, event_type, sec,
        |         min(CASE WHEN event_type = 'view' THEN sec END) OVER w AS fv
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |staged2 AS (
        |  SELECT user_id, event_id, event_type, sec, fv,
        |         min(CASE WHEN event_type = 'click' AND fv IS NOT NULL
        |                       AND sec > fv AND sec <= fv + $WindowSec
        |                  THEN sec END) OVER w AS qc
        |  FROM staged
        |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |staged3 AS (
        |  SELECT user_id, fv, qc,
        |         min(CASE WHEN event_type = 'purchase' AND qc IS NOT NULL
        |                       AND sec > qc AND sec <= qc + $WindowSec
        |                  THEN sec END) OVER w AS qp
        |  FROM staged2
        |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |per_user AS (
        |  SELECT user_id, min(fv) AS v_sec, min(qc) AS c_sec, min(qp) AS p_sec
        |  FROM staged3 GROUP BY 1),
        |counts AS (
        |  SELECT count(v_sec) AS nv, count(c_sec) AS nc, count(p_sec) AS np
        |  FROM per_user)
        |SELECT CAST(1 AS INT) AS stage_ord, 'view' AS stage, nv AS n_users FROM counts
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', nc FROM counts
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', np FROM counts
        |ORDER BY stage_ord""".stripMargin)
  }

  /** Cohort retention: users grouped by first-activity day (the cohort),
    * counted as retained on each later day they were active, out to 7 days.
    * Day buckets are integer epoch days, so cohort and offset are exact in
    * both engines. Plan shape: ONE scan and ONE user-keyed data shuffle —
    * the per-user distinct-day set is a `collect_set` aggregate (map-side
    * combinable; its state is bounded by the retention horizon's day
    * count, not by event volume), the cohort day is `array_min` of that
    * set, and the explode back to (cohort, offset) rows feeds the final
    * small-key hash aggregate. A (user, day)-distinct + per-user window
    * formulation costs a second exchange — HashPartitioning(user, day)
    * does not satisfy the window's user-only clustering.
    */
  object Retention extends GraftQuery {
    val name = "q_retention"
    private val MaxOffset = 7
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      Graft.table(spark, sfDir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .groupBy("user_id").agg(collect_set(col("day")).as("days"))
        .select(array_min(col("days")).as("cohort_day"),
          explode(col("days")).as("day"))
        .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .filter(col("day_offset") <= MaxOffset)
        .groupBy("cohort_day", "day_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }
    val oracle = Some(
      s"""WITH active AS (
         |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
         |  FROM events),
         |w AS (
         |  SELECT day, min(day) OVER (PARTITION BY user_id) AS cohort_day
         |  FROM active)
         |SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
         |FROM w
         |WHERE day - cohort_day <= $MaxOffset
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** SCD-2 interval build: collapse each user's event stream into versioned
    * validity intervals of their current event_type — the
    * slowly-changing-dimension shape every warehouse load pipeline emits
    * (state, valid_from, valid_to, open row has NULL valid_to).
    *
    * Plan shape: ONE sort-shuffle on `user_id` serves all three window
    * passes — `lag` to drop consecutive duplicates, then `row_number` +
    * `lead` over the filtered rows (a filter preserves the child's
    * distribution and sort order, so Catalyst plans no second exchange or
    * sort). Integer epoch seconds keep every boundary bit-identical to the
    * oracle.
    */
  object Scd2 extends GraftQuery {
    val name = "q_scd2"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec").asc, col("event_id").asc)
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000000").as("sec"))
      ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("version"),
          col("sec").as("valid_from"),
          lead(col("sec"), 1).over(w).as("valid_to"))
        .orderBy("user_id", "version")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |ch AS (
        |  SELECT user_id, event_id, event_type, sec
        |  FROM (
        |    SELECT user_id, event_id, event_type, sec,
        |           lag(event_type) OVER (PARTITION BY user_id
        |                                 ORDER BY sec, event_id) AS prev_type
        |    FROM ev)
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type,
        |       CAST(row_number() OVER w AS INT) AS version,
        |       sec AS valid_from,
        |       lead(sec) OVER w AS valid_to
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        |ORDER BY user_id, version""".stripMargin)
  }

  /** First-order Markov transition matrix over each user's event stream:
    * count of (prev_type → next_type) steps plus the row-normalized
    * transition probability. The counts are exact BIGINTs; the probability
    * is ONE IEEE division of two exact integers, so it hash-matches the
    * oracle bit-for-bit.
    *
    * Plan shape: one scan, one user-keyed sort-shuffle for the `lag`, then
    * a hash aggregate whose key space is |event_type|² (25 here) — the
    * second window (row totals) runs over that tiny aggregate, not the
    * event stream, so at 100 TB the only data-sized exchange is the lag
    * sort.
    */
  object Transitions extends GraftQuery {
    val name = "q_transitions"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec").asc, col("event_id").asc)
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000000").as("sec"))
      ev.select(col("event_type").as("next_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type")
        .agg(count(lit(1)).as("n"))
        .select(col("prev_type"), col("next_type"), col("n"),
          (col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy("prev_type")).cast("double"))
            .as("p"))
        .orderBy("prev_type", "next_type")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |pairs AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY sec, event_id) AS prev_type,
        |         event_type AS next_type
        |  FROM ev),
        |c AS (
        |  SELECT prev_type, next_type, count(*) AS n
        |  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |       CAST(n AS DOUBLE)
        |         / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
        |FROM c ORDER BY 1, 2""".stripMargin)
  }

  /** Top-K most common session paths: the ordered event-type sequence of
    * each gap-based session (same 30-minute rule as `q_sessionize`),
    * counted across all sessions. The path build is ONE aggregate over the
    * session rows — `collect_list(struct(sec, event_id, type))` then an
    * in-memory `array_sort` + `transform` + `concat_ws` on the grouped
    * state — NOT a second window pass over the stream, so the event data
    * crosses exactly one user-keyed shuffle (the session-id windows) plus
    * one (user, session)-keyed aggregate that AQE coalesces; the final
    * top-K is a TakeOrdered over path counts (no global sort of paths).
    * Per-session state is bounded by session length, the same bound the
    * streaming twin's keyed state carries.
    */
  object SessionPath extends GraftQuery {
    val name = "q_session_path"
    private val GapSeconds = 1800L
    private val K = 20
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("sec").asc, col("event_id").asc)
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000000").as("sec"))
      val flagged = ev.select(col("user_id"), col("event_id"),
        col("event_type"), col("sec"),
        when(col("sec") - lag(col("sec"), 1).over(byUser) > GapSeconds, 1L)
          .otherwise(lit(0L)).as("new_sess"))
      val sessions = flagged.select(col("user_id"), col("event_id"),
        col("event_type"), col("sec"),
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("sess_id"))
      sessions.groupBy("user_id", "sess_id")
        .agg(concat_ws(">",
          transform(
            array_sort(collect_list(struct(col("sec"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type"))).as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path").asc)
        .limit(K)
    }
    val oracle = Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_id, event_type,
         |         epoch_ns(ts) // 1000000000 AS sec
         |  FROM events),
         |flagged AS (
         |  SELECT user_id, event_id, event_type, sec,
         |         CASE WHEN sec - lag(sec, 1) OVER w > $GapSeconds
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         |sessions AS (
         |  SELECT user_id, event_id, event_type, sec,
         |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM flagged),
         |paths AS (
         |  SELECT user_id, sess_id,
         |         string_agg(event_type, '>' ORDER BY sec, event_id) AS path
         |  FROM sessions GROUP BY 1, 2)
         |SELECT path, count(*) AS n_sessions
         |FROM paths GROUP BY 1
         |ORDER BY n_sessions DESC, path ASC
         |LIMIT $K""".stripMargin)
  }

  /** A/B experiment readout over a deterministic hash split (the same
    * portable md5 bucketing as `q_split_assign`, so variant membership is
    * reproducible across runs AND engines): per variant, distinct users,
    * distinct purchasers, conversion rate, exact purchase revenue, and
    * revenue per user. Counts are exact; the two rates are single IEEE
    * divisions; revenue goes through the decimal-exact sum.
    *
    * Plan shape: one scan; the distinct-user counts expand to a two-level
    * aggregate on (variant, user) — the natural key the data already
    * groups by — then a 2-row final. No joins.
    */
  object AbCompare extends GraftQuery {
    val name = "q_ab_compare"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val variant =
        when(pmod(pHash60(col("user_id").cast("string")), lit(2L)) === 0L, "A")
          .otherwise("B")
      val isPurchase = col("event_type") === "purchase"
      Graft.table(spark, sfDir, "events")
        .select(variant.as("variant"), col("user_id"), col("event_type"),
          col("value"))
        .groupBy("variant")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(isPurchase, col("user_id"))).as("n_purchasers"),
          graft.functions.SafeMath
            .exactSum(when(isPurchase, col("value")).otherwise(lit(0.0)))
            .as("purchase_value"))
        .select(col("variant"), col("n_users"), col("n_purchasers"),
          (col("n_purchasers").cast("double") / col("n_users").cast("double"))
            .as("cvr"),
          col("purchase_value"),
          (col("purchase_value") / col("n_users").cast("double"))
            .as("value_per_user"))
        .orderBy("variant")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
        |                   % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
        |         user_id, event_type, value
        |  FROM events),
        |agg AS (
        |  SELECT variant,
        |         count(DISTINCT user_id) AS n_users,
        |         count(DISTINCT CASE WHEN event_type = 'purchase'
        |                             THEN user_id END) AS n_purchasers,
        |         CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value
        |                            ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
        |           AS purchase_value
        |  FROM ev GROUP BY 1)
        |SELECT variant, n_users, n_purchasers,
        |       CAST(n_purchasers AS DOUBLE) / CAST(n_users AS DOUBLE) AS cvr,
        |       purchase_value,
        |       purchase_value / CAST(n_users AS DOUBLE) AS value_per_user
        |FROM agg ORDER BY variant""".stripMargin)
  }

  /** Time-to-conversion: per user, the lag from their FIRST view to the
    * first purchase strictly after it, bucketed into an hourly histogram —
    * the "how long does conversion take" readout that sits beside the
    * funnel's "how many convert".
    *
    * Same single-pass shape (and the same prefix-min equivalence argument)
    * as [[Funnel]]: one scan, one sort-shuffle on `user_id`, one running
    * conditional min, then a user-keyed aggregate. A purchase qualifies
    * when `sec > prefix_fv`; since the prefix min only shrinks toward the
    * per-user global first-view and any view with a smaller sec sorts
    * earlier, the qualifying set equals "purchases after the global first
    * view". All lag math is integer epoch seconds — buckets are exact in
    * both engines.
    */
  object ConversionLag extends GraftQuery {
    val name = "q_conversion_lag"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000000").as("sec"))
      val staged = ev.withColumn("fv",
        min(when(col("event_type") === "view", col("sec"))).over(w))
      val perUser = staged.groupBy("user_id")
        .agg(min(col("fv")).as("v_sec"),
          min(when(col("event_type") === "purchase" && col("fv").isNotNull &&
            col("sec") > col("fv"), col("sec"))).as("p_sec"))
        .filter(col("p_sec").isNotNull)
        .select((col("p_sec") - col("v_sec")).as("lag_sec"))
      perUser
        .groupBy(expr("lag_sec div 3600").as("lag_hours"))
        .agg(count(lit(1)).as("n_users"),
          min(col("lag_sec")).as("min_lag"), max(col("lag_sec")).as("max_lag"))
        .orderBy("lag_hours")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |staged AS (
        |  SELECT user_id, event_type, sec,
        |         min(CASE WHEN event_type = 'view' THEN sec END) OVER w AS fv
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |per_user AS (
        |  SELECT user_id, min(fv) AS v_sec,
        |         min(CASE WHEN event_type = 'purchase' AND fv IS NOT NULL
        |                       AND sec > fv THEN sec END) AS p_sec
        |  FROM staged GROUP BY 1)
        |SELECT (p_sec - v_sec) // 3600 AS lag_hours, count(*) AS n_users,
        |       min(p_sec - v_sec) AS min_lag, max(p_sec - v_sec) AS max_lag
        |FROM per_user WHERE p_sec IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Daily/weekly active users — the growth curve every event pipeline
    * reports: per observed day, the exact distinct-user count that day
    * (DAU) and over the trailing 7 days (WAU).
    *
    * The sliding distinct is NOT a window function (distinct doesn't
    * decompose over frames): each (user, day) activity row instead emits
    * its 7 future target days and WAU(d) is a plain `countDistinct` per
    * target day — turning "distinct over a sliding range" into a
    * constant-factor fan-out + hash aggregate, both map-side combinable
    * and key-partitioned. The (user, day) frame is persisted: DAU and WAU
    * both consume it. Integer epoch days keep every bucket exact.
    */
  object ActiveUsers extends GraftQuery {
    val name = "q_active_users"
    private val WindowDays = 7
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ud = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + (WindowDays - 1))).as("day"))
        .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
      // inner join restricts to OBSERVED days (offset 0 guarantees every
      // dau day has a wau row; fabricated future days drop out)
      dau.join(wau, Seq("day")).orderBy("day")
    }
    val oracle = Some(
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
         |  FROM events),
         |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
         |wau AS (
         |  SELECT day + o AS day, count(DISTINCT user_id) AS wau
         |  FROM ud, LATERAL (SELECT unnest(range($WindowDays)) AS o) g
         |  GROUP BY 1)
         |SELECT day, dau, wau
         |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin)
  }

  /** Cohort revenue (LTV curve): [[Retention]]'s revenue sibling — per
    * first-activity-day cohort and day offset ≤ 7, the purchase count and
    * decimal-exact revenue. Where retention answers "how many came back",
    * this answers "what did each acquisition day earn as it aged" — the
    * curve every growth model is fit against.
    *
    * One scan, one user-keyed shuffle: the cohort day is an unordered
    * per-user window min (no sort needed), purchases filter AFTER the
    * window so non-purchase events still anchor their user's cohort, and
    * the final aggregate is (cohort, offset)-keyed — tiny. Integer epoch
    * days; revenue through the decimal path.
    */
  object CohortRevenue extends GraftQuery {
    val name = "q_cohort_revenue"
    private val MaxOffset = 7
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.SafeMath.exactSum
      val w = Window.partitionBy("user_id")
      Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          expr("ts div 86400000000000").as("day"))
        .withColumn("cohort_day", min(col("day")).over(w))
        .filter(col("event_type") === "purchase" &&
          col("day") - col("cohort_day") <= MaxOffset)
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_purchases"), exactSum(col("value")).as("revenue"))
        .orderBy("cohort_day", "day_offset")
    }
    val oracle = Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_type, value,
         |         epoch_ns(ts) // 86400000000000 AS day
         |  FROM events),
         |coh AS (
         |  SELECT *, min(day) OVER (PARTITION BY user_id) AS cohort_day
         |  FROM ev)
         |SELECT cohort_day, day - cohort_day AS day_offset,
         |       count(*) AS n_purchases,
         |       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS revenue
         |FROM coh
         |WHERE event_type = 'purchase' AND day - cohort_day <= $MaxOffset
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** RFM segmentation — the classic customer-value grid: per purchasing
    * user, Recency (days since last purchase, anchored at the corpus' last
    * purchase second so the result is reproducible), Frequency (purchase
    * count) and Monetary (exact cent sum), each banded 1–3 by fixed
    * thresholds; output is the segment grid with user counts and total
    * value. Fixed thresholds, not data quantiles, keep the op one pass
    * (quantile-banded RFM would chain [[StatOps.LengthDeciles]]' ntile in
    * front) and make band edges audit-stable across reruns.
    *
    * One scan, one user-keyed aggregate (3 numbers per user), the 1-row
    * anchor broadcast back, then a ≤27-row grid aggregate. All banding is
    * integer; no floats anywhere.
    */
  object Rfm extends GraftQuery {
    val name = "q_rfm"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val perUser = Graft.table(spark, sfDir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000000000").as("sec"),
          graft.plans.DecimalExpressions.money_cents(col("value")).as("cents"))
        .groupBy("user_id")
        .agg(max(col("sec")).as("last_sec"), count(lit(1)).as("freq"),
          sum(col("cents")).as("monetary"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val anchor = perUser.agg(max(col("last_sec")).as("now_sec"))
      val scored = perUser.crossJoin(broadcast(anchor))
        .withColumn("rec_days", expr("(now_sec - last_sec) div 86400"))
        .withColumn("r_score",
          when(col("rec_days") <= 3, 3).when(col("rec_days") <= 10, 2)
            .otherwise(1))
        .withColumn("f_score",
          when(col("freq") >= 10, 3).when(col("freq") >= 3, 2).otherwise(1))
        .withColumn("m_score",
          when(col("monetary") >= 50000L, 3).when(col("monetary") >= 10000L, 2)
            .otherwise(1))
      scored
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_users"), sum(col("monetary")).as("monetary_cents"))
        .select(
          concat(lit("R"), col("r_score"), lit("F"), col("f_score"),
            lit("M"), col("m_score")).as("segment"),
          col("n_users"), col("monetary_cents"))
        .orderBy("segment")
    }
    val oracle = Some(
      """WITH pu AS (
        |  SELECT user_id, max(epoch_ns(ts) // 1000000000) AS last_sec,
        |         count(*) AS freq,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |anchor AS (SELECT max(last_sec) AS now_sec FROM pu),
        |scored AS (
        |  SELECT monetary,
        |         CASE WHEN (now_sec - last_sec) // 86400 <= 3 THEN 3
        |              WHEN (now_sec - last_sec) // 86400 <= 10 THEN 2
        |              ELSE 1 END AS r_score,
        |         CASE WHEN freq >= 10 THEN 3 WHEN freq >= 3 THEN 2
        |              ELSE 1 END AS f_score,
        |         CASE WHEN monetary >= 50000 THEN 3 WHEN monetary >= 10000 THEN 2
        |              ELSE 1 END AS m_score
        |  FROM pu CROSS JOIN anchor)
        |SELECT 'R' || r_score || 'F' || f_score || 'M' || m_score AS segment,
        |       count(*) AS n_users,
        |       CAST(sum(monetary) AS BIGINT) AS monetary_cents
        |FROM scored GROUP BY r_score, f_score, m_score
        |ORDER BY segment""".stripMargin)
  }

  /** Churn-label generation — the supervised-training labeler: users
    * active in the first 20 days of the observation window are the label
    * base; those with NO event in the remaining days are labeled churned.
    * Reported as churn rate per early-engagement band, which is both the
    * label QA readout (rates must fall with engagement) and the class
    * balance a model trainer needs before sampling.
    *
    * One scan, one user-keyed conditional aggregate; the window cut comes
    * from a 1-row min-day broadcast, so the labeling is fully determined
    * by the data — rerunning on the same snapshot yields the same labels
    * (no wall-clock anywhere).
    */
  object ChurnLabels extends GraftQuery {
    val name = "q_churn_labels"
    private val EarlyDays = 20
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val cut = ev.agg(min(col("day")).as("d0"))
      val perUser = ev.crossJoin(broadcast(cut))
        .groupBy("user_id")
        .agg(
          sum(when(col("day") < col("d0") + EarlyDays, 1L).otherwise(0L))
            .as("n_early"),
          sum(when(col("day") >= col("d0") + EarlyDays, 1L).otherwise(0L))
            .as("n_late"))
        .filter(col("n_early") > 0)
      val banded = perUser.withColumn("band",
        when(col("n_early") >= 50, "3_heavy")
          .when(col("n_early") >= 20, "2_medium").otherwise("1_light"))
      banded.groupBy("band")
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("n_late") === 0, 1L).otherwise(0L)).as("n_churned"))
        .withColumn("churn_rate",
          col("n_churned").cast("double") / col("n_users").cast("double"))
        .orderBy("band")
    }
    val oracle = Some(
      s"""WITH ev AS (
         |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
         |cut AS (SELECT min(day) AS d0 FROM ev),
         |pu AS (
         |  SELECT user_id,
         |         CAST(sum(CASE WHEN day < d0 + $EarlyDays THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
         |         CAST(sum(CASE WHEN day >= d0 + $EarlyDays THEN 1 ELSE 0 END) AS BIGINT) AS n_late
         |  FROM ev CROSS JOIN cut GROUP BY 1),
         |banded AS (
         |  SELECT CASE WHEN n_early >= 50 THEN '3_heavy'
         |              WHEN n_early >= 20 THEN '2_medium'
         |              ELSE '1_light' END AS band, n_late
         |  FROM pu WHERE n_early > 0)
         |SELECT band, count(*) AS n_users,
         |       CAST(sum(CASE WHEN n_late = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
         |       CAST(sum(CASE WHEN n_late = 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE) AS churn_rate
         |FROM banded GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Inter-event gap histogram — the distribution behind every session-gap
    * and burstiness constant: per-user consecutive gaps, banded into fixed
    * human-scale buckets (<1m, <5m, <30m — the sessionize threshold —
    * <2h, <1d, ≥1d). The empirical basis for `q_sessionize`'s 30-minute
    * cut and [[graft.streaming.EventStream]]'s timeout choices. One
    * user-keyed sort-shuffle for the lag, integer seconds end-to-end,
    * band shares as single divisions of exact counts (1-row total
    * broadcast).
    */
  object GapHist extends GraftQuery {
    val name = "q_gap_hist"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec").asc, col("event_id").asc)
      val gaps = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000000").as("sec"))
        .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
        .filter(col("gap").isNotNull)
      val banded = gaps.withColumn("band",
        when(col("gap") < 60, "1_under_1m")
          .when(col("gap") < 300, "2_under_5m")
          .when(col("gap") < 1800, "3_under_30m")
          .when(col("gap") < 7200, "4_under_2h")
          .when(col("gap") < 86400, "5_under_1d")
          .otherwise("6_over_1d"))
        .groupBy("band").agg(count(lit(1)).as("n_gaps"))
      val total = banded.agg(sum(col("n_gaps")).as("tot"))
      banded.crossJoin(broadcast(total))
        .select(col("band"), col("n_gaps"),
          (col("n_gaps").cast("double") / col("tot").cast("double")).as("share"))
        .orderBy("band")
    }
    val oracle = Some(
      """WITH gaps AS (
        |  SELECT sec - lag(sec) OVER (PARTITION BY user_id
        |           ORDER BY sec ASC, event_id ASC) AS gap
        |  FROM (SELECT user_id, event_id,
        |               epoch_ns(ts) // 1000000000 AS sec FROM events)),
        |banded AS (
        |  SELECT CASE WHEN gap < 60 THEN '1_under_1m'
        |              WHEN gap < 300 THEN '2_under_5m'
        |              WHEN gap < 1800 THEN '3_under_30m'
        |              WHEN gap < 7200 THEN '4_under_2h'
        |              WHEN gap < 86400 THEN '5_under_1d'
        |              ELSE '6_over_1d' END AS band
        |  FROM gaps WHERE gap IS NOT NULL),
        |counts AS (SELECT band, count(*) AS n_gaps FROM banded GROUP BY 1),
        |total AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS tot FROM counts)
        |SELECT band, n_gaps,
        |       CAST(n_gaps AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |FROM counts CROSS JOIN total ORDER BY band""".stripMargin)
  }

  /** Activity concentration (power users): the exact positional p99 of
    * per-user event counts, who clears it, and what share of all events
    * they generate — the Pareto readout behind rate-limit and skew
    * decisions (the USER-side twin of `q_key_skew`'s join-key view).
    * The rank window runs over the USERS-sized count frame (events
    * collapse first — the only corpus-sized shuffle is the per-user
    * aggregate); threshold and totals broadcast back as 1-row frames.
    */
  object PowerUsers extends GraftQuery {
    val name = "q_power_users"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val perUser = Graft.table(spark, sfDir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // distributed rank (range-partition two-phase, [[Dist]]) + a 1-row
      // broadcast total — no users-sized single-partition window
      val totalU = perUser.agg(count(lit(1)).as("u"))
      val ranked = Dist
        .globalRowNumber(perUser, "rk", col("n").asc, col("user_id").asc)
        .crossJoin(broadcast(totalU))
      // positional p99: the count at rank ceil(0.99·U) = (99·U + 99) div 100
      val thr = ranked
        .filter(col("rk") === expr("(99 * u + 99) div 100"))
        .select(col("n").as("p99_threshold"))
      perUser.crossJoin(broadcast(thr))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("n") >= col("p99_threshold"), 1L).otherwise(0L))
            .as("n_power"),
          sum(col("n")).as("events_total"),
          sum(when(col("n") >= col("p99_threshold"), col("n")).otherwise(0L))
            .as("events_power"),
          max(col("p99_threshold")).as("p99_threshold"))
        .select(col("n_users"), col("n_power"), col("p99_threshold"),
          col("events_total"), col("events_power"),
          (col("events_power").cast("double") /
            col("events_total").cast("double")).as("power_share"))
    }
    val oracle = Some(
      """WITH pu AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |ranked AS (
        |  SELECT n, row_number() OVER (ORDER BY n ASC, user_id ASC) AS rk,
        |         count(*) OVER () AS u
        |  FROM pu),
        |thr AS (SELECT n AS p99_threshold FROM ranked
        |        WHERE rk = (99 * u + 99) // 100)
        |SELECT count(*) AS n_users,
        |       CAST(sum(CASE WHEN n >= p99_threshold THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_power,
        |       max(p99_threshold) AS p99_threshold,
        |       CAST(sum(n) AS BIGINT) AS events_total,
        |       CAST(sum(CASE WHEN n >= p99_threshold THEN n ELSE 0 END) AS BIGINT)
        |         AS events_power,
        |       CAST(sum(CASE WHEN n >= p99_threshold THEN n ELSE 0 END) AS DOUBLE)
        |         / CAST(sum(n) AS DOUBLE) AS power_share
        |FROM pu CROSS JOIN thr""".stripMargin)
  }

  /** Week-over-week trend — the period-comparison readout every BI layer
    * ships: per event type, event count and exact revenue cents for the
    * trailing 7 days vs the 7 days before, with the percent change as one
    * fixed double tree. The window anchors at the data's own max day
    * (1-row broadcast), so the result is snapshot-reproducible. ONE
    * conditional aggregate over a date-pruned scan — both periods in the
    * same pass, no self-join of aggregates.
    */
  object WowChange extends GraftQuery {
    val name = "q_wow_change"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("event_type"), expr("ts div 86400000000000").as("day"),
          graft.plans.DecimalExpressions.money_cents(col("value")).as("cents"))
      val anchor = ev.agg(max(col("day")).as("dmax"))
      val cur = col("day") > col("dmax") - 7
      val prev = col("day") > col("dmax") - 14 && col("day") <= col("dmax") - 7
      ev.crossJoin(broadcast(anchor))
        .filter(col("day") > col("dmax") - 14)
        .groupBy("event_type")
        .agg(
          sum(when(cur, 1L).otherwise(0L)).as("n_cur"),
          sum(when(prev, 1L).otherwise(0L)).as("n_prev"),
          sum(when(cur, col("cents")).otherwise(0L)).as("rev_cur"),
          sum(when(prev, col("cents")).otherwise(0L)).as("rev_prev"))
        .withColumn("rev_change_pct",
          (lit(100.0) * (col("rev_cur") - col("rev_prev")).cast("double")) /
            col("rev_prev").cast("double"))
        .orderBy("event_type")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |anchor AS (SELECT max(day) AS dmax FROM ev),
        |agg AS (
        |  SELECT event_type,
        |         CAST(sum(CASE WHEN day > dmax - 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur,
        |         CAST(sum(CASE WHEN day > dmax - 14 AND day <= dmax - 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_prev,
        |         CAST(sum(CASE WHEN day > dmax - 7 THEN cents ELSE 0 END) AS BIGINT) AS rev_cur,
        |         CAST(sum(CASE WHEN day > dmax - 14 AND day <= dmax - 7 THEN cents ELSE 0 END) AS BIGINT) AS rev_prev
        |  FROM ev CROSS JOIN anchor
        |  WHERE day > dmax - 14
        |  GROUP BY 1)
        |SELECT event_type, n_cur, n_prev, rev_cur, rev_prev,
        |       (100.0 * CAST(rev_cur - rev_prev AS DOUBLE))
        |         / CAST(rev_prev AS DOUBLE) AS rev_change_pct
        |FROM agg ORDER BY event_type""".stripMargin)
  }

  /** Audience overlap — the Jaccard matrix of user sets per event-type
    * pair ("do clickers also purchase?"). One user-keyed aggregate
    * produces each user's 5-flag row; ONE second aggregate computes
    * intersection and union counts for ALL 10 unordered pairs
    * simultaneously (conditional sums — no per-pair self-joins of user
    * sets, no distinct-set materialization); a stack unpivots the 10
    * pairs. Exact integer counts, one division per pair.
    */
  object AudienceOverlap extends GraftQuery {
    val name = "q_audience_overlap"
    private val Types = Seq("click", "error", "purchase", "signup", "view")
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val flagCols = Types.map(t =>
        max(when(col("event_type") === t, 1L).otherwise(0L)).as(s"f_$t"))
      val flags = Graft.table(spark, sfDir, "events")
        .groupBy("user_id")
        .agg(flagCols.head, flagCols.tail: _*)
      val pairs = for {
        i <- Types.indices; j <- Types.indices if i < j
      } yield (Types(i), Types(j))
      val aggs = pairs.flatMap { case (a, b) =>
        Seq(
          sum(when(col(s"f_$a") === 1L && col(s"f_$b") === 1L, 1L)
            .otherwise(0L)).as(s"i_${a}_$b"),
          sum(when(col(s"f_$a") === 1L || col(s"f_$b") === 1L, 1L)
            .otherwise(0L)).as(s"u_${a}_$b"))
      }
      val wide = flags.agg(aggs.head, aggs.tail: _*)
      val stackArgs = pairs.map { case (a, b) =>
        s"'$a', '$b', i_${a}_$b, u_${a}_$b"
      }.mkString(", ")
      wide.selectExpr(s"stack(${pairs.size}, $stackArgs) " +
          "AS (type_a, type_b, n_both, n_either)")
        .withColumn("jaccard",
          when(col("n_either") > 0,
            col("n_both").cast("double") / col("n_either").cast("double")))
        .orderBy("type_a", "type_b")
    }
    val oracle = Some {
      val flagCols = Types.map(t =>
        s"max(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS f_$t")
        .mkString(", ")
      val pairs = for {
        i <- Types.indices; j <- Types.indices if i < j
      } yield (Types(i), Types(j))
      val arms = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS type_a, '$b' AS type_b,
           |  CAST(sum(CASE WHEN f_$a = 1 AND f_$b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
           |  CAST(sum(CASE WHEN f_$a = 1 OR f_$b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_either
           |FROM flags""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH flags AS (
         |  SELECT user_id, $flagCols FROM events GROUP BY 1),
         |pairs AS (
         |$arms)
         |SELECT type_a, type_b, n_both, n_either,
         |       CASE WHEN n_either > 0
         |            THEN CAST(n_both AS DOUBLE) / CAST(n_either AS DOUBLE)
         |            END AS jaccard
         |FROM pairs ORDER BY type_a, type_b""".stripMargin
    }
  }

  /** Revenue Gini coefficient — the single-number inequality readout
    * behind [[PowerUsers]]' threshold view: how concentrated is purchase
    * revenue across purchasers? Computed by the rank formula
    * G = Σ(2i−n−1)·x_i / (n·Σx) over ascending per-user revenue — and the
    * formula is TIE-ORDER-IMMUNE (equal x share a fixed set of ranks
    * whose coefficient sum doesn't depend on their internal order), so
    * the row_number tie-break affects nothing. Events collapse to the
    * users frame first; the rank window runs there; the weighted sum
    * accumulates in DECIMAL(38,0) (rank×cents×users passes 2^63 at
    * production scale); ONE division at the end.
    */
  object RevenueGini extends GraftQuery {
    val name = "q_revenue_gini"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val perUser = Graft.table(spark, sfDir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(graft.plans.DecimalExpressions.money_cents(col("value"))).as("x"))
      // distributed rank + broadcast total (no buyers-sized single task)
      val totalN = perUser.agg(count(lit(1)).as("n"))
      val ranked = Dist
        .globalRowNumber(perUser, "i", col("x").asc, col("user_id").asc)
        .crossJoin(broadcast(totalN))
        .select(col("x"), col("i"), col("n"))
      ranked.agg(
          sum(((lit(2L) * col("i") - col("n") - 1) * col("x"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("num"),
          max(col("n")).as("n_users"),
          sum(col("x")).as("total_cents"))
        .select(col("n_users"), col("total_cents"),
          (col("num").cast("double") /
            (col("n_users").cast("double") * col("total_cents").cast("double")))
            .as("gini"))
    }
    val oracle = Some(
      """WITH pu AS (
        |  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |ranked AS (
        |  SELECT x, row_number() OVER (ORDER BY x ASC, user_id ASC) AS i,
        |         count(*) OVER () AS n
        |  FROM pu)
        |SELECT CAST(max(n) AS BIGINT) AS n_users,
        |       CAST(sum(x) AS BIGINT) AS total_cents,
        |       CAST(sum((2 * i - n - 1) * x) AS DOUBLE)
        |         / (CAST(max(n) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) AS gini
        |FROM ranked""".stripMargin)
  }

  /** Gains table (decile lift) — the model-eval readout applied to the
    * simplest score there is: rank users by activity, decile them, and ask
    * how much likelier each decile is to purchase than average. The shape
    * every uplift/propensity evaluation uses; swap the score column for a
    * model output and nothing else changes. ntile runs over the USERS
    * frame under a total order (activity desc, user_id asc); rate and
    * lift are fixed double trees over exact counts with the 1-row global
    * rate broadcast.
    */
  object GainsTable extends GraftQuery {
    val name = "q_gains_table"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val perUser = Graft.table(spark, sfDir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("buyer"))
      val decile = Dist.globalNtile(perUser, 10, "decile",
        col("n_events").desc, col("user_id").asc)
      val global = perUser.agg(
        (sum(col("buyer")).cast("double") / count(lit(1)).cast("double"))
          .as("global_rate"))
      decile.groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum(col("buyer")).as("n_buyers"))
        .crossJoin(broadcast(global))
        .select(col("decile").cast("int").as("decile"), col("n_users"),
          col("n_buyers"),
          (col("n_buyers").cast("double") / col("n_users").cast("double"))
            .as("buy_rate"),
          ((col("n_buyers").cast("double") / col("n_users").cast("double")) /
            col("global_rate")).as("lift"))
        .orderBy("decile")
    }
    val oracle = Some(
      """WITH pu AS (
        |  SELECT user_id, count(*) AS n_events,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS buyer
        |  FROM events GROUP BY 1),
        |global AS (
        |  SELECT CAST(sum(buyer) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |           AS global_rate FROM pu),
        |dec AS (
        |  SELECT buyer, ntile(10) OVER (ORDER BY n_events DESC, user_id ASC)
        |           AS decile
        |  FROM pu)
        |SELECT CAST(decile AS INT) AS decile, count(*) AS n_users,
        |       CAST(sum(buyer) AS BIGINT) AS n_buyers,
        |       CAST(sum(buyer) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS buy_rate,
        |       (CAST(sum(buyer) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |         / global_rate AS lift
        |FROM dec CROSS JOIN global
        |GROUP BY decile, global_rate ORDER BY decile""".stripMargin)
  }

  /** Time-in-state rollup — how long the user base collectively spends in
    * each activity state: every event opens a state (its type) that lasts
    * until the user's next event, the final state closing at the corpus'
    * last second. The duration view of [[Transitions]]' count view (and
    * [[Scd2]]'s intervals aggregated instead of listed). One user-keyed
    * sort for the lead, integer seconds, shares as single divisions
    * against the broadcast grand total.
    */
  object StateDuration extends GraftQuery {
    val name = "q_state_duration"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000000000").as("sec"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("sec").asc, col("event_id").asc)
      val gmax = ev.agg(max(col("sec")).as("end_sec"))
      val durs = ev
        .withColumn("nxt", lead(col("sec"), 1).over(w))
        .crossJoin(broadcast(gmax))
        .select(col("event_type"),
          (coalesce(col("nxt"), col("end_sec")) - col("sec")).as("dur"))
      val perType = durs.groupBy("event_type")
        .agg(sum(col("dur")).as("total_secs"))
      val tot = perType.agg(sum(col("total_secs")).as("grand"))
      perType.crossJoin(broadcast(tot))
        .select(col("event_type"), col("total_secs"),
          (col("total_secs").cast("double") / col("grand").cast("double"))
            .as("share"))
        .orderBy("event_type")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |gmax AS (SELECT max(sec) AS end_sec FROM ev),
        |durs AS (
        |  SELECT event_type,
        |         coalesce(lead(sec) OVER (PARTITION BY user_id
        |           ORDER BY sec ASC, event_id ASC), end_sec) - sec AS dur
        |  FROM ev CROSS JOIN gmax),
        |pertype AS (
        |  SELECT event_type, CAST(sum(dur) AS BIGINT) AS total_secs
        |  FROM durs GROUP BY 1),
        |tot AS (SELECT CAST(sum(total_secs) AS BIGINT) AS grand FROM pertype)
        |SELECT event_type, total_secs,
        |       CAST(total_secs AS DOUBLE) / CAST(grand AS DOUBLE) AS share
        |FROM pertype CROSS JOIN tot ORDER BY event_type""".stripMargin)
  }

  /** Funnel × experiment: [[Funnel]]'s stage counts split by the portable
    * md5 A/B variant ([[AbCompare]]'s split) — the table an experiment
    * readout actually ships: WHERE in the funnel did the treatment move
    * users? Reuses the factored per-user stage frame verbatim (same scan,
    * same sort, same prefix-min semantics; the variant is a projection),
    * so q_funnel and this query cannot drift apart.
    */
  object FunnelVariant extends GraftQuery {
    val name = "q_funnel_variant"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val variant =
        when(pmod(pHash60(col("user_id").cast("string")), lit(2L)) === 0L, "A")
          .otherwise("B")
      Funnel.perUserStages(spark, sfDir)
        .withColumn("variant", variant)
        .groupBy("variant")
        .agg(count(col("v_sec")).as("nv"), count(col("c_sec")).as("nc"),
          count(col("p_sec")).as("np"))
        .selectExpr("variant", "stack(3, 1, 'view', nv, 2, 'click', nc, " +
          "3, 'purchase', np) AS (stage_ord, stage, n_users)")
        .select(col("variant"), col("stage_ord").cast("int"), col("stage"),
          col("n_users"))
        .orderBy("variant", "stage_ord")
    }
    val oracle = Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_id, event_type,
         |         epoch_ns(ts) // 1000000000 AS sec
         |  FROM events),
         |staged AS (
         |  SELECT user_id, event_id, event_type, sec,
         |         min(CASE WHEN event_type = 'view' THEN sec END) OVER w AS fv
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
         |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |staged2 AS (
         |  SELECT user_id, event_id, event_type, sec, fv,
         |         min(CASE WHEN event_type = 'click' AND fv IS NOT NULL
         |                       AND sec > fv AND sec <= fv + ${Funnel.WindowSec}
         |                  THEN sec END) OVER w AS qc
         |  FROM staged
         |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |staged3 AS (
         |  SELECT user_id, fv, qc,
         |         min(CASE WHEN event_type = 'purchase' AND qc IS NOT NULL
         |                       AND sec > qc AND sec <= qc + ${Funnel.WindowSec}
         |                  THEN sec END) OVER w AS qp
         |  FROM staged2
         |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |per_user AS (
         |  SELECT user_id,
         |         CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
         |              THEN 'A' ELSE 'B' END AS variant,
         |         min(fv) AS v_sec, min(qc) AS c_sec, min(qp) AS p_sec
         |  FROM staged3 GROUP BY 1),
         |counts AS (
         |  SELECT variant, count(v_sec) AS nv, count(c_sec) AS nc,
         |         count(p_sec) AS np
         |  FROM per_user GROUP BY 1)
         |SELECT variant, CAST(1 AS INT) AS stage_ord, 'view' AS stage,
         |       nv AS n_users FROM counts
         |UNION ALL SELECT variant, CAST(2 AS INT), 'click', nc FROM counts
         |UNION ALL SELECT variant, CAST(3 AS INT), 'purchase', np FROM counts
         |ORDER BY variant, stage_ord""".stripMargin)
  }

  /** New-vs-returning split — the first growth chart every event product
    * draws: per day, events and users split by whether the user's FIRST
    * day is that day. The cohort day is an unordered per-user window min
    * (one user-keyed shuffle); everything after is a day-keyed
    * conditional aggregate. Streaming twin:
    * [[graft.streaming.EventStream.newVsReturning]].
    */
  object NewVsReturning extends GraftQuery {
    val name = "q_new_vs_returning"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy("user_id")
      Graft.table(spark, sfDir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .withColumn("first_day", min(col("day")).over(w))
        .groupBy("day")
        .agg(
          sum(when(col("first_day") === col("day"), 1L).otherwise(0L))
            .as("n_events_new"),
          sum(when(col("first_day") < col("day"), 1L).otherwise(0L))
            .as("n_events_returning"),
          countDistinct(when(col("first_day") === col("day"), col("user_id")))
            .as("n_users_new"),
          countDistinct(when(col("first_day") < col("day"), col("user_id")))
            .as("n_users_returning"))
        .orderBy("day")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |tagged AS (
        |  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS first_day
        |  FROM ev)
        |SELECT day,
        |       CAST(sum(CASE WHEN first_day = day THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_events_new,
        |       CAST(sum(CASE WHEN first_day < day THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_events_returning,
        |       count(DISTINCT CASE WHEN first_day = day THEN user_id END)
        |         AS n_users_new,
        |       count(DISTINCT CASE WHEN first_day < day THEN user_id END)
        |         AS n_users_returning
        |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(Funnel, Retention, Scd2, Transitions, SessionPath, AbCompare,
      ConversionLag, ActiveUsers, CohortRevenue, Rfm, ChurnLabels, GapHist,
      PowerUsers, WowChange, AudienceOverlap, RevenueGini, GainsTable,
      StateDuration, FunnelVariant, NewVsReturning)
}
