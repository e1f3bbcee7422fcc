package graft.operators

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream — the funnel / cohort
  * retention family every product-analytics engine ships and the reference
  * (an image-stats pipeline, SURVEY §2.9) lacks entirely.
  *
  * Both operators run on integer epoch math (`ts div 1e9` seconds,
  * `div 86400` days) so every comparison and bucket is bit-identical to the
  * DuckDB oracle. Both are sequences of hash aggregations / equi-joins on
  * `user_id` — co-partitioned shuffles that scale linearly; no windows over
  * the full event table, no driver-side state.
  */
object BehaviorOps {

  /** Ordered conversion funnel view → click → purchase. A user counts for a
    * stage only if the stage event happens STRICTLY AFTER their entry into
    * the previous stage and within the conversion window (min-timestamp
    * semantics, the standard "ordered windowed funnel"). Each stage is one
    * filtered aggregate joined to the previous stage's frame — at scale,
    * three hash aggregations co-partitioned on `user_id`, each strictly
    * smaller than the last; the final counts are three single-row
    * aggregates unioned together.
    */
  object Funnel extends GraftQuery {
    val name = "q_funnel"
    private val stages = Seq("view", "click", "purchase")
    private val WindowSec = 86400L // 24h stage-to-stage conversion window
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000000000").as("sec"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("sec")).as("v_sec"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("sec") > col("v_sec") && col("sec") <= col("v_sec") + WindowSec)
        .groupBy("user_id").agg(min(col("sec")).as("c_sec"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("sec") > col("c_sec") && col("sec") <= col("c_sec") + WindowSec)
        .groupBy("user_id").agg(min(col("sec")).as("p_sec"))
      val stageCounts = Seq(v, c, p).zip(stages).zipWithIndex.map {
        case ((df, stage), i) =>
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(i + 1).cast("int").as("stage_ord"),
              lit(stage).as("stage"), col("n_users"))
      }
      stageCounts.reduce(_.unionAll(_)).orderBy("stage_ord")
    }
    val oracle = Some(
      s"""WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |v AS (SELECT user_id, min(sec) AS v_sec FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.sec) AS c_sec
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.sec > v.v_sec
        |        AND e.sec <= v.v_sec + $WindowSec GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.sec) AS p_sec
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.sec > c.c_sec
        |        AND e.sec <= c.c_sec + $WindowSec GROUP BY 1)
        |SELECT CAST(1 AS INT) AS stage_ord, 'view' AS stage, count(*) AS n_users FROM v
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', count(*) FROM c
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', count(*) FROM p
        |ORDER BY stage_ord""".stripMargin)
  }

  /** Cohort retention: users grouped by first-activity day (the cohort),
    * counted as retained on each later day they were active, out to 7 days.
    * Day buckets are integer epoch days, so cohort and offset are exact in
    * both engines. Plan shape: one aggregate for first-activity, one
    * distinct over (user, day), one co-partitioned equi-join on `user_id`,
    * one final hash aggregate — each shuffle keyed on small integers.
    */
  object Retention extends GraftQuery {
    val name = "q_retention"
    private val MaxOffset = 7
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      val active = ev.distinct()
      active.join(cohort, Seq("user_id"))
        .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"),
          col("user_id"))
        .filter(col("day_offset") <= MaxOffset)
        .groupBy("cohort_day", "day_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }
    val oracle = Some(
      s"""WITH ev AS (
         |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
         |cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
         |active AS (SELECT DISTINCT user_id, day FROM ev)
         |SELECT cohort_day, day - cohort_day AS day_offset, count(*) AS n_users
         |FROM active JOIN cohort USING (user_id)
         |WHERE day - cohort_day <= $MaxOffset
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(Funnel, Retention)
}
