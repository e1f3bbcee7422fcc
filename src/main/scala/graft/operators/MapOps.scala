package graft.operators

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

/** JSON-map column operators (SURVEY.md §2.4 A4/A5/A8, §2.6 F4/F5/F7).
  *
  * The reference stores per-image `{classId → count}` histograms as JSON
  * strings in CSV cells (`pyspark_yolox.py:110-111`) and re-parses them with
  * `json.loads` on every use (`pyspark_stats.py:58`). Here the JSON boundary
  * is crossed once with `from_json` into a native `MapType`, after which
  * everything is columnar: explode → hash aggregate → (optionally)
  * `map_from_entries` to re-assemble.
  *
  * The testdata stand-in is `events.props` (a JSON object column).
  */
object MapOps {

  private val propsType = MapType(StringType, LongType)

  /** props parsed and exploded to (event_type, key, value) rows. */
  private def exploded(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      explode(from_json(col("props"), propsType)).as(Seq("prop_key", "v")))

  /** A4 over any (event_type, props:json) frame — the spec drives this with
    * multi-key maps; the driver query is the same plan over `events`.
    */
  def mapSum(events: DataFrame): DataFrame =
    exploded(events)
      .groupBy("event_type", "prop_key")
      .agg(sum(col("v")).as("total"))
      .orderBy("event_type", "prop_key")

  /** A5 over any (event_type, props:json) frame. */
  def mapAvg(events: DataFrame): DataFrame = {
    val n = events.groupBy("event_type").agg(count(lit(1)).as("n_events"))
    exploded(events)
      .groupBy("event_type", "prop_key")
      .agg(sum(col("v")).as("total"))
      .join(broadcast(n), "event_type")
      .select(col("event_type"), col("prop_key"),
        (col("total").cast("double") / col("n_events").cast("double")).as("avg_val"))
      .orderBy("event_type", "prop_key")
  }

  /** A4 — map-valued sum per group (`pyspark_yolox.py:158-165`): one
    * explode + one hash aggregate instead of a per-group driver loop.
    * Integer-valued, so the sum is exact in BIGINT — no decimal detour.
    */
  object MapSum extends GraftQuery {
    val name = "q_map_sum"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      mapSum(Graft.table(spark, sfDir, "events"))
    // json_keys + quoted-path extract replays arbitrary-key maps (the
    // previous '$.k' oracle certified only the single-key shape the
    // testdata happens to use); keys containing a double-quote would break
    // the path literal — out of scope for JSON object keys in this corpus
    val oracle = Some(
      """WITH kv AS (
        |  SELECT event_type, k.key AS prop_key,
        |         CAST(json_extract_string(props, '$."' || k.key || '"') AS BIGINT) AS v
        |  FROM events, LATERAL (SELECT unnest(json_keys(props)) AS key) k)
        |SELECT event_type, prop_key, CAST(sum(v) AS BIGINT) AS total
        |FROM kv GROUP BY 1, 2 ORDER BY event_type, prop_key""".stripMargin)
  }

  /** A5 — map-valued average: per-key sum over the group's total row count
    * (`pyspark_yolox.py:167-169` divides by the group's file_counter, i.e.
    * rows in the group, not rows carrying the key).
    */
  object MapAvg extends GraftQuery {
    val name = "q_map_avg"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      mapAvg(Graft.table(spark, sfDir, "events"))
    // divisor is the group's EVENT count, not its (event, key) row count —
    // hence the separate `n` CTE (a lateral-unnested count(*) would count
    // exploded rows and silently change the average's denominator)
    val oracle = Some(
      """WITH n AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY 1),
        |kv AS (
        |  SELECT event_type, k.key AS prop_key,
        |         CAST(json_extract_string(props, '$."' || k.key || '"') AS BIGINT) AS v
        |  FROM events, LATERAL (SELECT unnest(json_keys(props)) AS key) k)
        |SELECT kv.event_type, kv.prop_key,
        |       CAST(sum(kv.v) AS DOUBLE) / CAST(max(n.n_events) AS DOUBLE) AS avg_val
        |FROM kv JOIN n ON kv.event_type = n.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** A8 — threshold filter + grouped histogram (the detection-score gate,
    * `score > 0.4` at `pyspark_yolox.py:101-111`; here `value > 250`).
    */
  object DetectionHistogram extends GraftQuery {
    val name = "q_detection_histogram"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "events")
        .filter(col("value") > lit(250.0))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    val oracle = Some(
      """SELECT event_type, count(*) AS n FROM events
        |WHERE value > 250.0 GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** F5/A4 round-trip helper (not a driver query — covered by ScalaTest):
    * re-assemble exploded (key, sum) rows into a sorted-entry map column,
    * the engine's canonical map representation (sorted for deterministic
    * hashing; map key order is undefined otherwise).
    */
  def reassembleMap(grouped: DataFrame, groupCol: String): DataFrame =
    grouped.groupBy(groupCol)
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("prop_key"), col("total"))))).as("props_sum"))

  /** A5 as a map-level transform: divide every value of a sum-map column by
    * a count column in place (`transform_values` — the direct Spark
    * spelling of `avgs[key] = d[key]/file_counter`,
    * `pyspark_yolox.py:167-169`).
    */
  def mapAverage(df: DataFrame, mapCol: String, countCol: String): DataFrame =
    df.withColumn(mapCol + "_avg",
      transform_values(col(mapCol),
        (_, v) => v.cast("double") / col(countCol).cast("double")))

  val all: Seq[GraftQuery] = Seq(MapSum, MapAvg, DetectionHistogram)
}
