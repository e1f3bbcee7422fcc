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
  private def exploded(spark: SparkSession, sfDir: String): DataFrame =
    Graft.table(spark, sfDir, "events")
      .select(col("event_type"),
        explode(from_json(col("props"), propsType)).as(Seq("prop_key", "v")))

  /** A4 — map-valued sum per group (`pyspark_yolox.py:158-165`): one
    * explode + one hash aggregate instead of a per-group driver loop.
    * Integer-valued, so the sum is exact in BIGINT — no decimal detour.
    */
  object MapSum extends GraftQuery {
    val name = "q_map_sum"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      exploded(spark, sfDir)
        .groupBy("event_type", "prop_key")
        .agg(sum(col("v")).as("total"))
        .orderBy("event_type", "prop_key")
    val oracle = Some(
      """SELECT event_type, 'k' AS prop_key,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total
        |FROM events GROUP BY event_type ORDER BY event_type, prop_key""".stripMargin)
  }

  /** A5 — map-valued average: per-key sum over the group's total row count
    * (`pyspark_yolox.py:167-169` divides by the group's file_counter, i.e.
    * rows in the group, not rows carrying the key).
    */
  object MapAvg extends GraftQuery {
    val name = "q_map_avg"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val n = Graft.table(spark, sfDir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n_events"))
      exploded(spark, sfDir)
        .groupBy("event_type", "prop_key")
        .agg(sum(col("v")).as("total"))
        .join(broadcast(n), "event_type")
        .select(col("event_type"), col("prop_key"),
          (col("total").cast("double") / col("n_events").cast("double")).as("avg_val"))
        .orderBy("event_type", "prop_key")
    }
    val oracle = Some(
      """SELECT event_type, 'k' AS prop_key,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
        |       / CAST(count(*) AS DOUBLE) AS avg_val
        |FROM events GROUP BY event_type ORDER BY event_type, prop_key""".stripMargin)
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
