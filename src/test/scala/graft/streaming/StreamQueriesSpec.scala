package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The registered streaming queries (q_stream_*) are REAL streaming
  * executions; this spec pins their twin contract engine-side: the
  * materialized stream result must equal the equivalent batch computation
  * row-for-row. (The driver's DuckDB oracle proves the same thing against
  * a second engine; this differential keeps the invariant locally
  * buildable without DuckDB.)
  */
class StreamQueriesSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q_stream_tumbling ≡ batch tumbling aggregate") {
    import org.apache.spark.sql.functions._
    val streamed = rows(StreamQueries.StreamTumbling.run(spark, sf))
    val batch = rows(EventStream.windowedCounts(
        EventStream.batchEvents(spark, sf))
      .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("win_start", "event_type"))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("q_stream_sessions ≡ batch session_window aggregate") {
    import org.apache.spark.sql.functions._
    val streamed = rows(StreamQueries.StreamSessions.run(spark, sf))
    val batch = rows(EventStream.sessionWindowed(
        EventStream.batchEvents(spark, sf))
      .select(col("user_id"),
        unix_micros(col("sess_start")).as("sess_start_us"),
        unix_micros(col("sess_end")).as("sess_end_us"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "sess_start_us"))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("q_stream_purchase_click ≡ batch interval join") {
    import org.apache.spark.sql.functions._
    val ev = EventStream.batchEvents(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value"))
    val batch = rows(p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("purchase_id")).as("n_purchases"),
        graft.functions.SafeMath.exactSum(col("value")).as("click_value"))
      .orderBy("user_id"))
    val streamed = rows(StreamQueries.StreamPurchaseClick.run(spark, sf))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("q_stream_dedup retains every unique event exactly once") {
    import org.apache.spark.sql.functions._
    val streamed = rows(StreamQueries.StreamDedup.run(spark, sf))
    val batch = rows(EventStream.batchEvents(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("n_ids"),
        graft.functions.SafeMath.exactSum(col("value")).as("total_value"))
      .orderBy("event_type"))
    assert(streamed.nonEmpty && streamed == batch)
  }
}
