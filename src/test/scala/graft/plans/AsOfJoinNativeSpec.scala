package graft.plans

import graft.{Graft, SparkSpec}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The native as-of operator must plan through AsOfJoinExec and produce
  * exactly the composed (union+window) result.
  */
class AsOfJoinNativeSpec extends SparkSpec {

  private def eventSides = {
    val ev = Graft.table(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    (ev.filter(col("event_type") === "purchase")
       .select(col("user_id"), col("ts"), col("event_id"), col("value")),
     ev.filter(col("event_type") === "click"))
  }

  test("native as-of plans through AsOfJoinExec") {
    GraftExtensions.register(spark)
    val (purchases, clicks) = eventSides
    val native = AsOfJoin.asofBackwardNative(purchases, clicks,
      "user_id", "ts", "event_id", "event_id")
    // nodeName strips the Exec suffix in plan strings
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("native ≡ composed as-of join on real events") {
    GraftExtensions.register(spark)
    val (purchases, clicks) = eventSides
    val native = AsOfJoin.asofBackwardNative(purchases, clicks,
        "user_id", "ts", "event_id", "event_id")
      .select(col("event_id"), col("_asof").cast("long").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val composed = AsOfJoin.asofBackward(purchases, clicks,
        "user_id", "ts", "event_id", col("event_id"))
      .select(col("event_id"), col("_asof").cast("long").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(native.size == composed.size && native.nonEmpty)
    assert(native == composed)
  }

  test("edge semantics: same-instant right row matches; empty right → all null") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val left = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 12L))
      .toDF("k", "t", "id")
    val right = Seq((1L, 100L, 20L), (1L, 40L, 21L))
      .toDF("k", "t", "id")
    val got = AsOfJoin.asofBackwardNative(left, right, "k", "t", "id", "id")
      .select(col("id"), col("_asof").cast("long"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(10L).contains(20L)) // same-instant match
    assert(got(11L).contains(21L)) // earlier click
    assert(got(12L).isEmpty)       // other key, no rights
    val empty = right.filter(col("k") < 0)
    val allNull = AsOfJoin.asofBackwardNative(left, empty, "k", "t", "id", "id")
      .select(col("_asof")).collect()
    assert(allNull.forall(_.isNullAt(0)))
  }
}
