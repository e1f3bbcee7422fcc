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
  test("forward as-of: earliest at-or-after match, unconverted stay null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("asoffwd_spec").toString
    val sec = 1000000000L
    // user 1: click@10 → purchases @5 (before, ignored) and @20 → secs 10
    // user 1: click@20 → same-instant purchase @20 matches → secs 0
    // user 2: click@10, no purchase → NULL
    Seq(
      (1L, 10 * sec, 1L, "click", 1.0), (2L, 20 * sec, 1L, "click", 1.0),
      (3L, 5 * sec, 1L, "purchase", 1.0), (4L, 20 * sec, 1L, "purchase", 1.0),
      (5L, 10 * sec, 2L, "click", 1.0))
      .map { case (id, ts, u, t, v) => (id, ts, u, t, v, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.AsOfJoin.NextPurchase.run(spark, dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq(
      (1L, Some(4L), Some(10L)), (2L, Some(4L), Some(0L)),
      (5L, None, None)), s"${out.toSeq}")
  }

  test("last-touch attribution: window gate, direct bucket, exact cents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lasttouch_spec").toString
    val sec = 1000000000L
    val day = 86400L
    // u1: view@10, click@20, purchase@30 → click (latest touch)
    // u2: view@0, purchase@(0+2d) → stale touch → direct
    // u3: purchase@5 with no touches → direct
    Seq(
      (1L, 10 * sec, 1L, "view", 0.0), (2L, 20 * sec, 1L, "click", 0.0),
      (3L, 30 * sec, 1L, "purchase", 2.50),
      (4L, 0L, 2L, "view", 0.0), (5L, 2 * day * sec, 2L, "purchase", 1.00),
      (6L, 5 * sec, 3L, "purchase", 4.00))
      .map { case (id, ts, u, t, v) => (id, ts, u, t, v, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.AsOfJoin.LastTouch.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("click", 1L, 250L), ("direct", 2L, 500L)),
      s"${out.toSeq}")
  }

  test("attribution compare: models disagree per channel, agree in total") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attrcmp_spec").toString
    val sec = 1000000000L
    // u1: view@10 → click@20 → purchase@30 ($2):
    //   first touch = view, last touch = click
    Seq((1L, 10 * sec, 1L, "view", 0.0), (2L, 20 * sec, 1L, "click", 0.0),
      (3L, 30 * sec, 1L, "purchase", 2.00))
      .map { case (id, ts, u, t, v) => (id, ts, u, t, v, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.AsOfJoin.AttributionCompare.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == Set(("view", "first_touch", 200L),
      ("click", "last_touch", 200L)), s"${out.toSeq}")
    // catalog: both models distribute the SAME total revenue
    val cat = graft.operators.AsOfJoin.AttributionCompare.run(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val byModel = cat.groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).sum }
    assert(byModel("first_touch") == byModel("last_touch"),
      s"attribution must conserve revenue: $byModel")
  }

}
