package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Semantics of the behavioral-analytics operators on hand-built event
  * fixtures (the registry queries themselves are oracle-checked; these pin
  * the edge cases the synthetic data may not hit).
  */
class BehaviorOpsSpec extends SparkSpec {

  test("funnel stages are ordered, windowed, and monotonically shrinking") {
    val rows = BehaviorOps.Funnel.run(spark, sf).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel grew between stages: ${counts.mkString(",")}")
    assert(counts.head > 0)
  }

  test("funnel requires strict order within the window") {
    import spark.implicits._
    // u1 converts fully; u2 clicks BEFORE viewing (no conversion);
    // u3 clicks after the 24h window (no conversion)
    val sec = (h: Long) => h * 3600L * 1000000000L // hours → nanos
    val ev = Seq(
      (1L, "view", sec(0)), (1L, "click", sec(1)), (1L, "purchase", sec(2)),
      (2L, "click", sec(0)), (2L, "view", sec(1)), (2L, "purchase", sec(2)),
      (3L, "view", sec(0)), (3L, "click", sec(30)), (3L, "purchase", sec(31)))
      .toDF("user_id", "event_type", "ts")
    ev.createOrReplaceTempView("spec_events")
    // replicate the operator's stage chain on the fixture
    import org.apache.spark.sql.functions._
    val e = ev.select(col("user_id"), col("event_type"),
      expr("ts div 1000000000").as("sec"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("sec")).as("v_sec"))
    val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .filter(col("sec") > col("v_sec") && col("sec") <= col("v_sec") + 86400L)
      .groupBy("user_id").agg(min(col("sec")).as("c_sec"))
    val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("sec") > col("c_sec") && col("sec") <= col("c_sec") + 86400L)
      .groupBy("user_id").agg(min(col("sec")).as("p_sec"))
    assert(v.count() == 3)
    // u2's click precedes its first view; u3's click is outside 24h
    assert(c.select("user_id").collect().map(_.getLong(0)).toSet == Set(1L))
    assert(p.select("user_id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("retention: every cohort has an offset-0 row counting its full size") {
    val rows = BehaviorOps.Retention.run(spark, sf).collect()
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (cohort, rs) =>
      val offsets = rs.map(_.getLong(1)).toSet
      assert(offsets.contains(0L), s"cohort $cohort missing day-0 row")
      val day0 = rs.find(_.getLong(1) == 0L).get.getLong(2)
      // no later offset can retain more users than the cohort has
      rs.foreach { r: Row =>
        assert(r.getLong(2) <= day0,
          s"cohort $cohort offset ${r.getLong(1)} exceeds cohort size")
      }
    }
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 7))
  }
}
