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
    // drive the REAL operator through a fixture events table:
    // u1 converts fully; u2 clicks BEFORE viewing (no conversion);
    // u3 clicks after the 24h window (no conversion); u4 clicks AT the
    // same second as its first view (strict '>' must reject it)
    val sec = (h: Long) => h * 3600L * 1000000000L // hours → nanos
    val rows = Seq(
      (1L, "view", sec(0)), (2L, "click", sec(1)), (3L, "purchase", sec(2)),
      (4L, "click", sec(0)), (5L, "view", sec(1)), (6L, "purchase", sec(2)),
      (7L, "view", sec(0)), (8L, "click", sec(30)), (9L, "purchase", sec(31)),
      (10L, "view", sec(5)), (11L, "click", sec(5)))
      .zipWithIndex.map { case ((eid, t, ts), i) =>
        (eid, ts, Seq(1L, 1L, 1L, 2L, 2L, 2L, 3L, 3L, 3L, 4L, 4L)(i), t, 0.0, "{}")
      }
    val dir = java.nio.file.Files.createTempDirectory("funnel_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.Funnel.run(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // views: u1, u2, u3, u4; qualifying clicks: u1 only (u2 pre-view,
    // u3 out of window, u4 same-second); purchases: u1 only
    assert(out == Map("view" -> 4L, "click" -> 1L, "purchase" -> 1L), s"$out")
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
