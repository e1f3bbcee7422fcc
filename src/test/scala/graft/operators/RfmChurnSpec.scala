package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture-level semantics for the RFM grid and the churn labeler. */
class RfmChurnSpec extends SparkSpec {

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, tsSec, uid, t, v) =>
      (id, tsSec * 1000000000L, uid, t, v, """{"k": 1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("rfm: crafted users land in the right segments") {
    val dir = java.nio.file.Files.createTempDirectory("rfm_spec").toString
    val day = 86400L
    // anchor user: 12 purchases of $60 on days 27..38 → last=day38,
    //   recency 0 → R3, freq 12 → F3, monetary 72000¢ → M3
    val champion = (0 until 12).map(i =>
      (100L + i, (27 + i) * day, 1L, "purchase", 60.0))
    // one purchase of $5 on day 20 → recency (38-20)=18d → R1 F1 M1
    val lost = Seq((200L, 20 * day, 2L, "purchase", 5.0))
    // 5 purchases of $30 on days 30..34 → recency 4d → R2, F2, M2 (15000¢)
    val mid = (0 until 5).map(i => (300L + i, (30 + i) * day, 3L, "purchase", 30.0))
    // non-purchase noise must not contribute
    val noise = Seq((400L, 38 * day, 4L, "view", 999.0))
    writeEvents(dir, champion ++ lost ++ mid ++ noise)
    val out = BehaviorOps.Rfm.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("R1F1M1", 1L, 500L), ("R2F2M2", 1L, 15000L),
      ("R3F3M3", 1L, 72000L)), s"got: $out")
  }

  test("rfm on the catalog: users partition into segments, cents are exact") {
    val rows = BehaviorOps.Rfm.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = graft.Graft.table(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users, "every purchaser is segmented")
  }

  test("churn labels: early-only users churn, straddlers don't, late-only excluded") {
    val dir = java.nio.file.Files.createTempDirectory("churn_spec").toString
    val day = 86400L
    // d0 = day 0. early window = days [0,20)
    val churner = (0 until 25).map(i => (500L + i, (i % 20) * day, 1L, "view", 1.0))
    val stayer = Seq.tabulate(22)(i => (600L + i, i * day, 2L, "click", 1.0)) // days 0..21
    val lateOnly = Seq((700L, 25 * day, 3L, "view", 1.0)) // no early activity → excluded
    writeEvents(dir, churner ++ stayer ++ lateOnly)
    val out = BehaviorOps.ChurnLabels.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // churner: 25 early events → 2_medium, churned; stayer: 20 early → 2_medium, stays
    assert(out == Seq(("2_medium", 2L, 1L, 0.5)), s"got: $out")
  }

  test("churn rate is a valid probability per band on the catalog") {
    val rows = BehaviorOps.ChurnLabels.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }
}
