package graft.operators

import graft.{Graft, SparkSpec}

/** Hopping-window semantics (the tumbling/running/ranking windows are
  * pinned by their oracles and QueriesSpec; the hop adds the multi-window
  * assignment invariant worth asserting directly).
  */
class WindowOpsSpec extends SparkSpec {

  test("hopping windows: every event lands in exactly size/slide windows") {
    val rows = WindowOps.HoppingWindow.run(spark, sf).collect()
    val totalAssigned = rows.map(_.getLong(2)).sum
    val nEvents = Graft.table(spark, sf, "events").count()
    assert(totalAssigned == 2 * nEvents,
      s"expected 2x assignment, got $totalAssigned for $nEvents events")
    // window starts align to the 3h slide, and each (start, type) is unique
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val starts = rows.map(r => java.time.LocalDateTime.parse(r.getString(0), fmt))
    starts.foreach { s =>
      assert(s.getHour % 3 == 0 && s.getMinute == 0 && s.getSecond == 0,
        s"window start off the slide grid: $s")
    }
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("rolling 7d: a flat one-per-day revenue ramps to 7 and plateaus") {
    import spark.implicits._
    val day0 = java.time.LocalDate.of(2024, 1, 1)
    val orders = (0 until 10).map { d =>
      (d.toLong, java.sql.Timestamp.valueOf(day0.plusDays(d).atStartOfDay), 1.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("roll_spec").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = WindowOps.Rolling7d.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 10)
    out.zipWithIndex.foreach { case ((_, dayRev, rev7), i) =>
      assert(dayRev == 1.0)
      assert(rev7 == math.min(i + 1, 7).toDouble,
        s"day $i trailing sum $rev7")
    }
    // days are consecutive epoch days
    val days = out.map(_._1)
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
  }
}
