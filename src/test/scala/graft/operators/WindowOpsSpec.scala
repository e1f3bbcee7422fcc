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
}
