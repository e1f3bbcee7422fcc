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

  test("percentile rank: tie semantics and closed-form values") {
    import spark.implicits._
    // one brand, prices 1,2,2,4: percent_rank = (rank-1)/(n-1), ties share
    // rank with gaps; cume_dist = rows_at_or_below / n
    val part = Seq((1L, 1.0), (2L, 2.0), (3L, 2.0), (4L, 4.0))
      .map { case (k, p) => (k, "B1", p) }
      .toDF("p_partkey", "p_brand", "p_retailprice")
    val dir = java.nio.file.Files.createTempDirectory("prank_spec").toString
    part.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = WindowOps.PercentileRank.run(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((0.0, 0.25)))
    assert(out(2L) == ((1.0 / 3.0, 0.75)))
    assert(out(3L) == ((1.0 / 3.0, 0.75)))
    assert(out(4L) == ((1.0, 1.0)))
  }

  test("percentile rank on the catalog: bounds and monotonicity per brand") {
    val rows = WindowOps.PercentileRank.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (brand, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._3 == 0.0, s"$brand: min price must rank 0")
      assert(sorted.last._4 == 1.0, s"$brand: cume_dist must reach 1")
      sorted.zip(sorted.tail).foreach { case ((_, p1, r1, c1), (_, p2, r2, c2)) =>
        assert(r1 <= r2 && c1 <= c2, s"$brand: rank not monotone in price")
        if (p1 == p2) assert(r1 == r2 && c1 == c2, s"$brand: tie split ranks")
      }
    }
  }

  test("distributed running total ≡ the naive global window cumsum") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val out = WindowOps.RunningTotalDist.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val naive = graft.Graft.table(spark, sf, "orders")
      .select(col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(27, 6)))
          .over(Window.orderBy("o_orderkey")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("rt"))
      .orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == naive.toSeq,
      s"decomposition diverges from the naive cumsum at " +
        s"${out.zip(naive).find { case (a, b) => a != b }}")
    assert(out.nonEmpty)
  }
  test("ohlc bars: open/close by time with event-id tie-break, one pass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ohlc_spec").toString
    // one 6h bar: open decided by event_id among same-second ties,
    // high/low from interior rows, close at the last second
    Seq(
      (2L, 100L, "p", 5.00), // same sec as event 1 — higher id loses open
      (1L, 100L, "p", 3.00), // open = 300
      (3L, 200L, "p", 9.99), // high = 999
      (4L, 300L, "p", 0.01), // low = 1
      (5L, 400L, "p", 7.00)) // close = 700
      .map { case (id, sec, t, v) =>
        (id, sec * 1000000000L, 1L, t, v, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = WindowOps.OhlcBars.run(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      (("p", 0L, 300L, 999L, 1L, 700L, 5L)), s"$r")
  }

  test("dense top-k keeps every tied day") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dense_spec").toString
    val day = 86400L
    // days 0,1 tie at 500; day 2 at 300; day 3 at 100; day 4 at 50
    // dense ranks: 1,1,2,3 → K=3 keeps days 0,1,2,3 and drops day 4
    val rows = Seq((0, 5.00), (1, 5.00), (2, 3.00), (3, 1.00), (4, 0.50))
    rows.zipWithIndex.map { case ((d, v), i) =>
      (i.toLong, d.toLong * day * 1000000000L, 1L, "view", v, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = WindowOps.DenseTopK.run(spark, dir).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, 0L, 500L), (1, 1L, 500L), (2, 2L, 300L),
      (3, 3L, 100L)), s"${out.toSeq}")
  }

}
