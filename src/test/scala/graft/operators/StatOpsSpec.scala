package graft.operators

import graft.SparkSpec

/** Statistical-operator semantics beyond the oracle hash-match. */
class StatOpsSpec extends SparkSpec {

  test("quartiles are ordered and drawn from the data") {
    val rows = StatOps.Quartiles.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val prices = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0)).toSet
    rows.foreach { r =>
      val (q1, m, q3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(q1 <= m && m <= q3, s"quartiles out of order: $r")
      assert(prices(q1) && prices(m) && prices(q3),
        "positional quartiles must be actual data values (no interpolation)")
    }
  }

  test("correlation is in [-1,1]; perfectly linear data gives r=1") {
    val rows = StatOps.Correlation.run(spark, sf).collect()
    rows.foreach { r =>
      val p = r.getDouble(2)
      assert(!p.isNaN && p >= -1.0 - 1e-12 && p <= 1.0 + 1e-12, s"r out of range: $r")
    }
    // closed form on a hand-built y = 2x line
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lin = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L)).toDF("x", "y")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
          sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))).as("r"))
      .head.getDouble(0)
    assert(math.abs(lin - 1.0) < 1e-12)
  }

  test("z-score outliers: a planted extreme value is flagged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 100 values at ~10.00 plus one at 10000.00 — the plant is >3σ out
    val ev = ((1 to 100).map(i => (i.toLong, "t", 10.0 + (i % 7) * 0.01)) :+
      (101L, "t", 10000.0))
      .map { case (id, t, v) => (id, id * 1000000000L, id, t, v, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("zscore_spec").toString
    // write ts as long nanos (the operator reads it via Graft.table, which
    // only needs the column to exist; value/event_type are what matter)
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = StatOps.ZScoreOutliers.run(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 101L)
    assert(out.head.getLong(2) == 1L, s"planted outlier not flagged: ${out.head}")
  }

  test("length deciles are balanced, exhaustive, and monotone in span") {
    val rows = StatOps.LengthDeciles.run(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10), "one row per decile")
    val counts = rows.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, s"ntile imbalance: ${counts.mkString(",")}")
    val total = graft.Graft.table(spark, sf, "documents").count()
    assert(counts.sum == total)
    // spans are ordered and non-overlapping-except-boundaries: the min of
    // decile k+1 is >= the max of decile k (ties can straddle a boundary)
    val spans = rows.map(r => (r.getLong(2), r.getLong(3)))
    spans.foreach { case (lo, hi) => assert(lo <= hi) }
    spans.zip(spans.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(lo2 >= hi, s"deciles out of order: $hi then $lo2")
    }
  }

  test("profile: nulls, distincts, and numeric ranges on a crafted table") {
    import spark.implicits._
    val orders = Seq(
      (Some(1L), Some(10L), Some(5.0), Some("O"), None: Option[String]),
      (Some(2L), Some(10L), None: Option[Double], Some("F"), Some("1-URGENT")),
      (Some(3L), None: Option[Long], Some(7.5), Some("O"), Some("1-URGENT")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority")
    val dir = java.nio.file.Files.createTempDirectory("profile_spec").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = StatOps.Profile.run(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }.toMap
    assert(out("o_orderkey") == ((0L, 3L, Some(1.0), Some(3.0))))
    assert(out("o_custkey") == ((1L, 1L, Some(10.0), Some(10.0))))
    assert(out("o_totalprice") == ((1L, 2L, Some(5.0), Some(7.5))))
    assert(out("o_orderstatus") == ((0L, 2L, None, None)))
    assert(out("o_orderpriority") == ((1L, 1L, None, None)))
  }

  test("event spike: a planted traffic burst is flagged against its " +
    "trailing 24h; steady hours are not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 30 hours: hours 0..28 alternate 10/12 events, hour 29 bursts to 100.
    // Warm-up rows (first 24 hours) carry no verdict; steady hours after
    // the warm-up must not flag; the burst must.
    val perHour = (0 to 29).map(h => h -> (if (h == 29) 100 else 10 + 2 * (h % 2)))
    val rows = perHour.flatMap { case (h, n) =>
      (0 until n).map(i =>
        ((h * 1000L + i), h * 3600L * 1000000000L + i * 1000000L, 1L, "view",
          0.0, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("spike_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = StatOps.EventSpike.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(4))).toMap
    assert(out.keySet == (24 to 29).map(_.toLong).toSet,
      s"verdicts only after a full trailing window: ${out.keySet}")
    (24 to 28).foreach(h => assert(out(h.toLong)._2 == 0, s"steady hour $h flagged"))
    assert(out(29L) == ((100L, 1)), s"burst not flagged: ${out(29L)}")
    // degenerate σ=0 window: constant traffic everywhere → z NULL, no flag
    val flat = (0 to 25).flatMap(h => (0 until 5).map(i =>
      ((h * 100L + i), h * 3600L * 1000000000L + i * 1000000L, 1L, "view", 0.0, "{}")))
    val dir2 = java.nio.file.Files.createTempDirectory("spike_flat").toString
    flat.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val flatOut = StatOps.EventSpike.run(spark, dir2).collect()
    assert(flatOut.nonEmpty)
    flatOut.foreach { r =>
      assert(r.isNullAt(3), s"σ=0 hour must report NULL z: $r")
      assert(r.getInt(4) == 0, s"σ=0 hour flagged: $r")
    }
  }

  test("hist quantile: error bounded by one bin width; exact on a " +
    "one-value-per-bin fixture") {
    import spark.implicits._
    // 128 values at cents 0..127 with 128 bins → every bin holds exactly
    // its own value, so the histogram estimate IS the exact quantile
    val ev = (0 until 128).map(i =>
      (i.toLong, i * 1000000000L, 1L, "t", i / 100.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("hq_spec").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = StatOps.HistQuantile.run(spark, dir).collect().head
    assert(r.getLong(3) == 0L && r.getLong(6) == 0L,
      s"one-value-per-bin fixture must estimate exactly: $r")
    assert(r.getLong(1) == 63L && r.getLong(4) == 121L,
      s"positional ranks: ${r}") // r50=((129*50)//100)=64 → x=63; r95=122 → x=121
    // catalog: the estimate can never be off by more than one bin width
    import org.apache.spark.sql.functions._
    val widths = graft.Graft.table(spark, sf, "events")
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("x"))
      .groupBy("event_type")
      .agg(((max(col("x")) - min(col("x")) + 1L) / 128L + 1L).as("bw"))
      .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    StatOps.HistQuantile.run(spark, sf).collect().foreach { row =>
      val t = row.getString(0)
      assert(row.getLong(3) <= widths(t) + 1 && row.getLong(6) <= widths(t) + 1,
        s"$t error exceeds a bin width: $row vs ${widths(t)}")
    }
  }
  test("weighted median: weight mass, not row count, decides the pick") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wmed_spec").toString
    val d = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // flag A: one heavy cheap row (w=9) vs many expensive rows (w=2 total)
    //   → median at the cheap value despite being 1 row of 3
    // flag B: symmetric weights → lower-median rule picks the smaller value
    Seq(("A", 1.0, 9.0), ("A", 2.0, 1.0), ("A", 3.0, 1.0),
      ("B", 1.0, 1.0), ("B", 2.0, 1.0))
      .zipWithIndex.map { case ((f, p, q), i) =>
        (i.toLong, i.toLong, i.toLong, 1, q, p, 0.0, 0.0, f, "O", d) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = StatOps.WeightedMedian.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("A", 11L, 100L), ("B", 2L, 100L)), s"${out.toSeq}")
  }

  test("percentile_cont: hand-computed interpolation on a 5-value segment") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pcont_spec").toString
    val d = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, "cA", 0, 0.0, "M")).toDF(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    // prices 10..50 dollars → cents 1000..5000
    (1L to 5L).map(i => (i, 1L, "O", i * 10.0, d, "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val out = StatOps.PercentileCont.run(spark, dir).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    // n=5: pos100(p) = 4p. p25→(2,f0)=2000; p50→3000; p75→4000;
    // p90→pos 360: lo rank 4 (4000), f 60 → 4000·0.4 + 5000·0.6 = 4600
    assert(out == Map(25L -> 2000.0, 50L -> 3000.0, 75L -> 4000.0,
      90L -> 4600.0), s"$out")
  }

}
