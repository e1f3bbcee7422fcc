package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inference-operator semantics beyond the oracle hash-match: closed-form
  * results on planted fixtures where the right answer is known exactly.
  */
class InferenceOpsSpec extends SparkSpec {

  private def writeLineitem(dir: String, rows: Seq[(String, Long, Double)]): Unit = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((f, q, p), i) =>
      (i.toLong, i.toLong, i.toLong, 1, q.toDouble, p, 0.0, 0.0, f, "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("linreg recovers a planted exact line (slope/intercept/r2)") {
    val dir = java.nio.file.Files.createTempDirectory("linreg_spec").toString
    // y = 3.00·x + 5.00 dollars exactly: slope in cents/unit = 300, r2 = 1
    writeLineitem(dir, (1L to 20L).map(q => ("A", q, 3.0 * q + 5.0)))
    val r = InferenceOps.LinReg.run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 20L)
    assert(math.abs(r.head.getDouble(2) - 300.0) < 1e-9, s"slope: ${r.head}")
    assert(math.abs(r.head.getDouble(3) - 500.0) < 1e-6, s"intercept: ${r.head}")
    assert(math.abs(r.head.getDouble(4) - 1.0) < 1e-12, s"r2: ${r.head}")
  }

  test("linreg on the catalog: r2 in [0,1], group sizes partition the table") {
    val rows = InferenceOps.LinReg.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getDouble(4)
      assert(!r2.isNaN && r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"r2 out of range: $r")
    }
    val total = graft.Graft.table(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("autocorr: a planted period-7 series gives r=1 at lag 7") {
    val dir = java.nio.file.Files.createTempDirectory("autocorr_spec").toString
    import spark.implicits._
    // 28 days; daily count = 5 + (day mod 7)·3 — exactly periodic with
    // period 7, non-constant within a week
    val rows = for {
      day <- 0 until 28
      i <- 0 until (5 + (day % 7) * 3)
    } yield (day.toLong * 100 + i, day.toLong * 86400L * 1000000000L + i,
      i.toLong, "view", 1.0, """{"k": 1}""")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = InferenceOps.Autocorr.run(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 7L))
    val byLag = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(byLag(7L) - 1.0) < 1e-12, s"lag-7 r: ${byLag(7L)}")
    assert(byLag(1L) < 1.0 - 1e-6, "lag-1 must see the within-week variation")
    // pair counts: 27 lag-1 pairs, 21 lag-7 pairs
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 27L, 7L -> 21L))
  }

  test("ks test: identical distributions accept, disjoint ones reject with D=1") {
    // catalog: the two md5 halves draw from the same distribution
    val same = InferenceOps.KsTest.run(spark, sf).collect().head
    val d = same.getDouble(2)
    assert(d >= 0.0 && d <= 1.0)
    assert(same.getInt(3) == 0, s"same-distribution split must accept: $same")
    // planted: group A all at $1.00, group B all at $100.00 → D = 1, reject
    val dir = java.nio.file.Files.createTempDirectory("ks_spec").toString
    import spark.implicits._
    import graft.functions.PortableHash.pHash60
    val keys = (1L to 400L).toDF("o_orderkey")
      .withColumn("g1", pmod(pHash60(col("o_orderkey").cast("string")), lit(2L)))
      .withColumn("o_totalprice",
        when(col("g1") === 0L, 1.0).otherwise(100.0))
      .withColumn("o_custkey", col("o_orderkey"))
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .drop("g1")
    keys.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = InferenceOps.KsTest.run(spark, dir).collect().head
    assert(math.abs(out.getDouble(2) - 1.0) < 1e-12, s"disjoint D: $out")
    assert(out.getInt(3) == 1, s"disjoint distributions must reject: $out")
    assert(out.getLong(0) + out.getLong(1) == 400L)
  }
  test("drawdown: a planted peak-fall-recover curve gives the exact trough") {
    val dir = java.nio.file.Files.createTempDirectory("dd_spec").toString
    import spark.implicits._
    // daily revenue: +100, +50, -120 (day2), -20 (day3), +200
    // cum: 100, 150, 30, 10, 210; peak: 100, 150, 150, 150, 210
    // dd:  0, 0, 120, 140, 0 → max 140 at day 3
    val revs = Seq(100L, 50L, -120L, -20L, 200L)
    val rows = revs.zipWithIndex.map { case (cents, d) =>
      (d.toLong, d.toLong * 86400L * 1000000000L, 1L, "purchase",
        cents.toDouble / 100.0, """{"k": 1}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = InferenceOps.Drawdown.run(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 140L, 3L)), s"$r")
  }

  test("bootstrap CI: ordered, bracketed by the data range, deterministic") {
    val r1 = InferenceOps.BootstrapCi.run(spark, sf).collect().head
    spark.catalog.clearCache()
    val r2 = InferenceOps.BootstrapCi.run(spark, sf).collect().head
    spark.catalog.clearCache()
    assert(r1 == r2, "resamples are hash-derived — reruns must be identical")
    val (lo, hi) = (r1.getDouble(1), r1.getDouble(2))
    assert(lo <= hi)
    assert(r1.getLong(3) == 32L)
    import org.apache.spark.sql.functions._
    val mm = graft.Graft.table(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(min(expr("round(value * 100)")), max(expr("round(value * 100)")))
      .head
    assert(lo >= mm.getDouble(0) && hi <= mm.getDouble(1),
      "replica means live inside the data range")
  }

  test("rolling median: hand-computed windows, full-history gating") {
    val dir = java.nio.file.Files.createTempDirectory("rollmed_spec").toString
    import spark.implicits._
    // 9 days of revenue 1..9 dollars → daily cents 100..900.
    // window ending day 6 = days 0..6 → median 400; day 7 → 500; day 8 → 600
    val rows = (0 until 9).map { d =>
      (d.toLong, d.toLong * 86400L * 1000000000L, 1L, "purchase",
        (d + 1).toDouble, """{"k": 1}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = InferenceOps.RollingMedian.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(out.toSeq == Seq((6L, 7L, 400L), (7L, 7L, 500L), (8L, 7L, 600L)),
      s"${out.toSeq}")
  }

  test("corr matrix: bounded everywhere; a planted linear pair scores 1") {
    val cat = InferenceOps.CorrMatrix.run(spark, sf).collect()
    assert(cat.length == 6)
    cat.foreach { r =>
      val p = r.getDouble(2)
      assert(!p.isNaN && p >= -1.0 - 1e-12 && p <= 1.0 + 1e-12, s"$r")
    }
    val dir = java.nio.file.Files.createTempDirectory("cmx_spec").toString
    // price = 2·qty exactly → r(qty, price) = 1
    writeLineitem(dir, (1L to 10L).map(q => ("A", q, 2.0 * q)))
    val out = InferenceOps.CorrMatrix.run(spark, dir).collect()
      .filter(!_.isNullAt(2)) // zero-variance pairs (constant disc/tax) are NULL
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(math.abs(out(("qty", "price")) - 1.0) < 1e-12, s"$out")
  }

}
