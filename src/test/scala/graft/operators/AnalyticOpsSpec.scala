package graft.operators

import graft.SparkSpec

/** Analytic-operator semantics beyond the oracle hash-match (the other
  * AnalyticOps queries are pinned by their CORRECTNESS rows; skyline gets a
  * differential check because its single-sort formulation is the part worth
  * proving equivalent to the quadratic definition).
  */
class AnalyticOpsSpec extends SparkSpec {

  test("skyline: crafted frontier with duplicates and dominated points") {
    import spark.implicits._
    // frontier: (1.0,5) (2.0,3)×2 (2.5,2) (4.0,1)
    // dominated: (3.0,3) by (2.0,3) [strict price]; (5.0,1) by (4.0,1);
    //            (2.0,4) by (2.0,3) [strict size]
    val part = Seq(
      (1L, 1.0, 5), (2L, 2.0, 3), (3L, 2.0, 3), (4L, 3.0, 3),
      (5L, 2.5, 2), (6L, 4.0, 1), (7L, 5.0, 1), (8L, 2.0, 4))
      .toDF("p_partkey", "p_retailprice", "p_size")
    val dir = java.nio.file.Files.createTempDirectory("sky_spec").toString
    part.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = AnalyticOps.Skyline.run(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1.0, 5, 1L), (2.0, 3, 2L), (2.5, 2, 1L), (4.0, 1, 1L)),
      out.mkString(", "))
  }

  test("skyline equals the brute-force Pareto frontier on the catalog") {
    val pts = graft.Graft.table(spark, sf, "part")
      .select("p_retailprice", "p_size").collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
      .groupBy(identity).map { case (p, g) => (p._1, p._2, g.length.toLong) }
      .toSeq
    val expected = pts.filter { case (price, size, _) =>
      !pts.exists { case (p2, s2, _) =>
        p2 <= price && s2 <= size && (p2 < price || s2 < size)
      }
    }.toSet
    val out = AnalyticOps.Skyline.run(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == expected,
      s"missing=${(expected -- out).take(5)} extra=${(out -- expected).take(5)}")
    assert(out.nonEmpty)
  }

  test("seasonal profile: known epoch instants land in the right cells") {
    import spark.implicits._
    // 1970-01-01 (a Thursday, dow 4) 00:30 and 23:59; +3 days → Sunday (0)
    val ev = Seq(
      (1L, 1800L * 1000000000L, 1L, "view", 1.0),
      (2L, 86340L * 1000000000L, 1L, "view", 2.0),
      (3L, (3L * 86400L + 7200L) * 1000000000L, 2L, "click", 3.0))
      .map { case (eid, ts, uid, t, v) => (eid, ts, uid, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("season_spec").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticOps.SeasonalProfile.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      (4L, 0L) -> ((1L, 1.0)), (4L, 23L) -> ((1L, 2.0)),
      (0L, 2L) -> ((1L, 3.0))), out.mkString(", "))
  }

  test("seasonal profile covers every event exactly once on the catalog") {
    val rows = AnalyticOps.SeasonalProfile.run(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum ==
      graft.Graft.table(spark, sf, "events").count())
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 6)
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23)
    }
  }

  test("locf: pre-purchase events carry null, later events carry the most " +
    "recent purchase, a new purchase overrides") {
    import spark.implicits._
    val sec = (s: Long) => s * 1000000000L
    val rows = Seq(
      (1L, 1L, "view", 0.0, sec(10)), (2L, 1L, "purchase", 5.5, sec(20)),
      (3L, 1L, "click", 0.0, sec(30)), (4L, 1L, "purchase", 9.25, sec(40)),
      (5L, 1L, "view", 0.0, sec(50)),
      (6L, 2L, "view", 0.0, sec(10))) // u2 never purchases
      .map { case (eid, uid, t, v, ts) => (eid, ts, uid, t, v, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("locf_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticOps.LocfFeatures.run(spark, dir).collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(5.5), 3L -> Some(5.5),
      4L -> Some(9.25), 5L -> Some(9.25), 6L -> None), s"$out")
  }

  test("burstiness: constant traffic scores 0, a planted burst scores the " +
    "closed-form Fano factor") {
    import spark.implicits._
    val h = (hr: Long) => hr * 3600L * 1000000000L
    // type "flat": 3 events in each of 2 hours → fano 0
    // type "burst": 1 event then 5 events → n=2, s=6, q=26 → (52-36)/12 = 4/3
    val rows =
      (0 until 3).map(i => (100L + i, h(0) + i, 1L, "flat", 0.0, "{}")) ++
      (0 until 3).map(i => (200L + i, h(1) + i, 1L, "flat", 0.0, "{}")) ++
      Seq((300L, h(0) + 9L, 1L, "burst", 0.0, "{}")) ++
      (0 until 5).map(i => (400L + i, h(1) + 20L + i, 1L, "burst", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("fano_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticOps.Burstiness.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out("flat") == ((2L, 6L, 0.0)), s"${out("flat")}")
    assert(out("burst") == ((2L, 6L, 16.0 / 12.0)), s"${out("burst")}")
  }
}
