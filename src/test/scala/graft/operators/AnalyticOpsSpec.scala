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
}
