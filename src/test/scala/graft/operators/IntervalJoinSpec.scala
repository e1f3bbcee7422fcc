package graft.operators

import graft.SparkSpec

/** Interval-overlap join semantics beyond the oracle hash-match: the
  * exactly-once emission rule (a pair sharing MANY time buckets must
  * surface once, without a dedup pass) and equivalence to the quadratic
  * overlap definition on the catalog.
  */
class IntervalJoinSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivj_spec").toString
    rows.map { case (eid, sec, uid) =>
      (eid, sec * 1000000000L, uid, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("crafted sessions: overlaps, touching endpoints, second sessions") {
    // u1: [0,2000] then (gap 8000 > 1800) [10000,10000]
    // u2: [500,500]   u3: [9800,10100]   u4: [1900,1950]   u5: [100,1500]
    val dir = writeEvents(Seq(
      (1L, 0L, 1L), (2L, 1000L, 1L), (3L, 2000L, 1L), (4L, 10000L, 1L),
      (5L, 500L, 2L),
      (6L, 9800L, 3L), (7L, 10100L, 3L),
      (8L, 1900L, 4L), (9L, 1950L, 4L),
      (10L, 100L, 5L), (11L, 900L, 5L), (12L, 1500L, 5L)))
    val out = AsOfJoin.IntervalJoin.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 0L, 2L, 0L, 500L, 500L, 0L),
      (1L, 0L, 4L, 0L, 1900L, 1950L, 50L),
      (1L, 0L, 5L, 0L, 100L, 1500L, 1400L),
      (1L, 1L, 3L, 0L, 10000L, 10000L, 0L),
      (2L, 0L, 5L, 0L, 500L, 500L, 0L)), out.mkString(", "))
  }

  test("a pair spanning many buckets is emitted exactly once") {
    // both sessions span secs 0..2000 — buckets 0..3 shared four times over
    val dir = writeEvents(Seq(
      (1L, 0L, 1L), (2L, 1000L, 1L), (3L, 2000L, 1L),
      (4L, 0L, 2L), (5L, 1000L, 2L), (6L, 2000L, 2L)))
    val out = AsOfJoin.IntervalJoin.run(spark, dir).collect()
    assert(out.length == 1, out.mkString(", "))
    assert(out.head.getLong(6) == 2000L)
  }

  test("matches the quadratic overlap definition on the catalog") {
    val iv = AnalyticOps.sessionFrame(spark, sf)
      .groupBy("user_id", "sess_id")
      .agg(org.apache.spark.sql.functions.min("sec").as("s"),
        org.apache.spark.sql.functions.max("sec").as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = (for {
      a <- iv; b <- iv
      if a._1 < b._1 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._1, b._2,
      math.max(a._3, b._3), math.min(a._4, b._4),
      math.min(a._4, b._4) - math.max(a._3, b._3))).toSet
    val out = AsOfJoin.IntervalJoin.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(out == expected,
      s"missing=${(expected -- out).take(3)} extra=${(out -- expected).take(3)}")
    assert(out.nonEmpty)
  }
}
