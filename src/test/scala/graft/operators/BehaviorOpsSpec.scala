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

  test("scd2 collapses consecutive duplicates into contiguous versioned intervals") {
    import spark.implicits._
    // u1: A A B A  → 3 intervals (the repeat A at t2 merges into [t1,t3))
    // u2: single event → one open interval
    val sec = (s: Long) => s * 1000000000L
    val ev = Seq(
      (1L, sec(10), 1L, "view"), (2L, sec(20), 1L, "view"),
      (3L, sec(30), 1L, "click"), (4L, sec(40), 1L, "view"),
      (5L, sec(15), 2L, "purchase"))
      .map { case (eid, ts, uid, t) => (eid, ts, uid, t, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("scd2_spec").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.Scd2.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "view", 1, 10L, 30L),
      (1L, "click", 2, 30L, 40L),
      (1L, "view", 3, 40L, -1L),
      (2L, "purchase", 1, 15L, -1L)), out.mkString(", "))
  }

  test("transitions: counts match a hand-built chain and rows normalize to 1") {
    import spark.implicits._
    // u1: a→b→c ; u2: a→a  ⇒ (a,b,1), (b,c,1), (a,a,1); P(a→b)=P(a→a)=0.5
    val sec = (s: Long) => s * 1000000000L
    val ev = Seq(
      (1L, sec(10), 1L, "a"), (2L, sec(20), 1L, "b"), (3L, sec(30), 1L, "c"),
      (4L, sec(10), 2L, "a"), (5L, sec(20), 2L, "a"))
      .map { case (eid, ts, uid, t) => (eid, ts, uid, t, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("trans_spec").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.Transitions.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", "a", 1L, 0.5), ("a", "b", 1L, 0.5), ("b", "c", 1L, 1.0)),
      out.mkString(", "))
  }

  test("transitions on the catalog: probabilities sum to 1 per source state") {
    val rows = BehaviorOps.Transitions.run(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"$prev row sums to $total")
    }
    assert(rows.nonEmpty)
  }

  test("session path: ordered within session, split at the gap, ranked by count") {
    import spark.implicits._
    val sec = (s: Long) => s * 1000000000L
    // u1: a,b,c tight then (gap > 1800s) a  ⇒ sessions "a>b>c", "a"
    // u2: a,b,c tight                       ⇒ session  "a>b>c"
    val ev = Seq(
      (1L, sec(0), 1L, "a"), (2L, sec(100), 1L, "b"), (3L, sec(200), 1L, "c"),
      (4L, sec(9000), 1L, "a"),
      (5L, sec(0), 2L, "a"), (6L, sec(50), 2L, "b"), (7L, sec(60), 2L, "c"))
      .map { case (eid, ts, uid, t) => (eid, ts, uid, t, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("path_spec").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.SessionPath.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a>b>c", 2L), ("a", 1L)), out.mkString(", "))
  }

  test("ab compare: exactly two variants, consistent internal arithmetic") {
    val rows = BehaviorOps.AbCompare.run(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B"))
    rows.foreach { r =>
      val (users, purchasers) = (r.getLong(1), r.getLong(2))
      assert(purchasers <= users && users > 0)
      assert(r.getDouble(3) == purchasers.toDouble / users.toDouble)
      assert(r.getDouble(5) == r.getDouble(4) / users.toDouble)
    }
    // hash split is deterministic: a second run lands identically
    val again = BehaviorOps.AbCompare.run(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("scd2 intervals tile each user's history: contiguous, versions sequential") {
    val rows = BehaviorOps.Scd2.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
    rows.groupBy(_._1).foreach { case (uid, ivs) =>
      val sorted = ivs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to sorted.length), s"user $uid versions")
      sorted.zip(sorted.tail).foreach { case ((_, t1, _, _, to1), (_, t2, _, from2, _)) =>
        assert(to1 == from2, s"user $uid gap: $to1 vs $from2")
        assert(t1 != t2, s"user $uid adjacent intervals share type $t1")
      }
      assert(sorted.last._5 == Long.MaxValue, s"user $uid last interval not open")
    }
  }

  test("conversion lag: first view → first later purchase; pre-view and " +
    "purchase-less users excluded") {
    import spark.implicits._
    val sec = (h: Long) => h * 3600L * 1000000000L // hours → nanos
    // u1: view@0h, purchase@2h (lag 2h); u2: purchase@0h BEFORE view@1h
    // (excluded — no purchase after the view); u3: views only (excluded);
    // u4: view@0h, purchases@5h and 9h (first wins: lag 5h)
    val rows = Seq(
      (1L, 1L, "view", sec(0)), (2L, 1L, "purchase", sec(2)),
      (3L, 2L, "purchase", sec(0)), (4L, 2L, "view", sec(1)),
      (5L, 3L, "view", sec(0)),
      (6L, 4L, "view", sec(0)), (7L, 4L, "purchase", sec(5)),
      (8L, 4L, "purchase", sec(9)))
      .map { case (eid, uid, t, ts) => (eid, ts, uid, t, 0.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("convlag_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.ConversionLag.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // buckets: 2h lag → bucket 2 (u1), 5h lag → bucket 5 (u4)
    assert(out == Map(2L -> ((1L, 7200L, 7200L)), 5L -> ((1L, 18000L, 18000L))),
      s"$out")
  }

  test("active users: wau is the trailing-7-day distinct union; only " +
    "observed days appear") {
    import spark.implicits._
    val day = (d: Long) => d * 86400L * 1000000000L
    // u1 active day 0; u2 active days 3 and 10; u3 active day 3
    val rows = Seq(
      (1L, 1L, day(0)), (2L, 2L, day(3)), (3L, 3L, day(3)),
      (4L, 2L, day(10)))
      .map { case (eid, uid, ts) => (eid, ts, uid, "view", 0.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("active_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.ActiveUsers.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // day 0: dau 1 (u1), wau 1; day 3: dau 2 (u2,u3), wau 3 (day 0 u1
    // still inside the 7-day window); day 10: dau 1, wau 1 (day 3 aged out)
    assert(out == Map(0L -> ((1L, 1L)), 3L -> ((2L, 3L)), 10L -> ((1L, 1L))),
      s"$out")
    // catalog invariants: wau ≥ dau everywhere, both positive
    val cat = BehaviorOps.ActiveUsers.run(spark, sf).collect()
    assert(cat.nonEmpty)
    cat.foreach(r => assert(r.getLong(2) >= r.getLong(1) && r.getLong(1) > 0))
  }

  test("cohort revenue: purchases attribute to the first-activity cohort " +
    "within the offset horizon") {
    import spark.implicits._
    val day = (d: Long) => d * 86400L * 1000000000L
    // u1: views day 0 (cohort 0), buys 5.0 day 0, 7.0 day 3, 1.0 day 9
    // (day 9 beyond the 7-day horizon); u2: first seen day 3, buys 2.0 day 3
    val rows = Seq(
      (1L, 1L, "view", 0.0, day(0)), (2L, 1L, "purchase", 5.0, day(0)),
      (3L, 1L, "purchase", 7.0, day(3)), (4L, 1L, "purchase", 1.0, day(9)),
      (5L, 2L, "purchase", 2.0, day(3)))
      .map { case (eid, uid, t, v, ts) => (eid, ts, uid, t, v, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("cohort_rev_spec").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.CohortRevenue.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out == Map((0L, 0L) -> ((1L, 5.0)), (0L, 3L) -> ((1L, 7.0)),
      (3L, 0L) -> ((1L, 2.0))), s"$out")
  }
  test("gap histogram: crafted gaps land in their bands; shares sum to 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gap_spec").toString
    // one user, events at 0s, 30s, +4m, +1h, +3d → gaps 30, 240, 3600, 259200
    val secs = Seq(0L, 30L, 270L, 3870L, 263070L)
    secs.zipWithIndex.map { case (s, i) =>
      (i.toLong, s * 1000000000L, 1L, "view", 1.0, """{"k": 1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.GapHist.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("1_under_1m" -> 1L, "2_under_5m" -> 1L,
      "4_under_2h" -> 1L, "6_over_1d" -> 1L), s"$out")
    val shares = BehaviorOps.GapHist.run(spark, sf).collect().map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("power users: distinct planted counts give the exact p99 cut") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("power_spec").toString
    // users 1..100 with i events each: p99 rank = 99 → threshold 99,
    // power set = {99, 100}: 199 of 5050 events
    val rows = for { u <- 1 to 100; i <- 1 to u }
      yield ((u * 1000 + i).toLong, (u * 1000 + i) * 1000000000L, u.toLong,
        "view", 1.0, """{"k": 1}""")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = BehaviorOps.PowerUsers.run(spark, dir).collect().head
    spark.catalog.clearCache()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((100L, 2L, 99L, 5050L, 199L)), s"$r")
    assert(math.abs(r.getDouble(5) - 199.0 / 5050.0) < 1e-15)
  }

  test("wow change: crafted weeks give the exact percent change") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wow_spec").toString
    val day = 86400L
    // anchor day 20. current week = days 14..20, previous = 7..13.
    // prev revenue 400, current 500 → +25%; day 6 must be excluded
    val rows = Seq(
      (1L, 6 * day, 1L, "purchase", 999.0), // outside both windows
      (2L, 8 * day, 1L, "purchase", 4.00),
      (3L, 15 * day, 1L, "purchase", 2.00),
      (4L, 20 * day, 1L, "purchase", 3.00))
    rows.map { case (id, s, u, t, v) =>
      (id, s * 1000000000L, u, t, v, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.WowChange.run(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 1L, 500L, 400L)), s"$r")
    assert(math.abs(r.getDouble(5) - 25.0) < 1e-12)
  }

  test("audience overlap: crafted users give exact jaccard per pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("overlap_spec").toString
    // u1: click+view; u2: click; u3: view; u4: purchase
    // click∩view={u1}, click∪view={u1,u2,u3} → 1/3
    // click∩purchase=∅, union={u1,u2,u4} → 0
    val rows = Seq((1L, "click"), (1L, "view"), (2L, "click"), (3L, "view"),
      (4L, "purchase"))
    rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, i.toLong * 1000000000L, u, t, 1.0, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.AudienceOverlap.run(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out(("click", "view")) == ((1L, 3L)), s"$out")
    assert(out(("click", "purchase")) == ((0L, 3L)), s"$out")
    assert(out(("purchase", "view")) == ((0L, 3L)), s"$out")
    assert(out.size == 10, "all 10 unordered pairs present")
  }

  test("revenue gini: equal users score 0; concentration matches closed form") {
    import spark.implicits._
    def write(dir: String, cents: Seq[Long]): Unit =
      cents.zipWithIndex.map { case (c, i) =>
        (i.toLong, i.toLong * 1000000000L, i.toLong, "purchase",
          c.toDouble / 100.0, """{"k": 1}""") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val d1 = java.nio.file.Files.createTempDirectory("gini_eq").toString
    write(d1, Seq(250L, 250L, 250L, 250L))
    val r1 = BehaviorOps.RevenueGini.run(spark, d1).collect().head
    assert(r1.getLong(0) == 4L && r1.getDouble(2) == 0.0, s"$r1")
    val d2 = java.nio.file.Files.createTempDirectory("gini_conc").toString
    val xs = Seq(100L, 100L, 100L, 500L)
    write(d2, xs)
    // closed form: sorted asc, G = sum((2i-n-1)x)/(n*sum x)
    val n = xs.length
    val num = xs.sorted.zipWithIndex
      .map { case (x, i0) => (2L * (i0 + 1) - n - 1) * x }.sum
    val expected = num.toDouble / (n.toDouble * xs.sum.toDouble)
    val r2 = BehaviorOps.RevenueGini.run(spark, d2).collect().head
    assert(math.abs(r2.getDouble(2) - expected) < 1e-15, s"$r2 vs $expected")
  }

  test("gains table: deciles partition users; lift is rate over global") {
    val out = BehaviorOps.GainsTable.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val users = graft.Graft.table(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(out.map(_._2).sum == users, "deciles must partition the users")
    val (gb, gu) = (out.map(_._3).sum, out.map(_._2).sum)
    val global = gb.toDouble / gu.toDouble
    out.foreach { case (_, nu, nb, rate, lift) =>
      assert(nb <= nu)
      assert(math.abs(rate - nb.toDouble / nu.toDouble) < 1e-15)
      assert(math.abs(lift - rate / global) < 1e-12)
    }
  }

  test("state duration: crafted stream gives exact durations and shares") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("statedur_spec").toString
    // u1: view@0 (10s) → click@10 (20s, closes at gmax=30)
    // u2: view@20 (10s to gmax)
    Seq((1L, 0L, 1L, "view"), (2L, 10L, 1L, "click"), (3L, 20L, 2L, "view"),
      (4L, 30L, 3L, "error"))
      .map { case (id, s, u, t) => (id, s * 1000000000L, u, t, 1.0, """{"k":1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.StateDuration.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // view: 10 (u1) + 10 (u2→gmax 30) = 20; click: 20 (10→30); error: 0
    assert(out == Map("view" -> 20L, "click" -> 20L, "error" -> 0L), s"$out")
  }

  test("funnel variant: A+B counts reassemble the unsplit funnel") {
    val split = BehaviorOps.FunnelVariant.run(spark, sf).collect()
      .map(r => ((r.getInt(1), r.getString(2)), r.getLong(3)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val whole = BehaviorOps.Funnel.run(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    assert(split == whole, s"$split vs $whole")
    // per-variant monotonicity: view >= click >= purchase
    BehaviorOps.FunnelVariant.run(spark, sf).collect()
      .groupBy(_.getString(0)).foreach { case (_, rows) =>
        val byStage = rows.map(r => r.getInt(1) -> r.getLong(3)).toMap
        assert(byStage(1) >= byStage(2) && byStage(2) >= byStage(3))
      }
  }

  test("new vs returning: first-day users are new, later days split exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nvr_spec").toString
    val day = 86400L
    // u1: day0 (2 events), day1 (1); u2: day1 (1) → day0 all new;
    // day1: 1 returning event (u1), 1 new event + user (u2)
    Seq((1L, 0L, 1L), (2L, 10L, 1L), (3L, day, 1L), (4L, day + 5, 2L))
      .map { case (id, s, u) => (id, s * 1000000000L, u, "view", 1.0, """{"k":1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = BehaviorOps.NewVsReturning.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq((0L, 2L, 0L, 1L, 0L), (1L, 1L, 1L, 1L, 1L)),
      s"${out.toSeq}")
  }

}
