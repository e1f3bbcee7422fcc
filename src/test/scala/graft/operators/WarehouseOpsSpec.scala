package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Warehouse-pack semantics beyond the oracle hash-match: internal
  * consistency of the star-join aggregates against independently computed
  * driver-side ground truth at sf0.001.
  */
class WarehouseOpsSpec extends SparkSpec {

  test("pricing summary: partitions the filtered fact table exactly") {
    val rows = WarehouseOps.PricingSummary.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val filtered = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
    assert(rows.map(_.getLong(9)).sum == filtered.count(),
      "per-group count_order must sum to the filtered row count")
    rows.foreach { r =>
      val (base, disc, charge) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(disc <= base, "discounted price cannot exceed base price")
      assert(charge >= disc, "charge adds tax on top of the discounted price")
    }
  }

  test("shipping priority: top-10, revenue-descending, honest revenue") {
    val rows = WarehouseOps.ShippingPriority.run(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(3))
    assert(revs.zip(revs.drop(1)).forall { case (a, b) => a >= b },
      "must be sorted by revenue descending")
    // spot-check the top order's revenue against a direct recompute
    val top = rows.head
    val expect = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") === top.getLong(0) &&
        col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .agg(graft.functions.SafeMath.exactSum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .head.getDouble(0)
    assert(top.getDouble(3) == expect, "top revenue must recompute exactly")
  }

  test("regional volume: only nations of the chosen region appear") {
    val rows = WarehouseOps.RegionalVolume.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val asia = spark.read.parquet(s"$sf/nation.parquet")
      .join(spark.read.parquet(s"$sf/region.parquet")
          .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(asia(r.getString(0)), s"non-ASIA nation in result: $r")
      assert(r.getDouble(1) > 0.0 && r.getLong(2) > 0L)
    }
  }

  test("returned customers: every item counted is a returned item") {
    val rows = WarehouseOps.ReturnedCustomers.run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val totalReturned = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
      .join(spark.read.parquet(s"$sf/orders.parquet")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(rows.map(_.getLong(4)).sum <= totalReturned,
      "top-20 item counts cannot exceed the full returned-item count")
  }

  test("grouping sets: each set partitions the table; grand total present") {
    val rows = WarehouseOps.GroupingSetsAgg.run(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    val byStatus = rows.filter(r =>
      r.getString(0) != "(ALL)" && r.getString(1) == "(ALL)")
    val byPriority = rows.filter(r =>
      r.getString(0) == "(ALL)" && r.getString(1) != "(ALL)")
    val grand = rows.filter(r =>
      r.getString(0) == "(ALL)" && r.getString(1) == "(ALL)")
    assert(byStatus.map(_.getLong(2)).sum == total)
    assert(byPriority.map(_.getLong(2)).sum == total)
    assert(grand.length == 1 && grand.head.getLong(2) == total)
  }

  test("MAD outliers: stats match a driver-side exact recompute") {
    val rows = WarehouseOps.MadOutliers.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderstatus", "o_totalprice", "o_orderkey").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.foreach { r =>
      val status = r.getString(0)
      val xs = data.filter(_._1 == status).sortBy(t => (t._2, t._3)).map(_._2)
      val med = xs((xs.length + 1) / 2 - 1)
      assert(r.getDouble(2) == med, s"median mismatch for $status")
      val devs = data.filter(_._1 == status)
        .map(t => (math.abs(t._2 - med), t._3)).sortBy(identity).map(_._1)
      val mad = devs((devs.length + 1) / 2 - 1)
      assert(r.getDouble(3) == mad, s"MAD mismatch for $status")
      val nOut = devs.count(_ > 3.0 * mad)
      assert(r.getLong(4) == nOut, s"outlier count mismatch for $status")
      assert(r.getLong(1) == xs.length)
    }
  }

  test("mixture weights: integer plan is exact and capped") {
    val rows = WarehouseOps.MixtureWeights.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (n, tot, k, target, keep, deficit) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(tot == total, "every row must carry the same grand total")
      assert(target == tot / k)
      assert(keep == math.min(n, target))
      assert(deficit == math.max(0L, target - n))
    }
  }

  test("latest snapshot: last write wins, same-second ties resolve by event id") {
    import spark.implicits._
    val sec = (s: Long) => s * 1000000000L
    // u1/view: two writes → the later one; u1/click: same-second writes →
    // the higher event_id; u2/purchase: single write passes through
    val ev = Seq(
      (1L, sec(10), 1L, "view", 1.0), (2L, sec(20), 1L, "view", 2.0),
      (3L, sec(30), 1L, "click", 3.0), (4L, sec(30), 1L, "click", 4.0),
      (5L, sec(15), 2L, "purchase", 5.0))
      .map { case (eid, ts, uid, t, v) => (eid, ts, uid, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("snap_spec").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = WarehouseOps.LatestSnapshot.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out == Map(
      (1L, "view") -> ((20L, 2L, 2.0)),
      (1L, "click") -> ((30L, 4L, 4.0)),
      (2L, "purchase") -> ((15L, 5L, 5.0))), out.mkString(", "))
  }

  test("snapshot diff partitions the corpus by md5 bucket exactly") {
    import org.apache.spark.sql.functions._
    val out = WarehouseOps.SnapshotDiff.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val buckets = graft.Graft.table(spark, sf, "documents")
      .select(pmod(graft.functions.PortableHash.pHash60(col("doc_id").cast("string")),
        lit(10L)).as("b"))
      .groupBy("b").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.getOrElse("added", 0L) == buckets.getOrElse(2L, 0L))
    assert(out.getOrElse("removed", 0L) == buckets.getOrElse(0L, 0L))
    // modified = bucket-1 docs whose revision actually changes the hash
    // (always, ' rev2' is appended) — minus nothing
    assert(out.getOrElse("modified", 0L) == buckets.getOrElse(1L, 0L))
    val total = graft.Graft.table(spark, sf, "documents").count()
    assert(out.values.sum == total, s"$out vs total $total")
  }

  test("latest snapshot on the catalog: one row per live (user, type) key") {
    val rows = WarehouseOps.LatestSnapshot.run(spark, sf).collect()
    val keys = rows.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.distinct.length == keys.length, "key uniqueness")
    val expected = graft.Graft.table(spark, sf, "events")
      .select("user_id", "event_type").distinct().count()
    assert(rows.length == expected)
  }

  test("merge upsert: result keys = base − deletes + inserts; updates " +
    "double the price; kept rows untouched") {
    import graft.functions.PortableHash.md5Hex
    val orig = graft.Graft.table(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bucket = (k: Long) =>
      java.lang.Long.parseLong(md5Hex(k.toString).take(15), 16) % 10
    val out = WarehouseOps.MergeUpsert.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    val keys = out.map(_._1)
    assert(keys.distinct.length == keys.length, "merge output key uniqueness")
    val expectedKeys = orig.keySet.filter(k => bucket(k) != 7)
    assert(keys.toSet == expectedKeys, "deletes removed, inserts present")
    out.foreach { case (k, price, status) =>
      val expectedStatus = bucket(k) match {
        case 6 => "update"
        case 8 | 9 => "insert"
        case _ => "kept"
      }
      assert(status == expectedStatus, s"key $k bucket ${bucket(k)}: $status")
      val expectedPrice =
        if (status == "kept") orig(k) else orig(k) * 2
      assert(price == expectedPrice, s"key $k price $price != $expectedPrice")
    }
  }

  test("large orders: exactly the orders above the quantity threshold, " +
    "with the true quantity sum") {
    import org.apache.spark.sql.functions._
    val truth = graft.Graft.table(spark, sf, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(27,6)")).cast("double").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = WarehouseOps.LargeOrders.run(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    val expected = truth.filter(_._2 > 200.0)
    assert(out.length == expected.size, s"${out.length} vs ${expected.size}")
    out.foreach { case (ok, sq) =>
      assert(expected.get(ok).contains(sq), s"order $ok sum $sq") }
    assert(out.map(_._1).toSeq == out.map(_._1).sorted.toSeq)
  }

  test("dormant customers: only above-average balances with no recent " +
    "orders are counted, grouped under their nation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dormant_spec").toString
    // balances: avg of positives = (100+200+300+400)/4 = 250
    // c1 bal 400 no orders at all → dormant, above avg → counted
    // c2 bal 300 only an OLD order  → dormant, above avg → counted
    // c3 bal 200 no recent orders   → dormant but below avg → dropped
    // c4 bal 100 has a recent order → not dormant → dropped
    Seq((1L, "c1", 0L, 400.0, "A"), (2L, "c2", 0L, 300.0, "A"),
      (3L, "c3", 1L, 200.0, "B"), (4L, "c4", 1L, 100.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val old = java.sql.Timestamp.valueOf("1997-06-01 00:00:00")
    val recent = java.sql.Timestamp.valueOf("1998-06-01 00:00:00")
    Seq((10L, 2L, "O", 1.0, old, "x"), (11L, 4L, "O", 1.0, recent, "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((0L, "ALPHA", 0L), (1L, "BETA", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    val out = WarehouseOps.DormantCustomers.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("ALPHA", 2L, 700.0)), s"${out.toSeq}")
  }

  test("incremental aggregate merge equals the one-shot full aggregate") {
    val merged = WarehouseOps.IncrAgg.run(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
    val full = graft.Graft.table(spark, sf, "events")
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)), sum("c"), min("c"), max("c"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
    assert(merged.toMap == full.toMap, "merge law must be exact")
    assert(merged.map(_._1).toSeq == merged.map(_._1).sorted.toSeq)
  }

  test("promo share: crafted months give exact shares") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("promo_spec").toString
    Seq((1L, "pa", "B1", "PROMO", 1, 1.0), (2L, "pb", "B1", "STANDARD", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    val jan = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val feb = java.sql.Timestamp.valueOf("2024-02-15 00:00:00")
    // Jan: promo 100, other 300 → 25%; Feb: promo only → 100%
    Seq((1L, 1L, 1L, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", jan),
      (2L, 2L, 1L, 1, 1.0, 300.0, 0.0, 0.0, "N", "O", jan),
      (3L, 1L, 1L, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", feb))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = WarehouseOps.PromoShare.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("2024-01", 100.0, 400.0, 25.0),
      ("2024-02", 50.0, 50.0, 100.0)), s"${out.toSeq}")
  }

  test("order priority: EXISTS counts each order once regardless of how " +
    "many late lines it has") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prio_spec").toString
    val d0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val late = java.sql.Timestamp.valueOf("2024-03-15 00:00:00") // +74d
    val onTime = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    Seq((1L, 1L, "O", 1.0, d0, "1-URGENT"), (2L, 1L, "O", 1.0, d0, "1-URGENT"),
      (3L, 1L, "O", 1.0, d0, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // order 1: TWO late lines (counted once); order 2: on time; order 3: late
    Seq((1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (1L, 1L, 1L, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
      (2L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", onTime),
      (3L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = WarehouseOps.OrderPriority.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("1-URGENT", 1L), ("2-HIGH", 1L)), s"${out.toSeq}")
  }

  test("small-qty revenue: integer threshold picks exactly the below-20% rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("smallqty_spec").toString
    val d = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // part 1: qtys 1,10,10,10 → Σq=31, n=4; row q=1: 5·1·4=20 < 31 ✓
    //   row q=10: 5·10·4=200 ≥ 31 ✗. part 2: single row (q=7: 35·1 ≥ 7 ✗)
    Seq((1L, 1L, 1L, 1, 1.0, 111.0), (2L, 1L, 1L, 1, 10.0, 1.0),
      (3L, 1L, 1L, 1, 10.0, 1.0), (4L, 1L, 1L, 1, 10.0, 1.0),
      (5L, 2L, 1L, 1, 7.0, 999.0))
      .map { case (ok, pk, sk, ln, q, ep) =>
        (ok, pk, sk, ln, q, ep, 0.0, 0.0, "N", "O", d) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = WarehouseOps.SmallQtyRevenue.run(spark, dir).collect().head
    assert(out.getLong(0) == 1L && out.getDouble(1) == 111.0, s"$out")
  }

  test("nation trade: same-nation flows are excluded, cross flows exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trade_spec").toString
    val d = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((0L, "ALPHA", 0L), (1L, "BETA", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1L, "s1", 0, 0.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, "c_alpha", 0, 0.0, "M"), (2L, "c_beta", 1, 0.0, "M"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((10L, 1L, "O", 1.0, d, "x"), (11L, 2L, "O", 1.0, d, "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // order 10 → same-nation customer (dropped); order 11 → cross (kept):
    // revenue 200·(1−0.1) + 50·(1−0) = 230
    Seq((10L, 1L, 1L, 1, 1.0, 999.0, 0.0), (11L, 1L, 1L, 1, 1.0, 200.0, 0.1),
      (11L, 1L, 1L, 2, 1.0, 50.0, 0.0))
      .map { case (ok, pk, sk, ln, q, ep, disc) =>
        (ok, pk, sk, ln, q, ep, disc, 0.0, "N", "O", d) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = WarehouseOps.NationTrade.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("ALPHA", "BETA", 2L, 230.0)), s"${out.toSeq}")
  }
}
