package graft.operators

import graft.SparkSpec

/** Referential-integrity audit: planted-orphan detection on a crafted
  * fixture, plus the real-schema invariants (clean edges report zero, the
  * degraded edge reports the md5-half drop).
  */
class AuditOpsSpec extends SparkSpec {

  test("audit detects planted orphans with exact counts") {
    import spark.implicits._
    // children 1,2,2,3,9,9,9 against parents {1,2,3}: 4 orphan rows, 2 keys
    val child = Seq(1L, 2L, 2L, 3L, 9L, 9L, 9L, 8L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val r = AuditOps.OrphanAudit.audit("t", child, parent).collect().head
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_orphans") == 4L)
    assert(r.getAs[Long]("n_orphan_keys") == 2L)
    assert(r.getAs[Double]("orphan_ratio") == 0.5)
  }

  test("star-schema edges are clean; the degraded edge detects the half-drop") {
    val rows = AuditOps.OrphanAudit.run(spark, sf).collect()
      .map(r => r.getAs[String]("relation") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_orphans"))).toMap
    assert(rows.size == 5)
    for (rel <- Seq("lineitem->orders", "lineitem->part", "lineitem->supplier",
        "orders->customer")) {
      assert(rows(rel)._2 == 0L, s"$rel should be referentially clean")
      assert(rows(rel)._1 > 0L)
    }
    val (n, orphans) = rows("orders->customer_degraded")
    // the md5-half parent drop must surface a material orphan share
    assert(orphans > 0L && orphans < n,
      s"degraded edge: $orphans orphans of $n rows")
  }
  test("table checksum matches a driver-side recompute and ignores row order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("cksum_spec").toString
    val d = java.sql.Timestamp.valueOf("2024-03-05 12:00:00")
    val rows = Seq((3L, 30L, "O", 12.34, d, "1-URGENT"),
      (1L, 10L, "F", 0.01, d, "2-HIGH"), (2L, 20L, "O", 99.99, d, "3-LOW"))
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val out = AuditOps.TableChecksum.run(spark, dir).collect().head
    val expected = rows.map { case (ok, ck, st, p, _, pr) =>
      val canon = s"$ok|$ck|$st|${math.round(p * 100)}|2024-03-05 12:00:00|$pr"
      BigInt(graft.functions.PortableHash.md5Hex(canon).take(15), 16)
    }.sum
    assert(out.getLong(0) == 3L)
    assert(out.getString(1) == expected.toString, s"$out vs $expected")
    // order independence: a reversed copy checksums identically
    val dir2 = java.nio.file.Files.createTempDirectory("cksum_spec2").toString
    rows.reverse.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .repartition(3)
      .write.parquet(s"$dir2/orders.parquet")
    val out2 = AuditOps.TableChecksum.run(spark, dir2).collect().head
    assert(out2.getString(1) == out.getString(1))
  }

  test("id gap audit recovers the degraded keys as exact ranges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("gapaudit_spec").toString
    val d = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val keys = (0L until 3000L)
    keys.map(k => (k, k, "O", 1.0, d, "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // driver-side replay of the degradation + gap rule
    def p60(s: String) =
      BigInt(graft.functions.PortableHash.md5Hex(s).take(15), 16)
    val kept = keys.filter(k => p60(k.toString) % 97 != 0).toArray
    val expected = kept.zip(kept.tail).collect {
      case (a, b) if b > a + 1 => (a + 1, b - 1, b - a - 1)
    }.sortBy { case (s, _, n) => (-n, s) }.take(10)
    assert(expected.nonEmpty, "fixture must actually drop keys")
    val out = AuditOps.IdGapAudit.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(out.toSeq == expected.toSeq, s"got ${out.toSeq} want ${expected.toSeq}")
  }

  test("gdpr purge: residual is zero and deleted counts match the list") {
    import org.apache.spark.sql.functions._
    val out = AuditOps.GdprPurge.run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(4) == 0L, s"listed user survived the purge: $r")
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), s"conservation: $r")
    }
    // the deletion list is nonempty at this scale — the purge is exercised
    assert(out.map(_.getLong(3)).sum > 0L, "fixture must actually delete rows")
    // driver-side replay of the deletion rule
    def p60(s: String) =
      BigInt(graft.functions.PortableHash.md5Hex(s).take(15), 16)
    val expected = graft.Graft.table(spark, sf, "events")
      .select("user_id").collect().map(_.getLong(0))
      .count(u => p60(u.toString) % 13 == 0)
    assert(out.map(_.getLong(3)).sum == expected.toLong)
  }

  test("fanout histogram: classes partition orders and mass equals lineitems") {
    val out = AuditOps.FanoutHist.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val orders = graft.Graft.table(spark, sf, "orders").count()
    val lines = graft.Graft.table(spark, sf, "lineitem").count()
    assert(out.map(_._2).sum == orders, "histogram partitions the orders")
    assert(out.map { case (f, n) => f * n }.sum == lines,
      "fanout mass must equal the lineitem count")
  }

}
