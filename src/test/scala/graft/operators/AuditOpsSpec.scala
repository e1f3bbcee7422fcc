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
}
