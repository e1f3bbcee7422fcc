package graft.operators

import graft.SparkSpec

/** Properties of the layout/pruning operators: the Bloom filter's
  * no-false-negative guarantee and measured false-positive rate, and the
  * Z-order key's bijectivity + locality.
  */
class LayoutOpsSpec extends SparkSpec {

  test("bloom filter: no false negatives, bounded false positives") {
    val r = LayoutOps.BloomFilter.run(spark, sf).collect().head
    val (probes, cands, trueMem, falsePos) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // every true member must pass the filter: at sf0.001 supplier keys
    // {1..10} are a subset of customer keys {1..150}, so the overlap is
    // the full supplier key set
    val expectTrue = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
      .intersect(spark.read.parquet(s"$sf/customer.parquet")
        .select("c_custkey").collect().map(_.getLong(0)).toSet)
    assert(trueMem == expectTrue.size.toLong,
      s"false negative: $trueMem of ${expectTrue.size} members passed")
    assert(cands == trueMem + falsePos)
    // m=4096 bits, k=3, n=|supplier|: expected fp rate ~(nk/m)^3 — allow
    // a generous ceiling; the exact count is pinned by the DuckDB oracle
    assert(falsePos.toDouble / probes.toDouble < 0.05,
      s"false-positive rate ${falsePos.toDouble / probes} out of spec")
  }

  test("z-order key is a bijection on the 16-bit domain and clusters both dims") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pts = (0 until 256).flatMap(x => Seq((x.toLong, (255 - x).toLong)))
      .toDF("x", "y")
    val zExpr = (0 until 8).flatMap { i =>
      Seq(s"shiftleft(shiftright(x, $i) & 1, ${2 * i})",
        s"shiftleft(shiftright(y, $i) & 1, ${2 * i + 1})")
    }.mkString(" + ")
    val z = pts.select(col("x"), col("y"), expr(zExpr).as("z"))
    // distinct inputs → distinct keys (interleave is injective)
    assert(z.select("z").distinct().count() == 256)
    // reference value: interleave(x=3 (0b11), y=1 (0b01)) = 0b0111 = 7
    val ref = Seq((3L, 1L)).toDF("x", "y").select(expr(zExpr)).head.getLong(0)
    assert(ref == 7L, s"interleave(3,1) = $ref, want 7")
    // locality: within any 1024-wide z bucket, both coordinate spans are
    // bounded by 2^5 = 32 (5 of each dim's bits vary inside 10 z bits)
    val spans = LayoutOps.ZOrder.run(spark, sf).collect()
    spans.foreach { r =>
      assert(r.getLong(5) - r.getLong(4) <= 31, s"x span too wide: $r")
      assert(r.getLong(7) - r.getLong(6) <= 31, s"y span too wide: $r")
    }
  }

  test("zone maps: sorted layout prunes, natural layout cannot; chunks partition the table") {
    val rows = LayoutOps.ZoneMapPrune.run(spark, sf).collect()
    val byLayout = rows.groupBy(_.getAs[String]("layout"))
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    for ((_, chunks) <- byLayout)
      assert(chunks.map(_.getAs[Long]("n_rows")).sum == total)
    def keptFrac(l: String) = {
      val c = byLayout(l)
      c.count(_.getAs[Int]("kept") == 1).toDouble / c.length
    }
    // random insertion order ⇒ every natural zone spans the predicate range
    assert(keptFrac("natural") == 1.0, "natural layout unexpectedly prunable")
    // date-sorted ⇒ kept fraction collapses toward the predicate selectivity
    assert(keptFrac("sorted") < 0.5,
      s"sorted layout kept ${keptFrac("sorted")} — zone maps not selective")
    // sorted zones are disjoint in date (true clustering, boundaries aside):
    // each chunk's min must be >= the previous chunk's min
    val sortedZones = byLayout("sorted").sortBy(_.getAs[Long]("chunk"))
    val mins = sortedZones.map(_.getAs[java.sql.Date]("min_d").toLocalDate)
    assert(mins.zip(mins.tail).forall { case (a, b) => !b.isBefore(a) })
  }

  test("compaction plan: bins are contiguous, conserve bytes, and respect the greedy rule") {
    import org.apache.spark.sql.functions._
    val bins = LayoutOps.CompactionPlan.run(spark, sf).collect()
    val files = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(expr("doc_id div 20").as("f")).agg(sum("n_chars").as("b"))
      .collect().map(r => r.getAs[Long]("f") -> r.getAs[Long]("b")).toMap
    // conservation: every file lands in exactly one bin
    assert(bins.map(_.getAs[Long]("n_files")).sum == files.size.toLong)
    assert(bins.map(_.getAs[Long]("total_bytes")).sum == files.values.sum)
    // contiguity: file ranges tile without overlap in bin order
    val ranges = bins.sortBy(_.getAs[Long]("bin"))
      .map(r => (r.getAs[Long]("first_file"), r.getAs[Long]("last_file")))
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(lo2 == hi + 1, s"gap/overlap between bins at $hi -> $lo2")
    }
    // greedy rule: bin id = exclusive running sum div target
    var cum = 0L
    val expect = files.toSeq.sortBy(_._1).map { case (f, b) =>
      val bin = cum / 16384L; cum += b; f -> bin
    }.toMap
    val gotBins = bins.map(r => r.getAs[Long]("bin")).toSet
    assert(gotBins == expect.values.toSet)
  }
}
