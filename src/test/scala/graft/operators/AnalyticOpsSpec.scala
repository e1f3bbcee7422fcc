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
}
