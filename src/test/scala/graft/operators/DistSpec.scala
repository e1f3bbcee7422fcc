package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential proofs for [[Dist]]: the distributed two-phase rank and
  * ntile must be bit-identical to the single-partition window versions on
  * frames with ties, uneven bucket remainders, and empty partitions.
  */
class DistSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // ties in the order key (n repeats), n mod k != 0 sizes
    (1 to 103).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "n")
  }

  test("globalRowNumber ≡ row_number over a global window (ties included)") {
    val df = fixture
    val got = Dist.globalRowNumber(df, "rk", col("n").desc, col("id").asc)
      .select(col("id"), col("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select(col("id"),
        row_number().over(Window.partitionBy(lit(0))
          .orderBy(col("n").desc, col("id").asc)).cast("long").as("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("globalNtile ≡ ntile for k ∤ n (front-loaded remainder law)") {
    val df = fixture
    for (k <- Seq(4, 10, 13)) {
      val got = Dist.globalNtile(df, k, "d", col("n").asc, col("id").asc)
        .select(col("id"), col("d"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df.select(col("id"),
          ntile(k).over(Window.partitionBy(lit(0))
            .orderBy(col("n").asc, col("id").asc)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"k=$k")
      spark.catalog.clearCache()
    }
  }

  test("globalRowNumber is dense 1..N and deterministic across reruns") {
    val df = fixture
    val a = Dist.globalRowNumber(df, "rk", col("n").asc, col("id").asc)
      .select("rk").collect().map(_.getLong(0)).sorted
    spark.catalog.clearCache()
    val b = Dist.globalRowNumber(df, "rk", col("n").asc, col("id").asc)
      .select("rk").collect().map(_.getLong(0)).sorted
    spark.catalog.clearCache()
    assert(a.toSeq == (1L to 103L) && b.toSeq == a.toSeq)
  }
}
