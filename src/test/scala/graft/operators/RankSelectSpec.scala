package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankSelectSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  /** The retired full-sort spelling, kept verbatim as the reference. */
  private def referenceSelect(rows: org.apache.spark.sql.DataFrame,
      ranks: Seq[(String, String)]) = {
    val w = Window.partitionBy("grp").orderBy(col("v").asc, col("tb").asc)
    val ranked = rows.select(col("grp"), col("v"), col("tb"),
      row_number().over(w).as("rn"),
      count(lit(1)).over(Window.partitionBy("grp")).as("n"))
    ranks.map { case (tag, rExpr) =>
      ranked.filter(col("rn") === expr(rExpr))
        .select(col("grp"), lit(tag).as("tag"), expr(rExpr).as("r"),
          col("v"), col("n"))
    }.reduce(_ unionAll _)
  }

  test("bucket-pruned select ≡ full-sort row_number on randomized frames") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    // groups of wildly different sizes incl. size-1 and size-2 corners,
    // duplicate values (ties broken by tb), negative values, and values
    // straddling the 16384-cent bucket boundary
    val rows = (0 until 6).flatMap { g =>
      val size = Seq(1, 2, 3, 50, 500, 4000)(g)
      Seq.tabulate(size) { i =>
        val v = rnd.nextInt(8) match {
          case 0 => 163.84 * rnd.nextInt(5) // exact bucket boundaries
          case 1 => -(rnd.nextDouble() * 1000)
          case 2 => rnd.nextInt(10).toDouble // heavy ties
          case _ => rnd.nextDouble() * 600000 - 1000
        }
        (s"g$g", v, i.toLong)
      }
    }
    val df = rows.toDF("grp", "v", "tb")
    val ranks = Seq(
      ("med", "(n + 1) div 2"),
      ("q1", "greatest(1, ((n + 1) * 1) div 4)"),
      ("q3", "greatest(1, ((n + 1) * 3) div 4)"),
      ("first", "1"), ("last", "n"))
    val got = RankSelect.select(df, n => array(ranks.map { case (tag, r) =>
        struct(lit(tag).as("tag"), expr(r).as("r")) }: _*))
      .select("grp", "tag", "r", "v", "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    val ref = referenceSelect(df, ranks)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(got == ref)
    assert(got.size == 6 * ranks.size) // every (group, tag) present exactly once
  }

  test("custom integer bucketing ≡ full sort; out-of-range ranks emit nothing") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (0 until 3).flatMap { g =>
      Seq.tabulate(200 + g) { i => (s"g$g", rnd.nextInt(40000).toDouble, i.toLong) }
    }
    val df = rows.toDF("grp", "v", "tb")
    val ranks = Seq(("med", "(n + 1) div 2"), ("past", "n + 1"))
    val got = RankSelect.select(df, n => array(ranks.map { case (tag, r) =>
        struct(lit(tag).as("tag"), expr(r).as("r")) }: _*),
        bucketOf = Some(v => expr("CAST(v AS BIGINT) div 1000")))
      .select("grp", "tag", "r", "v", "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    val ref = referenceSelect(df, Seq(("med", "(n + 1) div 2")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(got == ref) // the rank-past-n target contributes no rows
    assert(got.size == 3)
  }
}
