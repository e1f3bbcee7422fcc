package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared bucket-pruned positional select (r14) — the `q_weighted_median`
  * two-phase decomposition generalized to every "value at rank r(n) per
  * group" query (`q_median_price`, `q_quartiles`, `q_mad_outliers`).
  *
  * The retired shape ranked EVERY row with `row_number()` over a
  * per-group window — at 3–5 groups that is 3–5 tasks each sorting a
  * table-sized partition at any scale, the one window shape that cannot
  * scale out. The decomposition:
  *
  *   1. bucket the order key MONOTONICALLY (cents div 16384 — rounding
  *      is monotone, so v < v' ⇒ bkt ≤ bkt'; ties share a bucket) and
  *      count rows per (grp, bkt): one map-side-combinable exchange of a
  *      few thousand rows, whatever the table size;
  *   2. prefix-sum the tiny bucket frame per group (b_off, n) and locate,
  *      for each requested rank r(n), the unique bucket with
  *      b_off < r ≤ b_off + cnt;
  *   3. re-scan, keep only rows of selected buckets (broadcast semi-join
  *      of a handful of (grp, bkt) pairs), rank WITHIN those buckets, and
  *      pick rn_global = b_off + rn_local = r.
  *
  * Global rank under (v asc, tb asc) equals b_off + within-bucket rank
  * because the bucket map is monotone in v — every row of an earlier
  * bucket precedes every row of a later one, and rows tied across the
  * boundary cannot exist (equal v ⇒ equal bucket). The tiebreak `tb`
  * must be unique per group for `row_number` determinism, exactly as the
  * retired windows required. Selected values are therefore bit-identical
  * to the full-sort spelling (RankSelectSpec differentials both paths on
  * randomized frames).
  */
object RankSelect {

  private val BucketWidth = 16384L

  /** Rows at requested per-group ranks.
    *
    * @param rows     frame with `grp` (group key), `v` (double order key),
    *                 `tb` (unique-per-group long tiebreak)
    * @param targets  n (group row count, long) → array<struct<tag string,
    *                 r long>> of requested ranks; a rank outside [1, n]
    *                 simply emits no row (no bucket contains it)
    * @param bucketOf monotone long bucketing of the order key (v ≤ v' ⇒
    *                 bucketOf(v) ≤ bucketOf(v')); defaults to
    *                 money-cents / 16384 (≈ $164 bands) for raw money
    *                 doubles. Pass a direct integer banding when v is
    *                 already an exact integer-valued double.
    * @return one row per (grp, tag) whose rank exists: (grp, tag, r, v, n)
    */
  def select(rows: DataFrame, targets: Column => Column,
      bucketOf: Option[Column => Column] = None): DataFrame = {
    val withB = bucketOf match {
      case Some(f) => rows.withColumn("bkt", f(col("v")))
      case None => rows
        .withColumn("c_tmp",
          graft.plans.DecimalExpressions.money_cents(col("v")))
        .withColumn("bkt", expr(s"c_tmp div $BucketWidth"))
        .drop("c_tmp")
    }
    val bOff = withB.groupBy("grp", "bkt")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("b_off", coalesce(sum(col("cnt")).over(
        Window.partitionBy("grp").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("grp")))
    val tgt = bOff
      .select(col("grp"), col("bkt"), col("b_off"), col("cnt"), col("n"),
        explode(targets(col("n"))).as("t"))
      .filter(col("t.r") > col("b_off") && col("t.r") <= col("b_off") + col("cnt"))
      .select(col("grp"), col("bkt"), col("b_off"), col("n"),
        col("t.tag").as("tag"), col("t.r").as("r"))
    val selBkts = tgt.select("grp", "bkt", "b_off").distinct()
    val ranked = withB
      .join(broadcast(selBkts), Seq("grp", "bkt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp", "bkt")
          .orderBy(col("v").asc, col("tb").asc)) + col("b_off"))
    ranked.join(broadcast(tgt.select(col("grp").as("t_grp"), col("tag"),
          col("r"), col("n"))),
        col("grp") === col("t_grp") && col("rn") === col("r"))
      .select(col("grp"), col("tag"), col("r"), col("v"), col("n"))
  }
}
