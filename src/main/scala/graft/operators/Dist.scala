package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for partitionless window operations.
  *
  * A `Window.orderBy(...)` with no `partitionBy` moves the whole frame to a
  * single task — fine for a provably-bounded frame (a bucket index, a
  * top-K head), fatal for a data-sized one (vocabulary ranks, per-user
  * ranks at 100 TB). The helpers here keep those operations exact while
  * staying distributed:
  *
  *   - [[globalRowNumber]]: range-partition on the sort key, number rows
  *     within each partition, then add per-partition offsets computed from
  *     a partition-count frame that is at most `numPartitions` rows. Equal
  *     sort keys land in the same range partition, so the tiebreak inside
  *     the partition is globally correct; `repartitionByRange` samples with
  *     a fixed seed, so the result is deterministic for a given input.
  *
  *   - [[globalNtile]]: `ntile(k)` re-derived from the global row number
  *     and the total count via ntile's front-loaded-remainder law
  *     (first `n mod k` buckets get `n div k + 1` rows) — integer math,
  *     bit-identical to the single-partition `ntile`.
  */
object Dist {

  /** Partition key for a window over a PROVABLY BOUNDED frame that is
    * single-partition BY DESIGN (bucket offsets: n/B rows; top-K heads;
    * replica counts). Partitions by `pmod(anchor, 1)` — constant 0 for
    * every non-null row, but non-reducible, so the audit marker survives
    * to the physical plan: a foldable `lit(0)` is stripped by the
    * optimizer's window-partition elimination, and even `anchor * 0` is
    * simplified away once a Project collapse exposes it — the WindowExec
    * then runs partitionless (warns "No Partition Defined"),
    * indistinguishable from an UNAUDITED global window. `anchor` must be
    * a numeric column of the frame (use the bucket/rank key); a null
    * anchor is coalesced to 0 so nullable anchors cannot silently split
    * the single-partition-by-design frame into a null partition plus
    * partition 0 and corrupt prefix computations.
    */
  def boundedOne(anchor: Column): Column =
    coalesce(pmod(anchor, lit(1)), lit(0))

  /** Exact global `row_number()` (1-based, LONG) under `order`, written to
    * column `out`, without a data-sized single-partition sort. `order`
    * must be a TOTAL order (include a unique tiebreak) — the same
    * requirement a deterministic `row_number` has anyway.
    *
    * Shape: ONE range shuffle + local sort, then
    * `monotonically_increasing_id` reads off (partitionId << 33 |
    * in-partition index) directly — no second exchange for a
    * `partitionBy(_pid)` window. Partition offsets come from a
    * `parts`-row aggregate (map-side combined) prefix-summed under a
    * [[boundedOne]] marker and broadcast back. Equal range keys land in
    * one partition and the local sort finishes the total order, so the
    * global numbering is exact; `repartitionByRange` samples with a
    * fixed seed, so reruns are deterministic. Persists the sorted frame
    * (two consumers); callers run under the harness's per-query
    * `clearCache`.
    */
  def globalRowNumber(df: DataFrame, out: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.getOption("spark.sql.shuffle.partitions")
      .map(_.toInt).getOrElse(32)
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("_mid"), 33)
    val local = col("_mid").bitwiseAND(lit((1L << 33) - 1))
    val offs = ranged.select(pid.as("_pid")).groupBy("_pid")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(sum(col("_cnt")).over(
        Window.partitionBy(boundedOne(col("_pid"))).orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_off")
    ranged
      .withColumn("_pid", pid)
      .join(broadcast(offs), "_pid")
      .withColumn(out, col("_off") + local + lit(1L))
      .drop("_pid", "_mid", "_off")
  }

  /** Exact `ntile(buckets)` under `order` as column `out` (INT), derived
    * from [[globalRowNumber]]: with `n` total rows, the first `n mod k`
    * buckets hold `n div k + 1` rows and the rest `n div k`.
    */
  def globalNtile(df: DataFrame, buckets: Int, out: String, order: Column*): DataFrame = {
    val rn = globalRowNumber(df, "_gnt_rn", order: _*)
    val tot = rn.agg(count(lit(1)).as("_gnt_n"))
    // All arithmetic stays in LONG (`div`, not double divide-then-cast):
    // double division loses exactness past 2^53, undercutting the
    // bit-identical-at-any-corpus-size claim for extreme row counts.
    // `when` branches evaluate lazily, so the `div _gnt_small` branch is
    // never reached with _gnt_small = 0 (that needs r > n).
    rn.crossJoin(broadcast(tot))
      .withColumn("_gnt_small", expr(s"_gnt_n div ${buckets}L"))
      .withColumn("_gnt_big", col("_gnt_small") + lit(1L))
      .withColumn("_gnt_nbig", col("_gnt_n").mod(lit(buckets.toLong)))
      .withColumn(out,
        when(col("_gnt_rn") <= col("_gnt_big") * col("_gnt_nbig"),
          expr("(_gnt_rn - 1L) div _gnt_big") + lit(1L))
          .otherwise(col("_gnt_nbig") +
            expr("(_gnt_rn - _gnt_big * _gnt_nbig - 1L) div _gnt_small") + lit(1L))
          .cast("int"))
      .drop("_gnt_rn", "_gnt_n", "_gnt_small", "_gnt_big", "_gnt_nbig")
  }
}
