package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers shared by every aggregate query.
  *
  * Two concerns drive this file:
  *
  * 1. '''÷0 → 0 semantics''' (reference: `pyspark_stats.py:91-94` guards every
  *    grouped average with `except ZeroDivisionError: 0`). Plain SQL division
  *    yields NULL/Inf instead; [[safeDiv]] pins the reference behavior.
  *
  * 2. '''Cross-engine determinism.''' Summing doubles is order-dependent in
  *    the last ulp, and the correctness gate hash-compares our results against
  *    DuckDB bit-for-bit. [[exactSum]] sums through `DECIMAL(27,6)` — exact,
  *    associative, order-independent — then casts the total back to double.
  *    Both engines round the same IEEE-754 double to the same decimal and
  *    convert the same decimal back to the same double, so results are
  *    bit-identical regardless of accumulation order. Divisions of two such
  *    exact doubles are single IEEE ops and therefore also deterministic.
  */
object SafeMath {

  /** Decimal wide enough for 100 TB-scale sums of ~1e7-magnitude measures:
    * 21 integer digits ≅ 1e21, far above any sum we can hit; 6 fractional
    * digits cover the 2-decimal money columns exactly.
    */
  private val SumDecimal = DecimalType(27, 6)

  /** Order-independent sum of a double column, returned as double. */
  def exactSum(c: Column): Column =
    // value-identical to sum(c.cast(DECIMAL(27,6))): the conversion runs
    // through the fast-path kernel ([[graft.plans.DecimalExpressions]],
    // proof + randomized differential there) — the toString-based cast
    // dominated every money aggregate
    sum(graft.plans.DecimalExpressions.double_to_decimal6(c)).cast("double")

  /** Order-independent average of a double column, returned as double.
    * Implemented as exact-sum / count so both engines perform one identical
    * IEEE division.
    */
  def exactAvg(c: Column): Column =
    exactSum(c) / count(c).cast("double")

  /** num / den, but 0.0 (not NULL, not Inf, not NaN) when den is 0 or NULL —
    * the reference's ZeroDivisionError guard.
    */
  def safeDiv(num: Column, den: Column): Column =
    coalesce(try_divide(num, when(den === lit(0), lit(null)).otherwise(den)), lit(0.0))
}
