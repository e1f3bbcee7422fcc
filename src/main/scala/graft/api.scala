package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the unit the driver verifies (DuckDB oracle) and
  * benches. `oracle` is equivalent ANSI SQL runnable by DuckDB over the same
  * parquet tables; None ⇒ the op is not SQL-expressible (driver falls back to
  * a rows-only check) and must be covered by a ScalaTest spec instead.
  *
  * Determinism contract (the driver hash-compares result sets):
  *   - every query ends in an ORDER BY over a unique key prefix;
  *   - double-valued aggregates go through [[graft.functions.SafeMath]] so the
  *     result is bit-identical regardless of accumulation order;
  *   - column names are aliased identically here and in `oracle`.
  */
trait GraftQuery {
  def name: String
  def run(spark: SparkSession, sfDir: String): DataFrame
  def oracle: Option[String]
}
