package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Source/sink compatibility layer (SURVEY §2.1).
  *
  * The reference's on-disk interchange is header'd `;`-separated CSV
  * everywhere (`pyspark_stats.py:22-24`, `pyspark_yolox.py:138-140`); our
  * engine is Parquet-first (columnar, predicate pushdown, schema'd) and
  * keeps the CSV dialect as a compat boundary.
  */
object Sources {

  /** S2 — the reference's CSV dialect: header, `;` separator. */
  def readSemicolonCsv(spark: SparkSession, path: String,
      configure: DataFrameReader => DataFrameReader = identity): DataFrame =
    configure(spark.read.option("header", "true").option("sep", ";")).csv(path)

  /** S3 — CSV sink in the same dialect, overwrite mode
    * (`df.write.csv(mode="overwrite", header=True, sep=";")`).
    */
  def writeSemicolonCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").option("sep", ";").csv(path)

  /** S4 — single-file sink: the reference collapsed small summaries to one
    * file via `coalesce(1)` (`pyspark_stats.py:51-52`). Kept only for tiny
    * final aggregates — a deliberate anti-pattern at scale, documented as
    * such.
    */
  def writeSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("sep", ";").csv(path)

  /** I4 — Parquet checkpoint between pipeline stages (replaces the
    * reference's `--cached-pred` re-read toggle, `pyspark_yolox.py:115-119`).
    */
  def checkpoint(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
