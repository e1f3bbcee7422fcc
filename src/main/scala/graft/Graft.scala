package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + catalog helpers for the graft engine.
  *
  * The engine is DataFrame-first: every operator is a function
  * `DataFrame => DataFrame` (or a small composition of them) so Catalyst sees
  * the whole plan and can push filters/prune columns/choose join strategies.
  * Nothing here drops to RDDs except the image surface (see
  * [[graft.images]]), mirroring the design stance of SURVEY.md §7.
  */
object Graft {

  /** Build a local session tuned for the test harness. On a real cluster the
    * caller owns the builder; only the confs below are engine-relevant.
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one of the star-schema tables under a scale-factor directory.
    * Parquet-first (columnar, pushdown-friendly); see [[graft.sources]] for
    * the CSV compat source the reference used.
    *
    * `events.ts` has been written by the generator as both Parquet
    * TIMESTAMP(NANOS) (which Spark reads as a nanos long under
    * `nanosAsLong`) and TIMESTAMP(MICROS) (which Spark reads as
    * TIMESTAMP_NTZ). The engine's temporal operators all run on integer
    * epoch-nanos math — the same contract as the DuckDB `epoch_ns(ts)`
    * oracles — so normalize here, at the single read point, to a
    * nanos-since-epoch LONG regardless of the physical encoding. UTC
    * session timezone (set in [[session]]) makes the NTZ→timestamp cast
    * exact.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** `ts` → nanos-since-epoch LONG, whatever the source type. Timestamp
    * inputs carry micro precision, so `unix_micros * 1000` is lossless.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) | None => df
      case Some(_) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }

  /** Every table of the engine's star-schema catalog. */
  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register the whole catalog as temp views, opening the plain
    * `spark.sql(...)` surface over the same data every [[GraftQuery]]
    * reads — the reference had no SQL at all; a migrating user gets ANSI
    * SQL (plus every registered engine function) for free from Catalyst.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))

  /** Fan a small scan out across the cluster before compute-dense per-row
    * work (sketch hashing, fingerprinting — 100s of md5 calls per row).
    *
    * Why: parquet parallelism is bounded by ROW GROUPS, not split planning —
    * a compacted file scans as one non-empty task per row group no matter
    * how many byte-range splits the planner schedules, so the map side of
    * a compacted corpus serializes onto a few cores (the reference hit the
    * same with `binaryFiles` and forced `MIN_PARTITIONS=8`,
    * `pyspark_yolox.py:128-130`).
    *
    * Gate: repartition while the input could not keep `defaultParallelism`
    * cores busy for even one wave of row-group-sized partitions
    * (`sizeInBytes < parallelism × maxPartitionBytes`) — shuffling at most
    * one wave of data is bounded-cheap next to the md5-dense compute it
    * parallelizes, and covers both the single-file case and a corpus
    * compacted into a few large-row-group files. Inputs past that scale
    * carry enough row groups to split naturally: no shuffle is added.
    * (`sizeInBytes` is compressed bytes vs the uncompressed row-group
    * target — the gate errs toward fanning out, which is the cheap side.)
    */
  def fanOutSmallScan(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism
    val maxPartitionBytes = spark.conf
      .getOption("spark.sql.files.maxPartitionBytes")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(128L * 1024 * 1024)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(parallelism.toLong) * maxPartitionBytes)
      df.repartition(parallelism)
    else df
  }

  /** Nanos-since-epoch long column → TimestampType (micro precision).
    * Integer `div` — a double round-trip would lose sub-ms precision at
    * 2024-epoch magnitudes (~1.7e18 ns vs 2^53 mantissa).
    */
  def tsFromNanos(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr(s"`$colName` div 1000"))
}
