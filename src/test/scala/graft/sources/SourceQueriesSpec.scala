package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink semantics not visible to the oracle hash-match: the
  * partitioned layout's PLAN guarantee — the source filter must prune at
  * the directory level, before any data file is opened. (The generic
  * pruning mechanism is also covered in ScaleSpec; this pins the query's
  * own layout.)
  */
class SourceQueriesSpec extends SparkSpec {

  test("partitioned roundtrip: the re-read scan prunes excluded source " +
    "directories and matches the unpartitioned filter") {
    val out = SourceQueries.PartitionedRoundtrip.run(spark, sf).collect()
    assert(out.nonEmpty)
    // the run above wrote the layout; re-open it the way the query does
    val safe = sf.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_hivepart_$safe",
      "documents").toString
    val pruned = spark.read.parquet(dir)
      .filter(col("source").isin("src1", "src2"))
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("source"),
      s"no partition filter in:\n$plan")
    // every file actually read at execution lives under a kept directory
    val scanned = pruned.select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0))
    assert(scanned.nonEmpty)
    assert(scanned.forall(p =>
      p.contains("source=src1") || p.contains("source=src2")),
      scanned.take(3).mkString(", "))
    // row parity with the same filter on the original table
    val expected = graft.Graft.table(spark, sf, "documents")
      .filter(col("source").isin("src1", "src2")).count()
    assert(pruned.count() == expected && expected > 0)
  }
}
