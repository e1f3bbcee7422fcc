package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only sub-stage timing probe (guide §1: measure first). */
object Scratch {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val fullQ = graft.SparkEntry.queries("q_weighted_median")
    time("warmup full")(noop(fullQ(spark, sfDir)))
    for (rep <- 1 to 2) {
      val perVal = graft.Graft.table(spark, sfDir, "lineitem")
        .select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"),
          col("l_quantity").cast("long").as("w"))
        .groupBy("l_returnflag", "v").agg(sum(col("w")).as("wv"))
        .withColumn("bkt", expr("v div 16384"))
      time(s"r$rep perVal agg")(noop(perVal))
      val bSums = perVal.groupBy("l_returnflag", "bkt")
        .agg(sum(col("wv")).as("bw"))
      time(s"r$rep bSums")(noop(bSums))
      time(s"r$rep full")(noop(fullQ(spark, sfDir)))
    }
    spark.stop()
  }
}
