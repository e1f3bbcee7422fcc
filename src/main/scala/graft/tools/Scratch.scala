package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

    val fullQ = graft.SparkEntry.queries("q_bucketed_join")
    time("warmup full")(noop(fullQ(spark, sfDir)))
    for (rep <- 1 to 2) time(s"r$rep full")(noop(fullQ(spark, sfDir)))
    // written table sizes under the projection
    Seq("graft_bjoin_orders", "graft_bjoin_customer").foreach { tb =>
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tb)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sz = fs.getContentSummary(loc).getLength
      println(s"[scratch] $tb bytes: $sz")
    }
    // the readout plan over the bucketed tables (the query's final frame is
    // a localCheckpoint, which hides this — dump it directly)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.table("graft_bjoin_orders")
      .join(spark.table("graft_bjoin_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.SafeMath.exactSum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")
      .explain("formatted")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.stop()
  }
}
