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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")

    val K = graft.text.TextOps.Contamination.K
    val W = graft.text.TextOps.Contamination.W
    def docs = graft.Graft.fanOutSmallScan(
        graft.Graft.table(spark, sfDir, "documents"))
      .select(col("source"),
        regexp_replace(lower(trim(col("text"))), "[^ -~]", "")
          .cast("binary").as("t"))
    def fpsRaw = docs.select(col("source"),
      explode(graft.plans.WinnowExpression.winnow_fps(col("t"), K, W)).as("fp"))
    def tail(grouped: DataFrame) = grouped
      .filter(size(col("srcs")) >= 2)
      .select(col("fp"), explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("fp"), col("src_a"), explode(col("srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared_fps"))
      .orderBy("src_a", "src_b")
    def cur = tail(fpsRaw.distinct()
      .groupBy("fp").agg(collect_set(col("source")).as("srcs")))
    def alt = tail(fpsRaw
      .groupBy("fp").agg(collect_set(col("source")).as("srcs")))
    time("warmup cur")(noop(cur))
    for (r <- 1 to 2) {
      time(s"r$r cur (distinct + collect_set)")(noop(cur))
      time(s"r$r alt (collect_set only)")(noop(alt))
    }
    // equality check
    val a = cur.collect().map(_.toString).toSeq
    val b = alt.collect().map(_.toString).toSeq
    println("[scratch] results equal: " + (a == b))
    spark.stop()
  }
}
