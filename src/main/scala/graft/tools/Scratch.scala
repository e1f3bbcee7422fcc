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

    val L = 20
    def run(tag: String): Unit = {
      val docs = graft.Graft.table(spark, sfDir, "documents")
        .filter(length(col("text")) >= L)
        .select(col("doc_id"), col("text"))
      val shExch = docs.select(col("doc_id"), posexplode(
          graft.plans.CharGramsExpression.char_grams(col("text"), L)))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("s"))
        .repartition(col("s"))
      val dup = shExch.groupBy("s")
        .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
        .filter(col("d0") =!= col("d1"))
        .select("s")
      val marked = shExch.join(dup.hint("shuffle_hash"), Seq("s"), "left_semi")
        .select(col("doc_id"), col("pos"))
      val byPos = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val res = marked.withColumn("nxt", lead(col("pos"), 1).over(byPos))
        .groupBy("doc_id")
        .agg(sum(when(col("nxt").isNull || col("nxt") - col("pos") > L, 1L)
          .otherwise(0L)).as("n_spans"),
          sum(coalesce(least(col("nxt") - col("pos"), lit(L)), lit(L)))
            .cast("long").as("dup_chars"))
        .orderBy("doc_id")
      time(s"$tag full (exchange-once shape)")(noop(res))
      if (tag == "r1") { println("=== plan ==="); res.explain("formatted") }
    }
    run("warmup")
    run("r1"); run("r2")
    spark.stop()
  }
}
