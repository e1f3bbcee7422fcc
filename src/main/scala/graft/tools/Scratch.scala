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

    import spark.implicits._
    val docs = graft.Graft.table(spark, sfDir, "documents")
    def rawFeats = docs.select(col("doc_id"),
        when(col("source") === "src0", 1).otherwise(-1).as("y"),
        graft.text.TextOps.tokens(col("text")).as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(col("doc_id"), col("y"), explode(
        graft.plans.PortableHashExpression.bigram_feats(col("arr"), 2048L)).as("f"))
      .groupBy("doc_id", "y", "f")
      .agg(count(lit(1)).as("c"))
    val wDf = Seq((1L, 1L), (2L, -1L)).toDF("f", "w")
    def scored(feats: DataFrame) = feats
      .join(broadcast(wDf), Seq("f"), "left")
      .groupBy("doc_id", "y")
      .agg(sum(col("c") * coalesce(col("w"), lit(0L))).as("s"))
    println("===== BEFORE: epoch scored aggregate over (doc_id,y,f)-keyed feats =====")
    scored(rawFeats).explain("formatted")
    println("===== AFTER: epoch scored aggregate over repartition(doc_id) feats =====")
    scored(rawFeats.repartition(col("doc_id"))).explain("formatted")
    spark.stop()
  }
}
