package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        println(f"$n run $i: ${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    spark.stop()
  }
}
