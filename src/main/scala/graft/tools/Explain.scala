package graft.tools

import graft.SparkEntry

/** Dev tool: dump formatted physical plans for named queries (or all). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session("local[8]", 8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.registry.map(_.name)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
