package graft.plans

import graft.SparkSpec

/** SQL-surface registration. Uses the shared session + runtime `register`
  * (building a second SparkSession here would stop the JVM-wide context
  * under the other suites; the builder hook is the same injection code).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("quantize_vec / dot_long usable from SQL after registration") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((Seq(0.1f, 0.2f), Seq(0.3f, 0.4f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val got = spark.sql(
      "SELECT dot_long(quantize_vec(a), quantize_vec(b)) AS d FROM vecs")
      .head().getLong(0)
    assert(got == 100000L * 300000L + 200000L * 400000L)
  }
}
