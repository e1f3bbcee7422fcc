package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecimalExpressionsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("double_to_decimal6 ≡ cast(decimal(27,6)) on adversarial doubles") {
    import spark.implicits._
    val rnd = new scala.util.Random(276)
    val adversarial = Seq(
      0.0, -0.0, 1e-7, -1e-7, 1e-6, 0.1, 0.05, 0.015, 0.125, 0.1234565,
      0.12345649999999999, 0.9999995, 0.99999949999, 123456.7890123,
      1e9 - 0.0000004, 1e9, 1e9 + 0.1, 1e15 + 0.5, -1e15 - 0.5, 1e20,
      4.9e-324, 2.2250738585072014e-308, 1234567890123456.7,
      0.000001499999999999, 7.000000499999999, 7.0000005, -7.0000005)
      .filter(d => math.abs(d) < 1e21)
    val randoms = Seq.fill(4000) {
      rnd.nextInt(5) match {
        case 0 => (rnd.nextDouble() - 0.5) * 200000 // money-like
        case 1 => math.rint((rnd.nextDouble() - 0.5) * 2e11) / 100.0 // 2dp
        case 2 => (rnd.nextDouble() - 0.5) * 2e12 // large
        case 3 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // raw bits
        case _ => math.rint((rnd.nextDouble() - 0.5) * 2e9) / 1e6 // 6dp
      }
    }.filterNot(d => d.isNaN || d.isInfinite || math.abs(d) >= 1e21)
    val rows = (adversarial ++ randoms).zipWithIndex.map { case (d, i) => (i.toLong, d) }
    val df = rows.toDF("id", "x")
    val got = df.select(col("id"), col("x"),
        DecimalExpressions.double_to_decimal6(col("x")).as("fast"),
        col("x").cast("decimal(27,6)").as("ref"))
      .collect()
    got.foreach { r =>
      val fast = r.getDecimal(2)
      val ref = r.getDecimal(3)
      assert((fast == null && ref == null) ||
        (fast != null && ref != null && fast.compareTo(ref) == 0 &&
          fast.scale == ref.scale),
        s"id ${r.getLong(0)} x=${r.getDouble(1)}: fast=$fast ref=$ref")
    }
    assert(got.length == rows.length)
  }

  test("money_cents ≡ CAST(round(x * 100) AS BIGINT) on adversarial doubles") {
    import spark.implicits._
    val rnd = new scala.util.Random(100)
    val adversarial = Seq(
      0.0, -0.0, 0.005, -0.005, 0.004999999999999999, 0.015, 0.025, -0.015,
      0.1, 0.105, -0.105, 1.005, 2.675, -2.675, 0.499999999999999994,
      1234567.89, -1234567.89, 0.49999999999999994, 7.000000000000001,
      0.07, 1e9 + 0.005, -1e9 - 0.005, 2.2250738585072014e-308, 4.9e-324,
      1e13 + 0.125, -1e13 - 0.125, 0.625, 0.635, 0.645)
    val randoms = Seq.fill(4000) {
      rnd.nextInt(5) match {
        case 0 => (rnd.nextDouble() - 0.5) * 200000 // money-like
        case 1 => math.rint((rnd.nextDouble() - 0.5) * 2e11) / 100.0 // 2dp
        case 2 => (rnd.nextDouble() - 0.5) * 2e12 // large
        case 3 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // raw bits
        case _ => (rnd.nextLong() % 2000000L) / 2.0 / 100.0 // exact half-cent ties
      }
    }.filterNot(d => d.isNaN || d.isInfinite || math.abs(d) >= 1e16)
    val rows = (adversarial ++ randoms).zipWithIndex.map { case (d, i) => (i.toLong, d) }
    val df = rows.toDF("id", "x")
    val got = df.select(col("id"), col("x"),
        DecimalExpressions.money_cents(col("x")).as("fast"),
        expr("CAST(round(x * 100) AS BIGINT)").as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"id ${r.getLong(0)} x=${r.getDouble(1)}: fast=${r.getLong(2)} ref=${r.getLong(3)}")
    }
    assert(got.length == rows.length)
  }

  test("money_cents throws on NaN/Inf/overflow, like round + the ANSI cast") {
    import spark.implicits._
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, 1e300)) {
      val df = Seq((1L, bad)).toDF("id", "x")
      intercept[Exception] {
        df.select(DecimalExpressions.money_cents(col("x"))).collect()
      }
      intercept[Exception] {
        df.select(expr("CAST(round(x * 100) AS BIGINT)")).collect()
      }
    }
  }

  test("out-of-range values throw, like the session's ANSI cast") {
    import spark.implicits._
    val df = Seq((1L, 1e22)).toDF("id", "x")
    intercept[Exception] {
      df.select(DecimalExpressions.double_to_decimal6(col("x"))).collect()
    }
    intercept[Exception] {
      df.select(col("x").cast("decimal(27,6)")).collect()
    }
  }
}
