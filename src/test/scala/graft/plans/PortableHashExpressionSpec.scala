package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PortableHashExpressionSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("md5_prefix60/28 ≡ conv(substring(md5(...))) on randomized inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(60)
    val rows = ("" +: "a" +: "é ü 漢字" +:
      Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "s")
    val got = df.select(col("id"),
        PortableHashExpression.md5_prefix60(col("s")).as("n60"),
        conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("r60"),
        PortableHashExpression.md5_prefix28(col("s")).as("n28"),
        conv(substring(md5(col("s").cast("binary")), 1, 7), 16, 10)
          .cast("long").as("r28"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"60-bit mismatch at id ${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(4), s"28-bit mismatch at id ${r.getLong(0)}")
    }
    assert(got.length == 503)
  }

  test("bigram_feats ≡ explode(transform concat) + pHash60 % B, order included") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val vocab = Vector("alpha", "beta", "gamma", "é", "", "漢字", "x1")
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))))
    }
    val b = 2048L
    val df = rows.toDF("id", "arr")
    // the retired spelling, verbatim (DsirOps/ClassifierOps shape)
    val ref = expr(
      "transform(sequence(0, size(arr) - 2), " +
        "i -> concat(arr[i], ' ', arr[i + 1]))")
    val got = df.filter(size(col("arr")) >= 2)
      .select(col("id"),
        PortableHashExpression.bigram_feats(col("arr"), b).as("n"),
        transform(ref, bg =>
          graft.functions.PortableHash.pHash60(bg) % b).as("r"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"row ${r.getLong(0)}")
    }
    assert(got.nonEmpty)
  }
}
