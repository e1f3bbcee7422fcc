package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkipGramExpressionSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val W = 3

  /** The retired composable spelling, kept verbatim as the reference. */
  private def referencePairs(arr: org.apache.spark.sql.Column) =
    flatten(flatten(transform(
      sequence(lit(0), size(arr) - 2), i =>
        transform(
          sequence(lit(1), least(lit(W), size(arr) - 1 - i)),
          d => {
            val a = element_at(arr, (i + 1).cast("int"))
            val b = element_at(arr, (i + d + 1).cast("int"))
            array(
              struct(a.as("center"), b.as("context"), d.as("d")),
              struct(b.as("center"), a.as("context"), d.as("d")))
          }))))

  test("native skipgram_pairs ≡ nested-transform spelling, order included") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "", "yy")
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "arr")
    val got = df.select(col("id"),
        SkipGramExpression.skipgram_pairs(col("arr"), W).as("n"),
        referencePairs(col("arr")).as("r"))
      .collect()
    got.foreach { r =>
      val n = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getString(0), x.getString(1), x.getInt(2)))
      val ref = r.getSeq[org.apache.spark.sql.Row](2)
        .map(x => (x.getString(0), x.getString(1), x.getInt(2)))
      assert(n == ref, s"row ${r.getLong(0)}")
    }
    assert(got.length == 200)
  }

  test("native adjacent_pairs ≡ all three retired spellings, order included") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "", "yy")
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "arr")
    val arr = col("arr")
    // retired spelling 1 (LmOps): transform over a sequence of positions
    val refTransform = expr(
      "transform(sequence(0, size(arr) - 2), " +
        "i -> struct(arr[i] AS w1, arr[i + 1] AS w2))")
    // retired spelling 2 (TokenLift/NextToken): zip_with concat then split
    val refConcat = zip_with(
      slice(arr, lit(1), size(arr) - 1),
      slice(arr, lit(2), size(arr) - 1),
      (a, b) => concat(a, lit(" "), b))
    val got = df.select(col("id"),
        SkipGramExpression.adjacent_pairs(arr).as("n"),
        refTransform.as("rt"), refConcat.as("rc"))
      .collect()
    got.foreach { r =>
      val n = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getString(0), x.getString(1)))
      val rt = r.getSeq[org.apache.spark.sql.Row](2)
        .map(x => (x.getString(0), x.getString(1)))
      val rc = r.getSeq[String](3)
        .map { g => val i = g.indexOf(' '); (g.substring(0, i), g.substring(i + 1)) }
      assert(n == rt, s"row ${r.getLong(0)} vs transform spelling")
      assert(n == rc, s"row ${r.getLong(0)} vs concat-split spelling")
    }
    assert(got.length == 200)
  }
}
