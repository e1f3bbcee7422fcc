package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SortedArrayExpressionsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("sorted_intersect_count ≡ size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(421)
    // random vocab of short strings, including empty string and shared
    // prefixes (the comparator's interesting corners)
    val vocab = (Vector("", "a", "aa", "ab", "b", "ba") ++
      Vector.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)).distinct
    def randSet(): Seq[String] =
      rnd.shuffle(vocab).take(rnd.nextInt(vocab.size)).distinct.sorted
    val rows = Seq.tabulate(300)(i => (i.toLong, randSet(), randSet()))
    val df = rows.toDF("id", "a", "b")
      .select(col("id"), array_sort(col("a")).as("a"), array_sort(col("b")).as("b"))
    val got = df.select(col("id"),
        SortedArrayExpressions.sorted_intersect_count(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"row ${r.getLong(0)}")
    }
    assert(got.length == 300)
  }

  test("prefix join is invariant under the hashed tie-break (pairs unchanged)") {
    import spark.implicits._
    // docs engineered with heavy shingle overlap so true pairs exist; the
    // EXACT pair set must be what the brute-force shared-shingle join
    // reports regardless of the candidate order's tie-break
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base, "s"),
      (2L, base + " tail", "s"),
      (3L, "completely different words everywhere in this one text", "s"),
      (4L, base.replace("quick", "quick"), "s"),
      (5L, "the quick brown fox jumps over the lazy dog again and never", "s")
    ).toDF("doc_id", "text", "source")
    val got = graft.dedup.Dedup.prefixJoinPairs(docs)
      .select("doc_a", "doc_b", "n_inter", "n_union")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // brute force: exact shingle sets per doc, all pairs, Jaccard ≥ 0.6
    val sh = docs.select(col("doc_id"),
        graft.plans.ShingleExpression.shingle_strings(col("text"), 3).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val want = (for {
      a <- sh.keys; b <- sh.keys if a < b
      inter = (sh(a) intersect sh(b)).size.toLong
      union = (sh(a) union sh(b)).size.toLong
      if inter * 10 >= union * 6
    } yield (a, b, inter, union)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }
}
