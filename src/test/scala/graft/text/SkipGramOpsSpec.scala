package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential proof for skip-gram pair generation: an independent
  * sequential windowed counter over the collected corpus must produce the
  * same directional pair multiset and the same exact harmonic weights.
  */
class SkipGramOpsSpec extends SparkSpec {

  test("lcm scaling makes every harmonic weight exact") {
    for (d <- 1 to SkipGramOps.W) assert(SkipGramOps.Scale % d == 0)
  }

  test("pair occurrences ≡ independent sequential window walk") {
    val docs = graft.Graft.table(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val want = scala.collection.mutable.Map.empty[(String, String, Int), Long]
    for (text <- docs) {
      val t = text.trim.split("\\s+")
      if (t.length >= 2)
        for (i <- t.indices; d <- 1 to SkipGramOps.W if i + d < t.length) {
          for (p <- Seq((t(i), t(i + d), d), (t(i + d), t(i), d)))
            want(p) = want.getOrElse(p, 0L) + 1
        }
    }
    val got = SkipGramOps.pairOccurrences(
      graft.Graft.table(spark, sf, "documents"))
      .groupBy("center", "context", "d").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    assert(got == want.toMap)
    spark.catalog.clearCache()
  }

  test("q_skipgram_pairs: weights are the exact 6/d sums of the occurrences") {
    val occ = SkipGramOps.pairOccurrences(
      graft.Graft.table(spark, sf, "documents"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val byPair = occ.groupBy(p => (p._1, p._2))
    val rows = SkipGramOps.SkipgramPairs.run(spark, sf).collect()
    assert(rows.length <= SkipGramOps.TopN && rows.nonEmpty)
    for (r <- rows) {
      val key = (r.getString(0), r.getString(1))
      val ds = byPair(key).map(_._3)
      assert(r.getLong(2) == ds.length.toLong)
      assert(r.getLong(3) == ds.map(d => (SkipGramOps.Scale / d).toLong).sum)
    }
    spark.catalog.clearCache()
  }
}
