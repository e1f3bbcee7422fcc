package graft.functions

import graft.{Graft, SparkSpec}
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {

  test("MapSum aggregator ≡ explode+groupBy map-sum (A4 one-pass path)") {
    import spark.implicits._
    val df = Seq(
      ("g1", Map(1 -> 2L, 2 -> 1L)),
      ("g1", Map(2 -> 5L, 7 -> 1L)),
      ("g2", Map(1 -> 1L))
    ).toDF("g", "m").as[(String, Map[Int, Long])]
    val agged = df.groupByKey(_._1).mapValues(_._2)
      .agg(Aggregators.MapSum.toColumn)
      .collect().toMap
    assert(agged("g1") == Map(1 -> 2L, 2 -> 6L, 7 -> 1L))
    assert(agged("g2") == Map(1 -> 1L))
    // keys come out sorted (deterministic hashing downstream)
    assert(agged("g1").keys.toSeq == agged("g1").keys.toSeq.sorted)
  }

  test("KMV sketch estimates distinct partkeys within 20%") {
    import spark.implicits._
    val li = Graft.table(spark, sf, "lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0).toDouble
    val est = li.select(col("l_partkey")).as[Long]
      .groupByKey(_ => 1)
      .agg(new Aggregators.KmvSketch(256).toColumn)
      .head()._2
    val err = math.abs(est - exact) / exact
    assert(err <= 0.2, s"KMV est $est vs exact $exact (err $err)")
  }

  test("KMV merge is order-insensitive (associative sketch state)") {
    val s = new Aggregators.KmvSketch(16)
    val xs = (1L to 500L).map(scala.util.hashing.byteswap64)
    val b1 = xs.foldLeft(s.zero)((b, v) => s.reduce(b, v))
    val (l, r) = xs.splitAt(123)
    val b2 = s.merge(
      r.foldLeft(s.zero)((b, v) => s.reduce(b, v)),
      l.foldLeft(s.zero)((b, v) => s.reduce(b, v)))
    assert(s.finish(b1) == s.finish(b2))
  }
}
