package graft.text

import graft.SparkSpec

class DsirOpsSpec extends SparkSpec {

  test("q_dsir_score favors target-source documents on average") {
    val rows = DsirOps.DsirScore.run(spark, sf)
      .join(graft.Graft.table(spark, sf, "documents")
        .select("doc_id", "source"), Seq("doc_id"))
      .collect()
    assert(rows.nonEmpty)
    val (tgt, rest) = rows.partition(
      _.getAs[String]("source") == DsirOps.TargetSource)
    def meanDelta(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("bits_delta").toDouble).sum / rs.length
    assert(tgt.nonEmpty && rest.nonEmpty)
    // target docs must score higher under their own model: the whole
    // premise of importance resampling
    assert(meanDelta(tgt) > meanDelta(rest),
      s"target mean ${meanDelta(tgt)} !> raw mean ${meanDelta(rest)}")
  }

  test("q_dsir_select returns K distinct non-target docs ranked by score") {
    val rows = DsirOps.DsirSelect.run(spark, sf).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 50)
    assert(rows.forall(_.getAs[String]("source") != DsirOps.TargetSource))
    // the selected set's minimum score must be >= the unselected max
    // (it IS the top-50 by (bits_delta, doc_id))
    val selMin = rows.map(_.getAs[Long]("bits_delta")).min
    val selIds = rows.map(_.getAs[Long]("doc_id")).toSet
    val unselectedMax = DsirOps.DsirScore.run(spark, sf)
      .join(graft.Graft.table(spark, sf, "documents")
        .select("doc_id", "source"), Seq("doc_id"))
      .collect()
      .filter(r => r.getAs[String]("source") != DsirOps.TargetSource &&
        !selIds.contains(r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("bits_delta")).max
    assert(selMin >= unselectedMax,
      s"selection not top-k: min selected $selMin < max unselected $unselectedMax")
  }
}
