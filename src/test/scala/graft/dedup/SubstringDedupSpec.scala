package graft.dedup

import graft.SparkSpec

/** Differential + known-case contracts for the exact substring dedup.
  * The DuckDB oracle is the cross-engine check; here an independent
  * in-memory reference (sets of L-grams, sequential island merge) pins
  * the operator against handcrafted corpora, including the span-merge
  * edge cases.
  */
class SubstringDedupSpec extends SparkSpec {

  private val L = SubstringDedup.L

  /** Sequential reference: same semantics, no Spark. */
  private def reference(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val owners = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, txt) <- docs; i <- 0 to txt.length - L)
      owners.updateWith(txt.substring(i, i + L))(
        o => Some(o.getOrElse(Set.empty) + id))
    docs.sortBy(_._1).flatMap { case (id, txt) =>
      val marked = (0 to txt.length - L).filter(
        i => owners(txt.substring(i, i + L)).size > 1).map(_ + 1)
      val spans = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      for (p <- marked) {
        if (spans.nonEmpty && p <= spans.last(1))
          spans.last(1) = math.max(spans.last(1), p + L)
        else spans += Array(p, p + L)
      }
      if (spans.isEmpty) None
      else Some((id, spans.size.toLong, spans.map(s => (s(1) - s(0)).toLong).sum))
    }
  }

  private def engine(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val out = SubstringDedup.SubstringDupes
      .dupeSpans(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    spark.catalog.clearCache()
    out
  }

  test("shared block across two docs; third unrelated doc is absent") {
    val block = "0123456789abcdefghijKLMNOPQRST" // 30 chars > L
    val docs = Seq(
      (1L, s"prefix-one $block tail-one xxxxxxxxxx"),
      (2L, s"other-start $block different-tail yyyy"),
      (3L, "totally unrelated text with no repeats at all, long enough."))
    assert(engine(docs) == reference(docs))
    // the shared region is " $block " — the delimiting spaces repeat too,
    // so the island is block.length + 2 chars
    val byDoc = engine(docs).map(r => r._1 -> r).toMap
    assert(byDoc(1L)._2 == 1 && byDoc(1L)._3 == block.length + 2)
    assert(!byDoc.contains(3L))
  }

  test("adjacent repeated windows merge into one island; separated stay two") {
    val a = "AAAAAAAAAAAAAAAAAAAA" // exactly L
    val b = "BBBBBBBBBBBBBBBBBBBB"
    val near = Seq(
      (1L, s"$a$b"),                        // touching windows → one island
      (2L, s"$a${"x" * 25}$b"),             // 25-char gap → two islands
      (3L, s"$a and also $b elsewhere ok")) // donor doc
    val got = engine(near)
    assert(got == reference(near))
    val byDoc = got.map(r => r._1 -> r).toMap
    assert(byDoc(1L)._2 == 1 && byDoc(1L)._3 == 40,
      "touching windows merge into one 40-char island")
    assert(byDoc(2L)._2 == 2, "distant repeats stay separate islands")
  }

  test("within-doc-only repetition does not mark (cross-document rule)") {
    val rep = "samechunk-samechunk!" // L chars
    val docs = Seq(
      (1L, s"$rep middle padding $rep end padding"),
      (2L, "a second document with entirely fresh content here."))
    assert(engine(docs) == reference(docs))
    assert(engine(docs).isEmpty,
      "a 20-gram repeated only inside one doc has count(DISTINCT doc_id)=1")
  }

  test("sf corpus: deterministic, bounded, and consistent accounting") {
    val out = SubstringDedup.SubstringDupes.run(spark, sf).collect()
    spark.catalog.clearCache()
    assert(out.nonEmpty, "synthetic word-soup corpus has cross-doc repeats")
    out.foreach { r =>
      val (spans, chars) = (r.getLong(1), r.getLong(2))
      assert(spans >= 1 && chars >= L.toLong * 1,
        "every reported doc has at least one >=L-char island")
      assert(chars >= spans * L, "each island is at least L chars")
    }
    val again = SubstringDedup.SubstringDupes.run(spark, sf).collect()
    spark.catalog.clearCache()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
