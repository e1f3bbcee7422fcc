package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the corpus-construction operators beyond the oracle
  * hash-match: sampling determinism/stratification, vocabulary ordering,
  * tf-idf ranking behavior.
  */
class CorpusOpsSpec extends SparkSpec {

  test("stratified sample is deterministic and respects per-source rates") {
    val a = CorpusOps.StratifiedSample.run(spark, sf).collect()
    val b = CorpusOps.StratifiedSample.run(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "hash sampling must be run-to-run identical")
    a.foreach { r =>
      val (rate, total, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rate >= 20 && rate < 80)
      assert(kept <= total)
      // LLN sanity at small n: kept/total within ±4σ of rate
      val p = rate.toDouble / 100.0
      val sigma = math.sqrt(total * p * (1 - p))
      assert(math.abs(kept - total * p) <= 4 * sigma + 1,
        s"source ${r.getString(0)}: kept $kept of $total at rate $rate%")
    }
  }

  test("sample membership is per-document, independent of the source stratum") {
    // the same doc_id hash decides membership whatever stratum it is in —
    // resharding sources never resamples documents (retry/idempotence at
    // scale). Verified by recomputing membership directly from the hash.
    import graft.functions.PortableHash.pHash28
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val direct = docs.select(
        when(pHash28(concat(lit("sample:"), col("doc_id").cast("string"))) % 100 <
          pHash28(concat(lit("rate:"), col("source"))) % 60 + 20, 1L)
          .otherwise(0L).as("kept"))
      .agg(sum("kept")).head.getLong(0)
    val fromOp = CorpusOps.StratifiedSample.run(spark, sf)
      .agg(sum("n_kept")).head.getLong(0)
    assert(direct == fromOp)
  }

  test("vocab ids are contiguous from 1 and ordered by (count desc, token)") {
    val v = CorpusOps.Vocab.run(spark, sf).collect()
    assert(v.nonEmpty)
    assert(v.map(_.getInt(0)).toSeq == (1 to v.length).toSeq)
    val pairs = v.map(r => (r.getLong(2), r.getString(1)))
    pairs.zip(pairs.tail).foreach { case ((n1, t1), (n2, t2)) =>
      assert(n1 > n2 || (n1 == n2 && t1 < t2),
        s"vocab order violated: ($n1,$t1) before ($n2,$t2)")
    }
    assert(v.forall(_.getLong(2) >= 5), "min-count floor violated")
  }

  test("quality top-k per source: k rows per source, ordered, true maxima") {
    val rows = CorpusOps.QualityTopKPerSource.run(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(0))
    // every source yields exactly 3 ranked rows in quality-desc order
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3), s"$src ranks")
      val qs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(qs.zip(qs.tail).forall { case (a, b) => a >= b }, s"$src order")
    }
    // the rank-1 quality per source is the true source maximum,
    // recomputed independently with a plain max aggregate
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val trueMax = docs.select(col("source"),
        graft.text.TextOps.qualityExpr(
          graft.text.TextOps.tokens(col("text"))).as("q"))
      .groupBy("source").agg(max(col("q")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    bySource.foreach { case (src, rs) =>
      val top = rs.find(_.getInt(1) == 1).get.getDouble(3)
      assert(top == trueMax(src), s"$src: top $top != max ${trueMax(src)}")
    }
  }

  test("rarity: all-unique-vocab doc scores max, all-shared-vocab doc scores min") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared shared shared", "en", "s", 0L),
      (2L, "shared unique1 unique2", "en", "s", 0L),
      (3L, "shared other3 other4", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("rarity_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CorpusOps.RarityScore.run(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // 'shared' appears in all 3 docs (ridf = 3e6/3 = 1e6); unique tokens
    // score 3e6. doc 1 = 1e6; docs 2,3 = (1e6 + 3e6 + 3e6)/3
    assert(r(1L) == 1000000.0)
    assert(r(2L) == (1000000.0 + 3000000.0 + 3000000.0) / 3.0)
    assert(r(2L) == r(3L) && r(2L) > r(1L))
  }

  test("tf-idf prefers a rare term over a common one at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare common common", "en", "s", 0L),
      (2L, "common common common", "en", "s", 0L),
      (3L, "common other other", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("corpus_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = CorpusOps.TfIdf.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: tf(rare)=1 idf=3/1 → 3.0 beats tf(common)=2 idf=3/3 → 2.0
    assert(top(1L) == "rare")
    // doc 3: tf(other)=2 idf=3/1 → 6.0 beats common
    assert(top(3L) == "other")
    // doc 2: only common
    assert(top(2L) == "common")
  }

  test("term scrub removes every whole-word blocklist hit, counts them, and" +
    " leaves substrings alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark is spark but sparkly stays", "en", "s", 0L),
      (2L, "no hits here", "en", "s", 0L),
      (3L, "vector stream vector", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("scrub_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.TermScrub.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (2L, "<redacted> is <redacted> but sparkly stays"),
      s"${out(1L)}") // word boundary: 'sparkly' untouched
    assert(out(2L) == (0L, "no hits here"))
    assert(out(3L) == (3L, "<redacted> <redacted> <redacted>"))
  }

  test("PII scrub counts and redacts email/phone/IP/card, differentially vs plain regex") {
    import spark.implicits._
    // doc 60: id % 3 = % 4 = % 5 = 0 → all four kinds synthesized; doc 7:
    // email only; doc 1 carries REAL PII in its raw text — the scrubber
    // must catch in-text PII, not just the synthesized contact block
    val docs = Seq(
      (60L, "clean text", "en", "sA", 0L),
      (7L, "also clean", "en", "sB", 0L),
      (1L, "mail me at jo.doe+x@corp.example.com or 10.0.0.1 ok", "en", "sB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("pii_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.PiiScrub.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap

    // independent re-derivation: same synthesis in plain Scala, counts via
    // java.util.regex directly (no Spark expressions involved)
    def pad(v: Long, n: Int) = v.toString.reverse.padTo(n, '0').reverse.mkString
    def synth(id: Long, source: String, text: String): String = {
      val sb = new StringBuilder(text)
      sb ++= s" Contact user$id@mail-$source.com now."
      if (id % 3 == 0) sb ++= s" Call +1 ${pad(id * 7 % 1000, 3)}-${pad(id * 13 % 1000, 3)}-${pad(id * 19 % 10000, 4)}."
      if (id % 4 == 0) sb ++= s" Host ${id % 256}.${id * 3 % 256}.${id * 5 % 256}.${id * 7 % 256} up."
      if (id % 5 == 0) sb ++= s" Card 4${pad(id * 37 % 1000, 3)}-${pad(id * 11 % 10000, 4)}-${pad(id * 17 % 10000, 4)}-${pad(id * 23 % 10000, 4)}."
      sb.result()
    }
    val res = Seq("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "\\+\\d{1,2} \\d{3}-\\d{3}-\\d{4}",
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
      "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b").map(_.r)
    def expect(rows: Seq[(Long, String, String)]) = {
      val kinds = rows.map { case (id, src, txt) =>
        val p = synth(id, src, txt)
        val scrubbed = res.zip(Seq("<EMAIL>", "<PHONE>", "<IP>", "<CARD>"))
          .foldLeft(p) { case (acc, (re, mask)) => re.replaceAllIn(acc, mask) }
        (res.map(_.findAllIn(p).size.toLong), scrubbed.length.toLong)
      }
      (rows.size.toLong, kinds.map(_._1(0)).sum, kinds.map(_._1(1)).sum,
        kinds.map(_._1(2)).sum, kinds.map(_._1(3)).sum, kinds.map(_._2).sum)
    }
    assert(out("sA") == expect(Seq((60L, "sA", "clean text"))))
    assert(out("sB") == expect(Seq(
      (7L, "sB", "also clean"),
      (1L, "sB", "mail me at jo.doe+x@corp.example.com or 10.0.0.1 ok"))))
    // the raw-text PII really was counted: doc 1 contributes 2 emails
    // (in-text + synthesized) and 1 in-text IP
    assert(out("sB")._2 == 3L, "2 synthesized + 1 in-text email")
    assert(out("sB")._4 == 1L, "the in-text IP")
    // doc 60 hits every synthesized kind exactly once
    assert(out("sA") == (1L, out("sA")._2, 1L, 1L, 1L, out("sA")._6))
  }

  test("chunking tiles each document: 200-char chunks on a 150 stride") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x" * 350, "en", "s", 350L),  // chunks at 0,150,300 → 200,200,50
      (2L, "y" * 100, "en", "s", 100L),  // one short chunk
      (3L, "z" * 150, "en", "s", 150L))  // exactly one stride → one chunk
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("chunk_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.ChunkDocs.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 200), (1L, 1L, 150L, 200), (1L, 2L, 300L, 50),
      (2L, 0L, 0L, 100),
      (3L, 0L, 0L, 150)), out.mkString(", "))
    // coverage: last chunk ends exactly at the doc length
    Seq(1L -> 350L, 2L -> 100L, 3L -> 150L).foreach { case (id, len) =>
      val last = out.filter(_._1 == id).maxBy(_._2)
      assert(last._3 + last._4 == len, s"doc $id not tiled to its end")
    }
  }

  test("capped sample keeps at most K per source, deterministically") {
    val k = 20
    val a = CorpusOps.CappedSample.run(spark, sf).collect()
    val b = CorpusOps.CappedSample.run(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "hash-ranked cap must be run-to-run identical")
    val bySource = a.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rows) =>
      assert(rows.length <= k, s"source $src over cap: ${rows.length}")
      // ranks are contiguous 1..n and doc_ids within a source are distinct
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length),
        s"source $src ranks not contiguous")
      assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    }
  }

  test("dist drift: a half-exclusive token tops the chi-square ranking, " +
    "scores bit-match the fixed expression tree") {
    import spark.implicits._
    // mirror the engine's portable md5 split driver-side to craft the halves
    def half(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 2
    }
    val ids = 0L until 12L
    val (h0, h1) = (ids.filter(half(_) == 0), ids.filter(half(_) == 1))
    assert(h0.nonEmpty && h1.nonEmpty, s"degenerate split: $h0 / $h1")
    val docs = ids.map { id =>
      val t = if (half(id) == 0) "aaa common common" else "bbb common"
      (id, t)
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("drift_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.DistDrift.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // expected counts: aaa only in half 0, bbb only in half 1, common in both
    val (t1, t2) = (3L * h0.length, 2L * h1.length)
    def chi2(n1: Long, n2: Long): Double = {
      val d = (n1 * t2 - n2 * t1).toDouble
      ((t1 + t2).toDouble * (d * d)) /
        ((t1.toDouble * t2.toDouble) * (n1 + n2).toDouble)
    }
    val expected = Seq(
      ("aaa", h0.length.toLong, 0L),
      ("bbb", 0L, h1.length.toLong),
      ("common", 2L * h0.length, h1.length.toLong))
      .map { case (t, n1, n2) => (t, n1, n2, chi2(n1, n2)) }
      .sortBy { case (t, _, _, c) => (-c, t) }
    assert(out.toSeq == expected, s"got ${out.toSeq} want $expected")
    // the half-exclusive tokens out-drift the shared one
    assert(out.take(2).map(_._1).toSet == Set("aaa", "bbb"))
  }

  test("token gini: closed-form values — 0 for a one-token source, " +
    "1 - k/n² for uniform") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x", "s1"), (2L, "x x", "s1"),       // 4×x → gini 0
      (3L, "a b", "s2"), (4L, "c d", "s2"))       // uniform 4 → 1 - 4/16
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("gini_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.TokenGini.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("s1", 4L, 1L, 0.0),
      ("s2", 4L, 4L, 1.0 - 4.0 / 16.0)), out.mkString(", "))
  }

  private def ppsExpected(weights: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    // sequential PPS reference: plain cumsum in doc_id order
    val step = weights.map(_._2).sum / 100L
    var cum = 0L
    weights.sortBy(_._1).flatMap { case (id, w) =>
      val prev = cum; cum += w
      val copies = cum / step - prev / step
      if (copies > 0) Some((id, w, cum, copies)) else None
    }
  }

  test("pps sample: a giant doc draws proportionally many copies; " +
    "two-phase prefix sum equals the sequential cumsum") {
    import spark.implicits._
    // ids straddle a prefix-sum bucket boundary on purpose (B = 1000)
    val weights = ((0L until 9L).map(i => (i * 250L, 10L)) :+ (2500L, 460L))
    val docs = weights.toDF("doc_id", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("pps_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.PpsSample.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ppsExpected(weights)
    assert(out.toSeq == expected, s"got ${out.toSeq} want $expected")
    // total multiplicity telescopes to W div step
    val w = weights.map(_._2).sum
    assert(out.map(_._4).sum == w / (w / 100L))
    // the giant doc dominates the draw
    assert(out.maxBy(_._4)._1 == 2500L)
  }

  test("pps sample on the catalog matches the sequential reference") {
    val weights = graft.Graft.table(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val out = CorpusOps.PpsSample.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == ppsExpected(weights))
    assert(out.nonEmpty)
  }

  test("boilerplate: an exact shared 10-token chunk is flagged in every " +
    "doc carrying it; unique text is not") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"nav$i").mkString(" ") // one exact chunk
    val docs = Seq(
      // d1/d2 on srcA: boilerplate chunk + unique tails (each doc = 2 chunks)
      (1L, s"$boiler ${(1 to 10).map(i => s"a$i").mkString(" ")}", "en", "srcA", 0L),
      (2L, s"$boiler ${(1 to 10).map(i => s"b$i").mkString(" ")}", "en", "srcA", 0L),
      // d3 on srcB: fully unique, 2 chunks
      (3L, (1 to 20).map(i => s"c$i").mkString(" "), "en", "srcB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("boiler_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.Boilerplate.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // srcA: 4 chunks, 2 of them (the shared nav block, once per doc) flagged
    assert(out("srcA") == ((4L, 2L, 0.5)), s"${out("srcA")}")
    assert(out("srcB") == ((2L, 0L, 0.0)), s"${out("srcB")}")
  }

  test("source terms: a source-exclusive token outranks shared vocabulary") {
    import spark.implicits._
    // srcX says 'quantum' (its exclusive term) among shared filler; srcY
    // only shares the filler. Floor is 5 occurrences.
    val filler = (1 to 30).map(_ => "the data").mkString(" ")
    val docs = Seq(
      (1L, s"${(1 to 8).map(_ => "quantum").mkString(" ")} $filler", "en", "srcX", 0L),
      (2L, filler, "en", "srcY", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("terms_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.SourceTerms.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(4)))
    val srcX = out.filter(_._1 == "srcX")
    assert(srcX.head._3 == "quantum", s"top srcX term: ${srcX.head}")
    // exclusive term's ratio strictly exceeds every shared term's
    assert(srcX.tail.forall(_._4 < srcX.head._4))
    // ranks contiguous from 1 within each source
    out.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
    // catalog run: every source reports exactly K rows
    val cat = CorpusOps.SourceTerms.run(spark, sf).collect()
    spark.catalog.clearCache()
    assert(cat.nonEmpty && cat.groupBy(_.getString(0)).values.forall(_.length == 3))
  }

  test("ngram novelty: a unique doc scores 1.0, exact duplicates score 0.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 12).map(i => s"u$i").mkString(" "), "en", "s", 0L),
      (2L, "copy of the shared body text here", "en", "s", 0L),
      (3L, "copy of the shared body text here", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("novelty_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.NgramNovelty.run(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    spark.catalog.clearCache()
    assert(out(1L) == ((10L, 10L, 1.0)), s"${out(1L)}")
    assert(out(2L) == ((5L, 0L, 0.0)) && out(3L) == ((5L, 0L, 0.0)),
      s"${out(2L)} / ${out(3L)}")
  }
  test("zipf curve: crafted counts give exact ranks, shares, cumulative") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("zipf_spec").toString
    // counts: aa=4, bb=3, cc=2, dd=1 → total 10
    Seq((1L, "aa aa bb cc", "en", "s", 0L), (2L, "aa aa bb bb cc dd", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.ZipfCurve.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    spark.catalog.clearCache()
    assert(out.toSeq == Seq((1, "aa", 4L, 0.4, 0.4), (2, "bb", 3L, 0.3, 0.7),
      (3, "cc", 2L, 0.2, 0.9), (4, "dd", 1L, 0.1, 1.0)), s"${out.toSeq}")
    // catalog: cumulative share is monotone and bounded
    val cat = CorpusOps.ZipfCurve.run(spark, sf).collect().map(_.getDouble(4))
    spark.catalog.clearCache()
    assert(cat.zip(cat.drop(1)).forall { case (a, b) => a <= b })
    assert(cat.last <= 1.0 + 1e-12)
  }

  test("next token: crafted bigrams give exact conditional probabilities") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nexttok_spec").toString
    // "go" heads 4 bigrams: go home ×2, go away ×1, go now ×1
    Seq((1L, "go home go home go away go now", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.NextToken.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(3), r.getLong(4),
        r.getDouble(5)))
    spark.catalog.clearCache()
    // heads by count: go(4), home(3: "home go" x2... recount) — just assert
    // the go row block is exact
    val go = out.filter(_._1 == "go")
    assert(go.toSeq == Seq(("go", 1, "home", 2L, 0.5),
      ("go", 2, "away", 1L, 0.25), ("go", 3, "now", 1L, 0.25)), s"${go.toSeq}")
  }

  test("vocab coverage: rare tokens count as OOV occurrences per source") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("oov_spec").toString
    // "common" appears 6x (in-vocab at min-count 5); rare tokens once each.
    // srcA: 4 common + 1 rare → oov 1/5; srcB: 2 common + 3 rare → 3/5
    Seq(
      (1L, "common common common common rare1", "en", "srcA", 0L),
      (2L, "common common rare2 rare3 rare4", "en", "srcB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusOps.VocabCoverage.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(out.toSeq == Seq(("srcA", 5L, 1L, 0.2), ("srcB", 5L, 3L, 0.6)),
      s"${out.toSeq}")
  }

  test("q_batch_padding: length-sorted batching never wastes more than shuffled") {
    val rows = CorpusOps.BatchPadding.run(spark, sf).collect()
      .map(r => r.getAs[String]("strategy") ->
        ((r.getAs[Long]("real_tokens"), r.getAs[Long]("padded_tokens"),
          r.getAs[Long]("waste"), r.getAs[Double]("fill_rate")))).toMap
    spark.catalog.clearCache()
    assert(rows.keySet == Set("shuffled", "length"))
    val (realS, padS, wasteS, fillS) = rows("shuffled")
    val (realL, padL, wasteL, fillL) = rows("length")
    // both strategies batch the same corpus: identical real-token totals
    assert(realS == realL)
    // accounting identity and bounds
    assert(wasteS == padS - realS && wasteL == padL - realL)
    assert(fillS > 0 && fillS <= 1.0 && fillL > 0 && fillL <= 1.0)
    // length-sorting minimizes the max-per-batch spread, so it can never
    // pad more than the hash-shuffled order on the same batch size
    assert(wasteL <= wasteS, s"length waste $wasteL > shuffled $wasteS")
  }


  test("URL dedup: canonicalization collapses the planted variant classes") {
    import spark.implicits._
    // ids chosen so several RAW spellings share one canonical URL:
    // 30 and 100 share host site2 path p/8? no — verify via independent
    // plain-Scala canonicalizer over the same synthesis instead
    val ids = Seq(0L, 2L, 3L, 4L, 5L, 6L, 12L, 30L, 44L, 77L, 154L)
    val docs = ids.map(i => (i, "t", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("url_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def raw(i: Long): String =
      "https://" + (if (i % 3 == 0) "WWW." else "") +
        (if (i % 5 == 0) "SITE" else "site") + (i % 7) + ".example.com/p/" +
        (i % 11) + (if (i % 2 == 0) "/" else "") +
        (if (i % 3 > 0) "?utm=" + (i % 3) else "") +
        (if (i % 4 == 0) "#sec" else "")
    def canon(u: String): String = u.replaceAll("[#?].*$", "").toLowerCase
      .replaceAll("^https://www\\.", "https://").replaceAll("/$", "")
    val want = ids.groupBy(i => canon(raw(i))).map { case (u, g) =>
      u -> (g.size.toLong, g.map(raw).distinct.size.toLong, g.min)
    }
    val got = CorpusOps.UrlDedup.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    // the canonicalizer genuinely collapses: strictly fewer keys than docs
    assert(got.size < ids.size, "no variant class collapsed")
    // and every canonical key is clean: no www., no query, no fragment,
    // no trailing slash, all lowercase
    got.keys.foreach { u =>
      assert(!u.contains("www.") && !u.contains("?") && !u.contains("#"))
      assert(!u.endsWith("/") && u == u.toLowerCase)
    }
  }

  test("temperature mixing: exact isqrt weights, monotone share compression") {
    val rows = CorpusOps.TemperatureMixture.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // w really is floor(sqrt(n*1e6)) — recomputed with BigInt sqrt
    rows.foreach { case (s, n, w, _, _, _) =>
      val x = BigInt(n) * 1000000L
      assert(BigInt(w) * w <= x && (BigInt(w) + 1) * (BigInt(w) + 1) > x,
        s"$s: w=$w is not isqrt($x)")
    }
    // alpha = 1/2 compresses shares toward uniform: every source above
    // the natural mean loses ppm, every source below gains
    val meanPpm = 1000000L / rows.length
    rows.foreach { case (s, _, _, nat, temp, _) =>
      if (nat > meanPpm + 1) assert(temp < nat, s"$s: big source must shrink")
      if (nat < meanPpm - 1) assert(temp > nat, s"$s: small source must grow")
    }
    // targets re-allocate (almost) the whole budget: floor rounding can
    // only lose < k_sources tokens total
    val total = rows.map(_._2).sum
    val alloc = rows.map(_._6).sum
    assert(alloc <= total && total - alloc < rows.length,
      s"allocation $alloc vs budget $total")
    spark.catalog.clearCache()
  }
}
