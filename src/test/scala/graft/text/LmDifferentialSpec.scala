package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential proof for the integer-bit LM scorers: an independent,
  * sequential, in-memory Scala implementation of the same math, compared
  * EXACTLY (long-for-long) against the distributed pipelines on
  * deterministic random corpora. This is the engine-side twin of the
  * DuckDB oracle: the oracle proves cross-ENGINE agreement on the real
  * tables; this proves the distributed plan computes the declared
  * function on corpora with adversarial shapes (empty-ish docs, repeated
  * tokens, singleton vocab) that the synthetic tables never produce.
  */
class LmDifferentialSpec extends SparkSpec {
  import spark.implicits._

  /** floor(log2(a/b)) for a >= b >= 1, in pure integer arithmetic. */
  private def bits(a: Long, b: Long): Long =
    63 - java.lang.Long.numberOfLeadingZeros(a / b)

  private def mkCorpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "b", "cc", "ddd", "e", "tok")
    (0L until nDocs).map { id =>
      val n = 1 + rnd.nextInt(12)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  test("q_lm_surprisal pipeline == sequential reference on random corpora") {
    for (seed <- Seq(1, 7, 42)) {
      val corpus = mkCorpus(seed, 30)
      // sequential reference
      val toks = corpus.map { case (id, t) =>
        id -> t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      }
      val occ = toks.flatMap { case (id, ts) =>
        ts.zip(ts.drop(1)).map { case (a, b) => (id, a, b) }
      }
      val c12 = occ.groupBy(o => (o._2, o._3)).map { case (k, v) => k -> v.size.toLong }
      val c1 = occ.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      val v = toks.flatMap(_._2).distinct.size.toLong
      val expected = occ.groupBy(_._1).map { case (id, os) =>
        id -> ((os.size.toLong,
          os.map(o => bits(c1(o._2) + v, c12((o._2, o._3)) + 1)).sum))
      }
      // distributed pipeline
      val docs = corpus.toDF("doc_id", "text")
      val docOcc = LmOps.bigramOccurrences(docs)
      val vocabDf = docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
        .agg(countDistinct(col("tok")).as("v"))
      val got = LmOps.surprisal(docOcc, docOcc, vocabDf).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("bits_total")))).toMap
      assert(got == expected, s"seed $seed: $got != $expected")
    }
  }

  test("q_dsir_score pipeline == sequential reference on random corpora") {
    val B = DsirOps.B
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val corpus = mkCorpus(seed, 24).map { case (id, t) =>
        (id, t, s"src${rnd.nextInt(3)}")
      }
      val tgtSrc = "src0"
      def hash(s: String): Long = {
        val hex = graft.functions.PortableHash.md5Hex(s)
        java.lang.Long.parseLong(hex.substring(0, 15), 16) % B
      }
      val occ = corpus.flatMap { case (id, t, src) =>
        val ts = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
        ts.zip(ts.drop(1)).map { case (a, b) => (id, src, hash(s"$a $b")) }
      }
      val cRaw = occ.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
      val cTgt = occ.filter(_._2 == tgtSrc).groupBy(_._3)
        .map { case (k, v) => k -> v.size.toLong }
      val nRaw = occ.size.toLong
      val nTgt = occ.count(_._2 == tgtSrc).toLong
      val expected = occ.groupBy(_._1).map { case (id, os) =>
        id -> os.map { o =>
          bits(nRaw + B, cRaw(o._3) + 1) -
            bits(nTgt + B, cTgt.getOrElse(o._3, 0L) + 1)
        }.sum
      }
      // distributed pipeline, driven through a temp parquet dir so the
      // query runs its real read path
      val dir = java.nio.file.Files.createTempDirectory("dsir_diff").toString
      corpus.toDF("doc_id", "text", "source").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = DsirOps.DsirScore.run(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bits_delta")).toMap
      assert(got == expected, s"seed $seed: $got != $expected")
    }
  }
}
