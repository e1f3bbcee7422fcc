package graft.text

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece TRAINER — the likelihood-scored sibling of [[BpeTrain]]
  * (the construction the BERT-family tokenizers use, per the published
  * algorithm: Schuster & Nakajima 2012 / the BERT paper's description).
  * Where BPE merges the most FREQUENT adjacent pair, WordPiece merges
  * the pair maximizing score = count(pair) / (count(left)·count(right))
  * — the pair whose merge most increases corpus likelihood under a
  * unigram model. Continuation symbols carry the `##` prefix: "hello"
  * starts as `h ##e ##l ##l ##o`, and merging (`h`,`##e`) yields `he`.
  *
  * Scale shape: identical to [[BpeTrain]] — training runs on the capped
  * word-frequency dictionary, each round is two map-side-combinable
  * aggregates (pair counts + symbol counts) joined for the score, a
  * 1-row argmax collect (the documented bounded driver gate), and a
  * scan-side greedy merge fold. No corpus-sized shuffle after the one
  * dictionary build.
  *
  * ORACLE-CHECKED like BPE: rounds unroll as CTEs. The score argmax is
  * exact on both sides — cnt, nl, nr are integers < 2^53, and both
  * engines compute the same IEEE double `cnt / (nl·nr)`, so the
  * (score DESC, pair ASC) total order is bit-identical; pair counts,
  * symbol counts, and the bracket-string merge replay use the same SQL
  * twins BpeTrain's oracle proved (`q_bpe_merges`). The spec
  * additionally differentials the trainer against an independent
  * plain-Scala WordPiece on the same dictionary.
  */
object WordPieceTrain {

  final case class Merge(rank: Int, left: String, right: String,
      merged: String, pair_count: Long, score: Double)

  private[text] val Merges = 8
  private[text] val MaxWords = BpeTrain.MaxWords

  /** Initial WordPiece spelling: first character bare, continuations
    * `##`-prefixed.
    */
  private[text] def initialSyms(word: Column): Column =
    zip_with(split(word, ""), sequence(lit(1), length(word)),
      (ch, i) => when(i === 1, ch).otherwise(concat(lit("##"), ch)))

  /** Greedy left-to-right merge of (left, right) → merged, the
    * [[BpeTrain.mergePair]] fold generalized to a caller-chosen merged
    * symbol (WordPiece strips the continuation prefix when gluing).
    */
  private[text] def mergePair(sym: Column, left: String, right: String,
      merged: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) === 0, array(x))
        .when(element_at(acc, size(acc)) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))

  private[text] def mergedName(left: String, right: String): String =
    left + right.stripPrefix("##")

  /** Run the trainer, returning learned merges in rank order. */
  def train(spark: SparkSession, sfDir: String,
      rounds: Int = Merges): Seq[Merge] = {
    var seqs = BpeTrain.wordDict(spark, sfDir)
      .select(col("n"), initialSyms(col("w")).as("sym"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val symCounts = seqs
        .select(col("n"), explode(col("sym")).as("s"))
        .groupBy("s").agg(sum(col("n")).as("cnt"))
      val best = seqs
        .select(col("n"), explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("n")).as("cnt"))
        .join(broadcast(symCounts.withColumnRenamed("s", "l")
          .withColumnRenamed("cnt", "nl")), "l")
        .join(broadcast(symCounts.withColumnRenamed("s", "r")
          .withColumnRenamed("cnt", "nr")), "r")
        .select(col("l"), col("r"), col("cnt"),
          (col("cnt").cast("double") /
            (col("nl") * col("nr")).cast("double")).as("score"))
        .orderBy(col("score").desc, concat_ws(" ", col("l"), col("r")).asc)
        .limit(1)
        .collect() // 1-row argmax — the documented per-round driver gate
      if (best.isEmpty) done = true
      else {
        val left = best(0).getString(0); val right = best(0).getString(1)
        val cnt = best(0).getLong(2); val score = best(0).getDouble(3)
        val m = mergedName(left, right)
        learned += Merge(r, left, right, m, cnt, score)
        val next = seqs
          .withColumn("sym", mergePair(col("sym"), left, right, m))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        seqs.unpersist()
        seqs = next
      }
      r += 1
    }
    seqs.unpersist()
    learned.toSeq
  }

  object WordPieceMerges extends GraftQuery {
    val name = "q_wordpiece_merges"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      train(spark, sfDir).toDF()
        .select(col("rank"), col("left"), col("right"), col("merged"),
          col("pair_count"), col("score"))
        .orderBy("rank")
    }

    /** One training round as CTEs: symbol counts + pair counts over the
      * bracket-string dictionary, the score argmax, and the greedy merge
      * via literal replace (merged = left || right minus the `##`).
      */
    /** Every CTE is MATERIALIZED: each level references its predecessor
      * several times (x→prev, seq→prev+w, w→p+c×2), so default inlining
      * would expand the chain exponentially across [[Merges]] rounds.
      */
    private def roundCtes(k: Int): String = {
      val prev = s"seq${k - 1}"
      s"""x$k AS MATERIALIZED (
         |  SELECT n, regexp_extract_all(s, '\\(([^)]*)\\)', 1) AS syms
         |  FROM $prev),
         |c$k AS MATERIALIZED (
         |  SELECT syms[i] AS s, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM x$k, unnest(range(1, len(syms) + 1)) AS t(i)
         |  GROUP BY 1),
         |p$k AS MATERIALIZED (
         |  SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM x$k, unnest(range(1, len(syms))) AS t(i)
         |  GROUP BY 1, 2),
         |w$k AS MATERIALIZED (
         |  SELECT p$k.l, p$k.r, p$k.cnt,
         |         CAST(p$k.cnt AS DOUBLE) / CAST(cl.cnt * cr.cnt AS DOUBLE) AS score
         |  FROM p$k, c$k cl, c$k cr
         |  WHERE cl.s = p$k.l AND cr.s = p$k.r
         |  ORDER BY score DESC, l || ' ' || r ASC LIMIT 1),
         |seq$k AS MATERIALIZED (
         |  SELECT n, replace(s,
         |    '(' || w$k.l || ')(' || w$k.r || ')',
         |    '(' || w$k.l || replace(w$k.r, '##', '') || ')') AS s
         |  FROM $prev, w$k)""".stripMargin
    }

    val oracle = Some {
      val head =
        s"""dict AS MATERIALIZED (
           |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
           |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
           |    FROM documents)
           |  GROUP BY w ORDER BY n DESC, w ASC LIMIT $MaxWords),
           |seq0 AS MATERIALIZED (
           |  SELECT n, '(' || array_to_string(
           |    list_transform(string_split(w, ''),
           |      (ch, i) -> CASE WHEN i = 1 THEN ch ELSE '##' || ch END),
           |    ')(') || ')' AS s
           |  FROM dict)""".stripMargin
      val rounds = (1 to Merges).map(roundCtes).mkString(",\n")
      val unions = (1 to Merges).map { k =>
        s"""SELECT CAST($k AS INTEGER) AS rank, l AS "left", r AS "right",
           |       l || replace(r, '##', '') AS merged, cnt AS pair_count, score
           |       FROM w$k""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $head,\n$rounds\n$unions\nORDER BY rank"
    }
  }

  val all: Seq[GraftQuery] = Seq(WordPieceMerges)
}
