package graft.text

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TRAINER — the tokenizer-construction step every LLM
  * data pipeline runs before token counting means anything (the engine's
  * `q_bpe_tokens` / `q_vocab` consume a vocabulary; this builds one).
  *
  * Classic Sennrich-style BPE on the word-frequency dictionary: words
  * split to character symbols; each round counts frequency-weighted
  * ADJACENT symbol pairs across the dictionary, merges the most frequent
  * pair everywhere (greedy left-to-right, the standard semantics), and
  * records it. The learned merge list IS the tokenizer.
  *
  * Scale shape: training runs on the word-frequency DICTIONARY, not the
  * corpus — the standard trick (frequencies weight the pair counts, so
  * the corpus contributes only through the one token-count aggregate,
  * identical to `q_vocab`'s shuffle). The dictionary is capped at
  * [[MaxWords]] head words via a distributed TakeOrdered, so every
  * per-round frame is bounded; each round is one map-side-combinable
  * pair-count aggregate plus a 1-row argmax collect — the same
  * driver-gate stance as PageRank's small-graph gate, [[Merges]] rounds
  * deep. The merge rewrite is a scan-side `aggregate` fold (greedy
  * left-to-right in one pass), no shuffle.
  *
  * ORACLE-CHECKED despite being iterative: the trainer runs a FIXED
  * number of rounds ([[Merges]]), so the oracle unrolls them as CTEs —
  * the same stance as the PageRank oracle. Each round is (pair-count →
  * 1-row argmax → greedy merge), and every piece has an exact SQL twin:
  * pair enumeration is `syms[i], syms[i+1]` over the bracket-wrapped
  * symbol string (identical to the zip_with slices here), the argmax is
  * `ORDER BY cnt DESC, p ASC LIMIT 1` (the same total order), and the
  * greedy left-to-right merge is the literal `replace('(a)(b)','(ab)')`
  * trick differentially proven ≡ [[mergePair]] in BpeTrainSpec. Belt and
  * braces: the spec ALSO differentials the trainer against an independent
  * plain-Scala BPE on the same dictionary.
  */
object BpeTrain {

  /** One learned merge: rank order, the pair, the merged symbol, and the
    * frequency-weighted pair count that won the round.
    */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, pair_count: Long)

  private[text] val Merges = 8
  private[text] val MaxWords = 2000

  /** The word-frequency dictionary BPE trains on: lowercase alpha runs,
    * top [[MaxWords]] by (count desc, word asc) — deterministic,
    * TakeOrdered-distributed, bounded.
    */
  private[text] def wordDict(spark: SparkSession, sfDir: String): DataFrame =
    Graft.table(spark, sfDir, "documents")
      .select(explode(
        regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(MaxWords)

  /** Greedy left-to-right single-pair merge as a scan-side fold: walk the
    * symbol array once, gluing `left`+`right` whenever the accumulator's
    * last element is `left` and the next symbol is `right`. CaseWhen
    * branches evaluate lazily, so the last-element probe never runs on an
    * empty accumulator (ANSI-safe).
    */
  private[text] def mergePair(sym: Column, left: String, right: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) === 0, array(x))
        .when(element_at(acc, size(acc)) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** UTF8String binary order on pair keys — what `orderBy(col("p").asc)`
    * used inside the retired per-round Spark argmax; kept so the
    * driver-side argmax breaks ties identically.
    */
  private[text] def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  /** The greedy left-to-right merge fold of [[mergePair]], replayed on a
    * plain array (same accumulator semantics: replace the accumulator's
    * last element when it is `left` and the incoming symbol is `right`).
    */
  private[text] def mergePairLocal(sym: Array[String], left: String,
      right: String, merged: String): Array[String] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    sym.foreach { x =>
      if (acc.nonEmpty && acc.last == left && x == right)
        acc(acc.length - 1) = merged
      else acc += x
    }
    acc.toArray
  }

  /** Run the trainer, returning the learned merges in rank order.
    *
    * The corpus-scale dictionary build stays distributed (TakeOrdered to
    * [[MaxWords]] rows); the FIXED [[Merges]] rounds then run driver-side
    * on the collected dict — the documented bounded-vocab collect (≤ 2000
    * rows). Each round previously paid a full Spark cycle (pair-count
    * aggregate job, argmax collect, merge-fold materialization + persist
    * + count) over those same ≤ 2000 tiny rows — ~100 % fixed overhead
    * (guide §1.2: fix the distributed algorithm first; a bounded input
    * does not want a cluster). The initial spelling is collected AS
    * COMPUTED BY SPARK (the same `split` expression), the pair argmax
    * breaks ties in UTF8String binary order (what `orderBy(p.asc)` used),
    * and the merge fold replays [[mergePair]]'s accumulator semantics —
    * BpeTrainSpec's independent-implementation differential and the
    * unrolled-CTE oracle both gate the equivalence.
    */
  def train(spark: SparkSession, sfDir: String,
      rounds: Int = Merges): Seq[Merge] = {
    var seqs: Array[(Long, Array[String])] = wordDict(spark, sfDir)
      .select(col("n"), split(col("w"), "").as("sym"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (n, sym) =>
        var i = 0
        while (i < sym.length - 1) {
          val k = (sym(i), sym(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (cnt.isEmpty) done = true
      else {
        // argmax by (cnt desc, "l r" asc in UTF8 binary order) — the
        // exact total order of the retired distributed argmax
        val ((left, right), c) = cnt.reduce { (x, y) =>
          if (x._2 != y._2) { if (x._2 > y._2) x else y }
          else if (utf8Lt(x._1._1 + " " + x._1._2, y._1._1 + " " + y._1._2)) x
          else y
        }
        learned += Merge(r, left, right, left + right, c)
        seqs = seqs.map { case (n, sym) =>
          (n, mergePairLocal(sym, left, right, left + right))
        }
      }
      r += 1
    }
    learned.toSeq
  }

  object BpeMerges extends GraftQuery {
    val name = "q_bpe_merges"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      train(spark, sfDir).toDF()
        .select(col("rank"), col("left"), col("right"), col("merged"),
          col("pair_count"))
        .orderBy("rank")
    }

    /** One training round as three CTEs: weighted adjacent-pair counts
      * over the bracket-string dictionary, the (cnt desc, pair asc)
      * argmax, and the greedy merge via literal replace.
      */
    private def roundCtes(k: Int): String = {
      val prev = s"seq${k - 1}"
      s"""p$k AS (
         |  SELECT syms[i] || ' ' || syms[i+1] AS p, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT n, regexp_extract_all(s, '\\(([^)]*)\\)', 1) AS syms
         |        FROM $prev),
         |       unnest(range(1, len(syms))) AS t(i)
         |  GROUP BY 1),
         |w$k AS (SELECT p, cnt FROM p$k ORDER BY cnt DESC, p ASC LIMIT 1),
         |seq$k AS (
         |  SELECT n, replace(s,
         |    '(' || split_part(p, ' ', 1) || ')(' || split_part(p, ' ', 2) || ')',
         |    '(' || replace(p, ' ', '') || ')') AS s
         |  FROM $prev, w$k)""".stripMargin
    }

    val oracle = Some {
      val head =
        s"""dict AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
           |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
           |    FROM documents)
           |  GROUP BY w ORDER BY n DESC, w ASC LIMIT $MaxWords),
           |seq0 AS (
           |  SELECT n, '(' || array_to_string(string_split(w, ''), ')(') || ')' AS s
           |  FROM dict)""".stripMargin
      val rounds = (1 to Merges).map(roundCtes).mkString(",\n")
      val unions = (1 to Merges).map { k =>
        s"""SELECT CAST($k AS INTEGER) AS rank, split_part(p, ' ', 1) AS "left",
           |       split_part(p, ' ', 2) AS "right", replace(p, ' ', '') AS merged,
           |       cnt AS pair_count FROM w$k""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $head,\n$rounds\n$unions\nORDER BY rank"
    }
  }

  /** BPE APPLICATION with a frozen merge table — the inference half of
    * the tokenizer (train once, apply forever): per source, how many
    * tokens the corpus becomes and the chars-per-token compression.
    *
    * The trick that makes application ORACLE-CHECKABLE where training is
    * not: a word spells as bracket-wrapped symbols (`"(h)(e)(l)(l)(o)"`),
    * and one merge is one literal `replace("(a)(b)", "(ab)")` — both
    * Spark and DuckDB scan left-to-right non-overlapping, which IS
    * greedy BPE order. The brackets give every symbol its OWN open and
    * close boundary, so a match consumes no neighbor's delimiter
    * (back-to-back pairs `(a)(b)(a)(b)` both merge in one pass) and a
    * pair can never match a symbol's prefix (`(a)(b)` ∤ `(a)(bc)`) —
    * differentially proven against [[mergePair]]'s fold in BpeTrainSpec.
    * The merge table is a fixed constant (a frozen tokenizer, the
    * deployment artifact `train` produces), so the whole query is
    * deterministic, scan-side string work + one grouped aggregate — no
    * iteration, no driver gate, exact integers until one final division.
    */
  object BpeApply extends GraftQuery {
    val name = "q_bpe_apply"
    /** Frozen merge list (rank order): common English digraph merges. */
    private[text] val FrozenMerges: Seq[(String, String)] = Seq(
      "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
      "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t")

    /** `"(h)(e)(l)(l)(o)"` → merges applied → token count of the word
      * (= count of `(`).
      */
    private[text] def tokensAfterMerges(word: Column): Column = {
      val wrapped =
        concat(lit("("), array_join(split(word, ""), ")("), lit(")"))
      // literal StringReplace (codegen'd scan of the short symbol string),
      // not regexp — 8 chained replaces sit in the row-scan hot path
      def rep(s: Column, find: String, to: String): Column =
        call_function("replace", s, lit(find), lit(to))
      val merged = FrozenMerges.foldLeft(wrapped) { case (s, (a, b)) =>
        rep(s, s"($a)($b)", s"($a$b)")
      }
      length(merged) - length(rep(merged, "(", ""))
    }

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val words = Graft.table(spark, sfDir, "documents")
        .select(col("source"), explode(
          regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("w"))
      words
        .select(col("source"), length(col("w")).as("chars"),
          tokensAfterMerges(col("w")).as("toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum(col("chars")).cast("long").as("n_chars"),
          sum(col("toks")).cast("long").as("n_tokens"))
        .select(col("source"), col("n_words"), col("n_chars"), col("n_tokens"),
          (col("n_chars").cast("double") / col("n_tokens").cast("double"))
            .as("chars_per_token"))
        .orderBy("source")
    }

    private val replaceChain = FrozenMerges.foldLeft(
      "'(' || array_to_string(string_split(w, ''), ')(') || ')'") {
      case (s, (a, b)) => s"replace($s, '($a)($b)', '($a$b)')"
    }
    val oracle = Some(
      s"""WITH words AS (
         |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |  FROM documents),
         |m AS (SELECT source, w, $replaceChain AS s FROM words),
         |t AS (
         |  SELECT source, length(w) AS chars,
         |         length(s) - length(replace(s, '(', '')) AS toks
         |  FROM m)
         |SELECT source, count(*) AS n_words,
         |       CAST(sum(chars) AS BIGINT) AS n_chars,
         |       CAST(sum(toks) AS BIGINT) AS n_tokens,
         |       CAST(CAST(sum(chars) AS BIGINT) AS DOUBLE)
         |         / CAST(CAST(sum(toks) AS BIGINT) AS DOUBLE) AS chars_per_token
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)
  }
}
