package graft.dedup

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication — the positional-shingle
  * formulation of Lee et al. 2022, "Deduplicating Training Data Makes
  * Language Models Better" (public arXiv paper; they build suffix arrays,
  * which don't distribute — the equivalent distributed-friendly statement
  * is: a character belongs to a duplicated span iff some L-gram covering
  * it repeats, and any repeat of length ≥ L is exactly the union of its
  * repeated L-windows).
  *
  * Completes the dedup-family spectrum alongside exact-hash
  * ([[Dedup.ExactDedup]]), MinHash/SimHash (document-level approximate),
  * winnowing fingerprints (`q_winnow_fingerprint`, sampled positional),
  * and SemDeDup (`q_semdedup`, embedding-level): this one is POSITIONAL
  * and EXACT — it localizes which characters of each document are
  * boilerplate shared across documents, the op that licenses span-level
  * (rather than whole-document) removal.
  *
  * Plan shape at scale: one row per character position (linear in corpus
  * bytes, the same budget as any tokenizer pass), one hash shuffle on the
  * fixed-width L-char shingle, one equi-join back to positions, then a
  * doc_id-partitioned window for the gaps-and-islands merge — the
  * (doc_id, gid) and doc_id aggregates after it reuse the window's hash
  * partitioning (subset-clustering satisfaction), so the whole tail is
  * shuffle-free. No similarity joins, no quadratic stage; all arithmetic
  * is integer, so the DuckDB oracle replays it bit-for-bit.
  */
object SubstringDedup {

  /** Window length in characters. 20 ≈ the paper's 50-token threshold
    * scaled to this corpus's short synthetic documents; fixed so the
    * oracle text is static.
    */
  val L = 20

  /** Per-document duplicated-span accounting: the spans of characters
    * covered by at least one 20-gram that also appears in ANOTHER
    * document, merged into maximal islands. Output: one row per document
    * that has any cross-document repeat — (doc_id, n_spans, dup_chars).
    */
  object SubstringDupes extends GraftQuery {
    val name = "q_substring_dupes"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      dupeSpans(Graft.table(spark, sfDir, "documents"))

    /** The operator body over any (doc_id, text) frame — split out so the
      * spec can drive it with handcrafted corpora.
      */
    def dupeSpans(docsIn: DataFrame): DataFrame = {
      val docs = docsIn
        .filter(length(col("text")) >= L)
        .select(col("doc_id"), col("text"))
      // All L-char windows with their 1-based start position. This frame
      // is read twice (dup-set build + position mark-back) but NOT
      // persisted: it is corpus_chars rows × ~32 B — a barrier here would
      // materialize ~30× the corpus, while recomputing it is one more
      // gram explode over the base scan. The explode runs the native
      // char_grams kernel (one byte-offset walk, zero-copy slices) — the
      // composable transform/substring chain evaluated its lambda
      // interpreted per element and re-walked the string per gram, and
      // was the operator's dominant cost (4.1 s of the 7.8 s sf0.1
      // bench; spec-proven identical).
      val sh = docs
        .select(col("doc_id"), posexplode(
          graft.plans.CharGramsExpression.char_grams(col("text"), L)))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("s"))
      val dup = sh.groupBy("s")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select("s")
      val marked = sh.join(dup, "s").select(col("doc_id"), col("pos"))
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
      val brk = when(lag(col("pos"), 1).over(byPos).isNull ||
        col("pos") > lag(col("pos"), 1).over(byPos) + L, 1).otherwise(0)
      val spans = marked
        .withColumn("brk", brk)
        .withColumn("gid", sum(col("brk")).over(
          byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("doc_id", "gid")
        .agg(min(col("pos")).as("s0"), (max(col("pos")) + L).as("e0"))
      spans.groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("e0") - col("s0")).cast("long").as("dup_chars"))
        .orderBy("doc_id")
    }

    val oracle = Some(
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE len(text) >= $L),
         |sh AS (
         |  SELECT doc_id, CAST(i AS INT) AS pos, substr(text, CAST(i AS INT), $L) AS s
         |  FROM d, LATERAL unnest(range(1, len(text) - $L + 2)) t(i)),
         |dup AS (SELECT s FROM sh GROUP BY s HAVING count(DISTINCT doc_id) > 1),
         |marked AS (SELECT doc_id, pos FROM sh JOIN dup USING (s)),
         |w AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
         |                OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + $L
         |              THEN 1 ELSE 0 END AS brk
         |  FROM marked),
         |isl AS (SELECT doc_id, pos,
         |               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |                              ROWS UNBOUNDED PRECEDING) AS gid
         |        FROM w),
         |spans AS (SELECT doc_id, gid, min(pos) AS s0, max(pos) + $L AS e0
         |          FROM isl GROUP BY 1, 2)
         |SELECT doc_id, count(*) AS n_spans,
         |       CAST(sum(e0 - s0) AS BIGINT) AS dup_chars
         |FROM spans GROUP BY 1 ORDER BY doc_id""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(SubstringDupes)
}
