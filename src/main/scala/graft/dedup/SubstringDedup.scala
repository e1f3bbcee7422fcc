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
  * bytes, the same budget as any tokenizer pass), ONE hash shuffle on the
  * fixed-width L-char shingle shared by the dup aggregate and the
  * co-partitioned shuffled-hash mark-back semi-join (no broadcast of the
  * corpus-sized dup set), then a
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
      // All L-char windows with their 1-based start position, via the
      // native char_grams kernel (one byte-offset walk, zero-copy slices
      // — the composable transform/substring chain evaluated its lambda
      // interpreted per element and was the operator's dominant cost:
      // 4.1 s of the 7.8 s sf0.1 bench; spec-proven identical).
      // ONE shingle exchange serves both consumers (guide §2.4 "two
      // operations keyed the same way can often share one exchange"):
      // the stream is hash-exchanged on `s` once and PERSISTED; the dup
      // aggregate runs exchange-free on top of it, and the mark-back
      // semi-join sees both sides already HashPartitioning(s), so the
      // grams are exploded and shuffled exactly once (the r14 shuffle
      // audit verifies the sw_rec ratio at ×10 data). The persist is the
      // barrier that GUARANTEES the single materialization: without it
      // the optimizer strips the user repartition below the join's
      // streamed side and plans its own ENSURE_REQUIREMENTS exchange — a
      // different shuffle origin that defeats AQE stage reuse, measured
      // at sf1 shuffling the 18.8M-row gram stream TWICE (54.1M vs
      // 35.3M records). The retired shape was worse still: it paid the
      // string exchange for the aggregate AND re-exploded the corpus to
      // probe a driver-collected BROADCAST of the dup set — 2.1M strings
      // at sf1, i.e. an unbounded broadcast that grows with the corpus
      // (the exact thing that dies first at 100 TB); the shuffled-hash
      // semi join keeps the build side per-partition-bounded instead
      // (partitions scale with data). At 100 TB one spill-to-disk
      // columnar cache + one shuffle strictly beats shuffling the gram
      // stream twice. Measured (w8): sf1 64.0 (round start) → 30.2
      // (pass 1) → 13.3 s; sf0.1 4.4 → 2.2 → ~1.6 s.
      val sh = docs
        .select(col("doc_id"), posexplode(
          graft.plans.CharGramsExpression.char_grams(col("text"), L)))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("s"))
        .repartition(col("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // "appears in >1 distinct doc" ⟺ min(doc_id) ≠ max(doc_id): same dup
      // set as count(DISTINCT doc_id) > 1 in one aggregate (the distinct
      // rewrite shuffled the shingle stream twice).
      val dup = sh.groupBy("s")
        .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
        .filter(col("d0") =!= col("d1"))
        .select("s")
      // left_semi ≡ inner here (dup is key-distinct) but drops the key
      // columns before the probe output is materialized; SHUFFLE_HASH
      // because both sides are already co-partitioned — a sort-merge pick
      // would sort the full gram stream for nothing (guide §3.1).
      val marked = sh.join(dup.hint("shuffle_hash"), Seq("s"), "left_semi")
        .select(col("doc_id"), col("pos"))
      // Island accounting with ONE window function instead of lag+running
      // sum+two aggregate levels: for sorted positions, each row's
      // contribution to the covered-span total is min(next − pos, L)
      // (L when it ends an island — gap > L or last row), and a row ends
      // an island iff next is null or next − pos > L, so
      //   dup_chars = Σ min(next − pos, L)   and   n_spans = Σ [is_end] —
      // the same Σ(e0 − s0) over merged islands (telescoping: an island's
      // internal gaps sum to last − first, its end row adds L). The
      // doc_id-keyed aggregate reuses the window's hash partitioning, so
      // the tail stays shuffle-free; what the rewrite removes is the
      // second WindowExec pass (frame-sliding running sum) and the
      // (doc_id, gid) aggregate level.
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
      val nxt = lead(col("pos"), 1).over(byPos)
      marked
        .withColumn("nxt", nxt)
        .groupBy("doc_id")
        .agg(
          sum(when(col("nxt").isNull || col("nxt") - col("pos") > L, 1L)
            .otherwise(0L)).as("n_spans"),
          sum(coalesce(least(col("nxt") - col("pos"), lit(L)), lit(L)))
            .cast("long").as("dup_chars"))
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
