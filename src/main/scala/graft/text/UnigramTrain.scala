package graft.text

import graft.GraftQuery
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINER — the third member of the tokenizer-trainer
  * family next to [[BpeTrain]] (merge-by-frequency) and [[WordPieceTrain]]
  * (merge-by-likelihood): the subword construction SentencePiece popularized
  * (Kudo 2018, "Subword Regularization"). Where BPE/WordPiece GROW a
  * vocabulary by merging, Unigram starts from a large seed inventory of
  * candidate pieces and PRUNES it: segment the corpus under the current
  * piece model (Viterbi), re-estimate piece counts from the winning
  * segmentations, keep the most useful pieces, repeat. This implements the
  * hard-EM (Viterbi-EM) variant of Kudo's trainer — the E-step keeps only
  * the 1-best segmentation — which is the standard deterministic
  * approximation of the full forward–backward E-step.
  *
  * Determinism design (what makes an EM loop hash-checkable): float
  * log-probabilities are replaced by the INTEGER bit-surprisal the engine's
  * LM tier already proved exact ([[LmOps]]):
  *
  *   bits(p) = floor(log2(T / cnt(p))) = length(bin(T div cnt(p))) - 1
  *
  * — the integer part of the Shannon surprisal of piece p under the unigram
  * model P(p) = cnt(p)/T (`floor(log2(a div b)) = floor(log2(a/b))` for
  * a >= b, so integer division loses nothing of the floor-log2). Viterbi
  * minimizes total bits with a total tie-break order
  * (total_bits, n_pieces, '/'-joined piece string) — fewer pieces first,
  * then the lexicographically smallest spelling — so the winning
  * segmentation is unique and replayed bit-for-bit by the DuckDB oracle's
  * identical DP. Both engines walk candidates in the same order over
  * ASCII-only pieces, so every comparison is on identical integer/binary
  * operands: no float enters the trainer anywhere.
  *
  * Scale shape: like its two siblings the trainer runs on the capped
  * word-frequency DICTIONARY (top [[BpeTrain.MaxWords]] words), not the
  * corpus — the corpus contributes through the one token-count aggregate.
  * The seed inventory is a scan-side substring emit over the dictionary
  * followed by one bounded TakeOrdered (top [[SeedMulti]] multi-char pieces
  * + every single character, so the DP is total by construction); the piece
  * model is a <~400-entry map broadcast onto the dictionary scan via the
  * documented `crossJoin(broadcast(1-row))` idiom; the Viterbi DP itself is
  * a scan-side `aggregate` fold (no shuffle, no driver loop — unlike
  * BPE/WordPiece there is no per-round collect at all); usage re-estimation
  * is one piece-keyed aggregate. Two EM rounds are unrolled, matching the
  * oracle's CTE unrolling.
  */
object UnigramTrain {

  /** Longest candidate piece (chars). */
  private[text] val MaxPieceLen = 5

  /** Seed inventory cap for multi-char pieces (single chars always kept). */
  private[text] val SeedMulti = 300

  /** Multi-char pieces surviving the prune (by round-1 Viterbi usage). */
  private[text] val KeepMulti = 150

  /** Frequency-weighted substring counts over the dictionary: every
    * occurrence of every substring of length 1..[[MaxPieceLen]], weighted by
    * the word's corpus count. Scan-side nested transform + one piece-keyed
    * aggregate (the `q_vocab` shuffle shape at corpus scale).
    */
  private[text] def substringCounts(dict: DataFrame): DataFrame =
    dict
      .select(col("n"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))), i =>
          transform(
            sequence(lit(1), least(lit(MaxPieceLen), length(col("w")) - i + 1)),
            t => col("w").substr(i, t))))).as("p"))
      .groupBy("p").agg(sum(col("n")).as("cnt"))

  /** The seed inventory: all single characters (DP totality) plus the top
    * [[SeedMulti]] multi-char substrings by (cnt desc, piece asc) — a
    * bounded distributed TakeOrdered, the same cap stance as the BPE
    * dictionary.
    */
  private[text] def seed(dict: DataFrame): DataFrame = {
    val subs = substringCounts(dict)
    subs.filter(length(col("p")) === 1).unionAll(
      subs.filter(length(col("p")) >= 2)
        .orderBy(col("cnt").desc, col("p").asc).limit(SeedMulti))
  }

  /** Attach the integer bit-cost to each piece of a (p, cnt) inventory:
    * bits = floor(log2(T div cnt)) with T the inventory's total mass. T is
    * a broadcast scalar (1-row crossJoin).
    */
  private[text] def withBitCosts(inv: DataFrame): DataFrame =
    inv.crossJoin(broadcast(inv.agg(sum(col("cnt")).as("t"))))
      .select(col("p"), col("cnt"),
        expr("CAST(length(bin(t div cnt)) - 1 AS BIGINT)").as("bits"))

  /** Fold a (p, cnt, bits) cost table into a 1-row broadcastable map frame. */
  private[text] def costMap(costs: DataFrame): DataFrame =
    costs.agg(map_from_arrays(
      collect_list(col("p")), collect_list(col("bits"))).as("m"))

  /** Viterbi-segment every dictionary word under a broadcast piece-cost map:
    * dp[j] = min over t in 1..min(L, j) of dp[j-t] + bits(w[j-t+1..j]),
    * minimizing (total_bits, n_pieces, piece string) — the unique-winner
    * total order the oracle replays. Entirely scan-side: one `aggregate`
    * fold over the word's positions, candidates enumerated with `transform`,
    * the argmin taken by `array_min`'s struct ordering (field order =
    * tie-break order). Unreachable states cannot occur — the seed contains
    * every single character of every dictionary word.
    */
  private[text] def segment(dict: DataFrame, mapDf: DataFrame): DataFrame = {
    val dpl = aggregate(
      sequence(lit(1), length(col("w"))),
      array(struct(lit(0L).as("bits"), lit(0L).as("np"), lit("").as("seq"))),
      (acc: Column, j: Column) => concat(acc, array(
        array_min(filter(
          transform(sequence(lit(1), least(lit(MaxPieceLen), j)), t => {
            val start = j - t + 1
            val piece = col("w").substr(start, t)
            val pb = element_at(col("m"), piece)
            val prev = element_at(acc, start)
            when(pb.isNotNull, struct(
              (prev.getField("bits") + pb).as("bits"),
              (prev.getField("np") + lit(1L)).as("np"),
              when(prev.getField("seq") === "", piece)
                .otherwise(concat(prev.getField("seq"), lit("/"), piece))
                .as("seq")))
          }),
          c => c.isNotNull)))))
    dict.crossJoin(broadcast(mapDf))
      .withColumn("dpl", dpl)
      .select(col("w"), col("n"),
        element_at(col("dpl"), length(col("w")) + 1).getField("bits")
          .as("total_bits"),
        element_at(col("dpl"), length(col("w")) + 1).getField("np")
          .as("n_pieces"),
        element_at(col("dpl"), length(col("w")) + 1).getField("seq")
          .as("pieces"))
  }

  /** Hard-EM piece usage: frequency-weighted occurrence counts of each piece
    * across the winning segmentations (one piece-keyed aggregate).
    */
  private[text] def usage(seg: DataFrame): DataFrame =
    seg.select(col("n"), explode(split(col("pieces"), "/")).as("p"))
      .groupBy("p").agg(sum(col("n")).as("usage"))

  /** The pruned + re-estimated round-2 inventory: every single character
    * (add-one smoothed — chars a round-1 winner never used keep cnt 1) plus
    * the top [[KeepMulti]] multi-char pieces by (usage desc, piece asc);
    * cnt2 = usage + 1, the M-step re-estimate.
    */
  private[text] def prunedInventory(seedInv: DataFrame, use1: DataFrame): DataFrame = {
    val chars = seedInv.filter(length(col("p")) === 1).select(col("p"))
      .join(use1, Seq("p"), "left")
      .select(col("p"), (coalesce(col("usage"), lit(0L)) + 1).as("cnt"))
    val multi = use1.filter(length(col("p")) >= 2)
      .orderBy(col("usage").desc, col("p").asc).limit(KeepMulti)
      .select(col("p"), (col("usage") + 1).as("cnt"))
    chars.unionAll(multi)
  }

  // ---------------------------------------------------------------------
  // Shared oracle CTEs (DuckDB). Every stage is MATERIALIZED for the same
  // reason as the BPE oracle: the DP and usage levels each reference their
  // predecessor several times and must not inline exponentially.
  // ---------------------------------------------------------------------

  /** The DuckDB twin of [[segment]]: the identical DP as a list_reduce fold
    * — acc is the dp table (a struct list), one dummy element per position
    * triggers one DP step, candidates and tie-break order match the Spark
    * fold term for term (struct field order IS the comparison order in both
    * engines).
    */
  private def segSql(name: String, mapCte: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT w, n,
       |    dpl[len(w)+1].bits AS total_bits,
       |    dpl[len(w)+1].np AS n_pieces,
       |    dpl[len(w)+1].seq AS pieces
       |  FROM (
       |    SELECT w, n, list_reduce(
       |      [[{'bits': 0::BIGINT, 'np': 0::BIGINT, 'seq': ''}]] ||
       |      list_transform(range(1, len(w)+1),
       |        j -> [{'bits': -1::BIGINT, 'np': -1::BIGINT, 'seq': ''}]),
       |      (acc, x) -> acc || [list_aggregate(list_filter(list_transform(
       |        range(1, least($MaxPieceLen, len(acc)) + 1), t ->
       |          CASE WHEN len(element_at(m, w[len(acc)-t+1 : len(acc)])) = 0
       |               THEN NULL
       |               ELSE {'bits': acc[len(acc)-t+1].bits +
       |                       element_at(m, w[len(acc)-t+1 : len(acc)])[1],
       |                     'np': acc[len(acc)-t+1].np + 1,
       |                     'seq': CASE WHEN acc[len(acc)-t+1].seq = ''
       |                       THEN w[len(acc)-t+1 : len(acc)]
       |                       ELSE acc[len(acc)-t+1].seq || '/' ||
       |                            w[len(acc)-t+1 : len(acc)] END}
       |          END), c -> c IS NOT NULL), 'min')]) AS dpl
       |    FROM dict, $mapCte) d)""".stripMargin

  /** CTE prefix shared by all three queries, through the full two-round
    * trainer: dict → subs → seed → cost1/map1 → seg1 → use1 → kept →
    * cost2/map2 → seg2 → use2. [[seedCtes]] is the round-0 prefix
    * (dict through cost1) that `q_unigram_seed` stops at.
    */
  private lazy val ctePair: (String, String) = {
    val dict =
      s"""dict AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |    FROM documents)
         |  GROUP BY w ORDER BY n DESC, w ASC LIMIT ${BpeTrain.MaxWords})""".stripMargin
    val subs =
      s"""subs AS MATERIALIZED (
         |  SELECT w[i : i+t-1] AS p, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM dict,
         |       LATERAL (SELECT unnest(range(1, len(w)+1)) AS i) a,
         |       LATERAL (SELECT unnest(range(1, ${MaxPieceLen + 1})) AS t) b
         |  WHERE i + t - 1 <= len(w)
         |  GROUP BY 1)""".stripMargin
    val seedCte =
      s"""seed AS MATERIALIZED (
         |  SELECT p, cnt FROM subs WHERE len(p) = 1
         |  UNION ALL
         |  SELECT p, cnt FROM (
         |    SELECT p, cnt FROM subs WHERE len(p) >= 2
         |    ORDER BY cnt DESC, p ASC LIMIT $SeedMulti) x)""".stripMargin
    val cost1 =
      """cost1 AS MATERIALIZED (
        |  SELECT p, cnt, CAST(length(bin(t // cnt)) - 1 AS BIGINT) AS bits
        |  FROM seed, (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM seed) tt)""".stripMargin
    val map1 =
      """map1 AS (SELECT map(list(p ORDER BY p), list(bits ORDER BY p)) AS m
        |  FROM cost1)""".stripMargin
    val use1 =
      """use1 AS MATERIALIZED (
        |  SELECT piece AS p, CAST(sum(n) AS BIGINT) AS usage
        |  FROM seg1,
        |       LATERAL (SELECT unnest(string_split(pieces, '/')) AS piece) u
        |  GROUP BY 1)""".stripMargin
    val kept =
      s"""kept AS MATERIALIZED (
         |  SELECT s.p, coalesce(u.usage, 0) + 1 AS cnt
         |  FROM seed s LEFT JOIN use1 u USING (p) WHERE len(s.p) = 1
         |  UNION ALL
         |  SELECT p, usage + 1 AS cnt FROM (
         |    SELECT p, usage FROM use1 WHERE len(p) >= 2
         |    ORDER BY usage DESC, p ASC LIMIT $KeepMulti) y)""".stripMargin
    val cost2 =
      """cost2 AS MATERIALIZED (
        |  SELECT p, cnt, CAST(length(bin(t // cnt)) - 1 AS BIGINT) AS bits
        |  FROM kept, (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM kept) tt)""".stripMargin
    val map2 =
      """map2 AS (SELECT map(list(p ORDER BY p), list(bits ORDER BY p)) AS m
        |  FROM cost2)""".stripMargin
    val use2 =
      """use2 AS MATERIALIZED (
        |  SELECT piece AS p, CAST(sum(n) AS BIGINT) AS usage
        |  FROM seg2,
        |       LATERAL (SELECT unnest(string_split(pieces, '/')) AS piece) u
        |  GROUP BY 1)""".stripMargin
    val prefix = Seq(dict, subs, seedCte, cost1).mkString(",\n")
    val full = (Seq(prefix, map1, segSql("seg1", "map1"), use1,
      kept, cost2, map2, segSql("seg2", "map2"), use2)).mkString(",\n")
    (prefix, full)
  }
  private def seedCtes: String = ctePair._1
  private[text] def trainerCtes: String = ctePair._2

  /** The trained model: (round-2 inventory with bit-costs, round-2
    * Viterbi segmentation of every dictionary word). `q_unigram_vocab`
    * reads both; `q_unigram_apply` broadcasts the segmentation onto the
    * corpus token stream. Persists its bounded upstream frames (the
    * k-means-tier lifecycle convention; harness clearCache releases).
    *
    * Kept as the INDEPENDENT DataFrame implementation the spec
    * differentials [[localTrain]] against (the registered queries serve
    * from the driver-side trainer — see there).
    */
  private[text] def trainedModel(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    val dict = BpeTrain.wordDict(spark, sfDir).persist()
    val seedInv = seed(dict).persist()
    val seg1 = segment(dict, costMap(withBitCosts(seedInv)))
    val cost2 = withBitCosts(prunedInventory(seedInv, usage(seg1))).persist()
    (cost2, segment(dict, costMap(cost2)))
  }

  // ---------------------------------------------------------------------
  // Driver-side trainer (the BpeTrain/WordPieceTrain restructuring): the
  // corpus-scale dictionary build stays distributed, the bounded trainer
  // (2000 words, ≤ ~450 pieces, pure integer/ASCII math) runs in plain
  // Scala. Each DataFrame stage above paid full Spark job cycles over
  // those bounded rows — and the Viterbi DP ran as an interpreted
  // aggregate fold, the costliest expression in the tier. Equivalence is
  // spec-gated: UnigramTrainSpec differentials every readout against
  // independent implementations AND localTrain against the retained
  // DataFrame trainer term for term; the unrolled-CTE oracles gate it
  // against DuckDB at verify time.
  // ---------------------------------------------------------------------

  private[text] final case class LocalModel(
      cost1: Seq[(String, Long, Long)],
      seg1: Seq[(String, Long, Long, Long, String)],
      cost2: Seq[(String, Long, Long)],
      seg2: Seq[(String, Long, Long, Long, String)],
      use2: Map[String, Long])

  /** Plain-Scala two-round hard-EM trainer over the collected dictionary.
    * Every ordering replays the Spark/DuckDB total orders exactly:
    * TakeOrdered ties in UTF8String binary order, the DP argmin on
    * (bits, np, seq) with seq in the same binary order, bit-costs as
    * `length(bin(t div cnt)) - 1` = 63 − numberOfLeadingZeros(t/cnt).
    */
  private[text] def localTrain(dict: Array[(String, Long)]): LocalModel = {
    import scala.collection.mutable
    def utf8Lt(a: String, b: String) = BpeTrain.utf8Lt(a, b)
    // substring counts (the substringCounts shape)
    val subCnt = mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var t = 1
        val tMax = math.min(MaxPieceLen, w.length - i)
        while (t <= tMax) {
          val p = w.substring(i, i + t)
          subCnt.update(p, subCnt.getOrElse(p, 0L) + n)
          t += 1
        }
        i += 1
      }
    }
    // seed: every single char + top SeedMulti multi by (cnt desc, p asc)
    val singles = subCnt.iterator.filter(_._1.length == 1).toSeq
    val multi = subCnt.iterator.filter(_._1.length >= 2).toSeq
      .sortWith((a, b) =>
        if (a._2 != b._2) a._2 > b._2 else utf8Lt(a._1, b._1))
      .take(SeedMulti)
    val seedInv: Seq[(String, Long)] = singles ++ multi
    def costsOf(inv: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
      val t = inv.map(_._2).sum
      inv.map { case (p, c) =>
        (p, c, 63L - java.lang.Long.numberOfLeadingZeros(t / c))
      }
    }
    val cost1 = costsOf(seedInv)
    def viterbi(w: String, n: Long, m: Map[String, Long])
        : (String, Long, Long, Long, String) = {
      // dp(j) = min over candidates of (bits, np, seq) — the segment()
      // fold's array_min over struct(bits, np, seq), field order = order
      val dp = new Array[(Long, Long, String)](w.length + 1)
      dp(0) = (0L, 0L, "")
      var j = 1
      while (j <= w.length) {
        var best: (Long, Long, String) = null
        var t = 1
        val tMax = math.min(MaxPieceLen, j)
        while (t <= tMax) {
          val piece = w.substring(j - t, j)
          val pb = m.get(piece)
          if (pb.isDefined) {
            val prev = dp(j - t)
            val cand = (prev._1 + pb.get, prev._2 + 1L,
              if (prev._3.isEmpty) piece else prev._3 + "/" + piece)
            if (best == null ||
              cand._1 < best._1 ||
              (cand._1 == best._1 && (cand._2 < best._2 ||
                (cand._2 == best._2 && utf8Lt(cand._3, best._3)))))
              best = cand
          }
          t += 1
        }
        dp(j) = best
        j += 1
      }
      val r = dp(w.length)
      (w, n, r._1, r._2, r._3)
    }
    val map1 = cost1.map(c => c._1 -> c._3).toMap
    val seg1 = dict.toSeq.map { case (w, n) => viterbi(w, n, map1) }
    def usageOf(seg: Seq[(String, Long, Long, Long, String)]): Map[String, Long] = {
      val u = mutable.HashMap.empty[String, Long]
      seg.foreach { case (_, n, _, _, pieces) =>
        pieces.split("/").foreach(p => u.update(p, u.getOrElse(p, 0L) + n))
      }
      u.toMap
    }
    val use1 = usageOf(seg1)
    // prune + add-one re-estimate (the prunedInventory shape)
    val keptSingles = seedInv.filter(_._1.length == 1)
      .map { case (p, _) => (p, use1.getOrElse(p, 0L) + 1L) }
    val keptMulti = use1.iterator.filter(_._1.length >= 2).toSeq
      .sortWith((a, b) =>
        if (a._2 != b._2) a._2 > b._2 else utf8Lt(a._1, b._1))
      .take(KeepMulti)
      .map { case (p, u) => (p, u + 1L) }
    val cost2 = costsOf(keptSingles ++ keptMulti)
    val map2 = cost2.map(c => c._1 -> c._3).toMap
    val seg2 = dict.toSeq.map { case (w, n) => viterbi(w, n, map2) }
    LocalModel(cost1, seg1, cost2, seg2, usageOf(seg2))
  }

  /** Collected dictionary + driver-side model. NOT memoized: the trainer
    * readouts (`q_unigram_seed/segment/vocab`) are honest training-cost
    * measurements and recompute per invocation, the
    * `q_classifier_train` stance; only `q_unigram_apply` serves its
    * bounded segmentation table from [[ModelCache]], its pre-existing
    * adjudicated behavior.
    */
  private[text] def localModel(spark: SparkSession, sfDir: String): LocalModel =
    localTrain(BpeTrain.wordDict(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))))

  // ---------------------------------------------------------------------
  // Registered queries
  // ---------------------------------------------------------------------

  /** The seed inventory with its unigram bit-costs — the model the round-1
    * E-step segments under. Bounded output (≤ [[SeedMulti]] + alphabet).
    */
  object UnigramSeed extends GraftQuery {
    val name = "q_unigram_seed"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      localModel(spark, sfDir).cost1.toDF("p", "cnt", "bits")
        .select(col("p").as("piece"),
          length(col("p")).cast("int").as("piece_len"),
          col("cnt"), col("bits"))
        .orderBy("piece")
    }
    val oracle = Some(
      s"""WITH $seedCtes
         |SELECT p AS piece, CAST(len(p) AS INTEGER) AS piece_len, cnt, bits
         |FROM cost1 ORDER BY piece""".stripMargin)
  }

  /** Round-1 Viterbi segmentation of every dictionary word — the hard E-step
    * readout: the unique minimum-bit segmentation under the seed model.
    */
  object UnigramSegment extends GraftQuery {
    val name = "q_unigram_segment"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      localModel(spark, sfDir).seg1
        .toDF("w", "n", "total_bits", "n_pieces", "pieces")
        .orderBy("w")
    }
    val oracle = Some(
      s"""WITH $trainerCtes
         |SELECT w, n, total_bits, n_pieces, pieces FROM seg1 ORDER BY w""".stripMargin)
  }

  /** The trained vocabulary after one full prune round: pruned + re-estimated
    * inventory (cnt = round-1 usage + 1), its re-derived bit-costs, and the
    * round-2 Viterbi usage under the new model — the trainer's fixed-point
    * readout. Bounded output (≤ [[KeepMulti]] + alphabet).
    */
  object UnigramVocab extends GraftQuery {
    val name = "q_unigram_vocab"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val m = localModel(spark, sfDir)
      m.cost2
        .map { case (p, cnt, bits) =>
          (p, cnt, bits, m.use2.getOrElse(p, 0L))
        }
        .toDF("p", "cnt", "bits", "usage")
        .select(col("p").as("piece"),
          length(col("p")).cast("int").as("piece_len"),
          col("cnt"), col("bits"), col("usage"))
        .orderBy("piece")
    }
    val oracle = Some(
      s"""WITH $trainerCtes
         |SELECT c.p AS piece, CAST(len(c.p) AS INTEGER) AS piece_len,
         |       c.cnt, c.bits, coalesce(u.usage, 0) AS usage
         |FROM cost2 c LEFT JOIN use2 u ON c.p = u.p
         |ORDER BY piece""".stripMargin)
  }

  /** Unigram APPLICATION at corpus level — the `q_bpe_apply` readout for
    * the third tokenizer family: tokenize every document with the shared
    * dialect, broadcast the TRAINED model's dictionary segmentations onto
    * the token stream, and report per-source tokenization economics
    * (tokens, out-of-vocabulary fallbacks, total pieces, chars/piece —
    * the compression number a tokenizer exists to improve). OOV words
    * fall back to character segmentation (one piece per char), the
    * standard unigram backstop, counted separately so the fallback rate
    * is visible.
    *
    * Scale shape: the model is a ≤[[BpeTrain.MaxWords]]-row broadcast;
    * the corpus contributes one scan-side token emit + a source-keyed
    * aggregate — nothing token-keyed shuffles.
    */
  object UnigramApply extends GraftQuery {
    val name = "q_unigram_apply"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      // Serve the TRAINED segmentation table from the process-level model
      // cache ([[ModelCache]]): the model is ≤[[BpeTrain.MaxWords]] rows
      // (the bounded broadcast the plan ships anyway), so first execution
      // trains and collects it, later executions measure application
      // only. Deterministic training → identical rows on hit and miss.
      val model: Seq[(String, Long)] =
        ModelCache.getOrElseUpdate(s"unigram:$sfDir", {
          localModel(spark, sfDir).seg2.map(s => (s._1, s._4))
        })
      val toks = graft.Graft.table(spark, sfDir, "documents")
        .select(col("source"), explode(
          regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .as("w"))
      toks.join(broadcast(model.toDF("w", "n_pieces")), Seq("w"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("n_pieces").isNull, 1L).otherwise(0L)).as("n_oov"),
          sum(coalesce(col("n_pieces"), length(col("w")).cast("long")))
            .as("pieces_total"),
          sum(length(col("w")).cast("long")).as("chars_total"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          col("pieces_total"), col("chars_total"),
          (col("chars_total").cast("double") /
            col("pieces_total").cast("double")).as("chars_per_piece"))
        .orderBy("source")
    }
    val oracle = Some(
      s"""WITH $trainerCtes,
         |tok AS (
         |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |  FROM documents)
         |SELECT source, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN s.n_pieces IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  CAST(sum(coalesce(s.n_pieces, len(tok.w))) AS BIGINT)
         |    AS pieces_total,
         |  CAST(sum(len(tok.w)) AS BIGINT) AS chars_total,
         |  CAST(CAST(sum(len(tok.w)) AS BIGINT) AS DOUBLE) /
         |    CAST(CAST(sum(coalesce(s.n_pieces, len(tok.w))) AS BIGINT) AS DOUBLE)
         |    AS chars_per_piece
         |FROM tok LEFT JOIN seg2 s ON tok.w = s.w
         |GROUP BY source ORDER BY source""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(UnigramSeed, UnigramSegment, UnigramVocab, UnigramApply)
}
