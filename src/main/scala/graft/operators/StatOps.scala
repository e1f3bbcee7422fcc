package graft.operators

import graft.{Graft, GraftQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical operators: positional quartiles, Pearson correlation, and
  * z-score outlier detection. The moment-based ops (correlation, z-score)
  * run on EXACT integer sums — `value` is a 2-decimal quantity, so
  * `round(value*100)` is a lossless integer encoding, and the five moment
  * sums are order-independent BIGINTs through the shuffle; only the final
  * closed-form expression touches doubles, identically associated in both
  * engines (the same strategy as [[graft.similarity.Similarity.dotExact]]).
  * One hash aggregate per group — no window, no second pass over the fact.
  */
object StatOps {

  /** Positional quartiles per market segment (extends the positional-median
    * rule of [[AnalyticOps.MedianPrice]]): quartile k is the value at rank
    * max(1, ((n+1)*k) div 4) under a total order — no interpolation, so
    * both engines pick the same physical row. One window pass + one
    * conditional aggregate.
    */
  object Quartiles extends GraftQuery {
    val name = "q_quartiles"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders")
      val c = Graft.table(spark, sfDir, "customer")
      // bucket-pruned positional select (RankSelect — the r14 shape):
      // only the ≤3 quartile buckets per segment are ranked, not the
      // whole join output in 5 segment-partition sorts. Duplicate ranks
      // (tiny groups where two quartiles collapse to the same position)
      // emit one row per tag, exactly like the retired min(when(rn = r))
      // per-quartile aggregates.
      val j = o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_mktsegment").as("grp"), col("o_totalprice").as("v"),
          col("o_orderkey").as("tb"))
      val picked = RankSelect.select(j,
        n => array((1 to 3).map(k => struct(lit(s"q$k").as("tag"),
          expr(s"greatest(1, ((n + 1) * $k) div 4)").as("r"))): _*))
      picked.groupBy(col("grp").as("segment"))
        .agg(min(when(col("tag") === "q1", col("v"))).as("q1"),
          min(when(col("tag") === "q2", col("v"))).as("median"),
          min(when(col("tag") === "q3", col("v"))).as("q3"),
          max(col("n")).as("n"))
        .orderBy("segment")
    }
    val oracle = Some(
      """WITH ranked AS (
        |  SELECT c_mktsegment AS segment, o_totalprice,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        |         count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT segment,
        |       min(CASE WHEN rn = greatest(1, ((n + 1) * 1) // 4) THEN o_totalprice END) AS q1,
        |       min(CASE WHEN rn = greatest(1, ((n + 1) * 2) // 4) THEN o_totalprice END) AS median,
        |       min(CASE WHEN rn = greatest(1, ((n + 1) * 3) // 4) THEN o_totalprice END) AS q3,
        |       CAST(max(n) AS BIGINT) AS n
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Per-event-type Pearson correlation between the event value and its
    * JSON-props counter. Five exact BIGINT moment sums per group, then the
    * closed form in doubles — a single map-side-combinable aggregate that
    * scales as one shuffle of 6 longs per group.
    */
  object Correlation extends GraftQuery {
    val name = "q_correlation"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // pairwise-complete observations: rows whose props lack a numeric
      // '$.k' must not enter ANY moment — count(*) would otherwise include
      // rows that sum(y)/sum(x*y) skip, silently skewing r (and the oracle,
      // sharing the flaw, would not catch it)
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("event_type"),
          graft.plans.DecimalExpressions.money_cents(col("value")).as("x"),
          get_json_object(col("props"), "$.k").cast("long").as("y"))
        .filter(col("y").isNotNull)
      val m = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      // all-double closed form: identical operand bits + identical
      // association ⇒ bit-identical across engines (each IEEE op is
      // correctly rounded, so determinism needs only same inputs/shape)
      val nd = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      m.select(col("event_type"), col("n"),
          ((nd * d("sxy") - d("sx") * d("sy")) /
            (sqrt(nd * d("sxx") - d("sx") * d("sx")) *
              sqrt(nd * d("syy") - d("sy") * d("sy")))).as("pearson_r"))
        .orderBy("event_type")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT event_type,
        |         CAST(round(value * 100) AS BIGINT) AS x,
        |         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
        |  FROM events
        |  WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM ev GROUP BY 1)
        |SELECT event_type, n,
        |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |         AS pearson_r
        |FROM m ORDER BY event_type""".stripMargin)
  }

  /** Z-score outlier counts per event type: rows with |x - mean| > 3σ under
    * the population σ derived from the same exact moment sums. Two passes
    * (moments, then the flag filter) but the second pass joins a 5-row
    * broadcast — at scale this is the standard "compute stats, broadcast
    * back onto the scan" shape, and the comparison is between identically
    * computed doubles, so the counts are deterministic.
    * |x-μ| > 3σ ⇔ (n·x − Sx)² > 9·(n·Sxx − Sx²) in exact integer terms —
    * but n·x·n overflows 64-bit at event-table scale, so the comparison
    * runs in doubles, identically associated on both sides.
    */
  object ZScoreOutliers extends GraftQuery {
    val name = "q_zscore_outliers"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("event_type"), graft.plans.DecimalExpressions.money_cents(col("value")).as("x"))
      val m = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"),
          (col("sx").cast("double") / col("n").cast("double")).as("mean"),
          sqrt((col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")))
            .divide(col("n").cast("double")).as("nsigma"))
      // nsigma = sqrt(n*Sxx - Sx^2)/n = population σ; flag |x-mean| > 3σ
      ev.join(broadcast(m), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(abs(col("x").cast("double") - col("mean")) >
            lit(3.0) * col("nsigma"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events),
        |m AS (
        |  SELECT event_type,
        |         CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
        |         sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE)
        |              - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
        |           / CAST(count(*) AS DOUBLE) AS nsigma
        |  FROM ev GROUP BY 1)
        |SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CASE WHEN abs(CAST(x AS DOUBLE) - mean) > 3.0 * nsigma
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM ev JOIN m USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Equal-width numeric histogram of order prices: 20 bins over the
    * global [min, max], bin edges derived from one tiny stats aggregate
    * broadcast back onto the scan (the 1-D sibling of
    * [[graft.similarity.VectorOps.EmbedQuantize]]'s cell math — floor-based
    * so both engines bin identically; the exact max closes into the last
    * bin). Two scans are inherent to data-derived edges; with KNOWN edges
    * it is one scan-side expression.
    */
  object NumericHist extends GraftQuery {
    val name = "q_numeric_hist"
    private val Bins = 20
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders").select(col("o_totalprice").as("x"))
      val stats = o.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      o.crossJoin(broadcast(stats))
        .select(least(floor((col("x") - col("mn")) * Bins / (col("mx") - col("mn"))),
          lit(Bins - 1L)).as("bin"),
          col("x"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("lo"), max(col("x")).as("hi"))
        .orderBy("bin")
    }
    val oracle = Some(
      s"""WITH stats AS (
         |  SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders),
         |binned AS (
         |  SELECT least(CAST(floor((o_totalprice - mn) * $Bins / (mx - mn)) AS BIGINT),
         |               ${Bins - 1}) AS bin,
         |         o_totalprice AS x
         |  FROM orders CROSS JOIN stats)
         |SELECT bin, count(*) AS n, min(x) AS lo, max(x) AS hi
         |FROM binned GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Equal-population deciles of document length (`ntile(10)` over a total
    * order) — the balanced-bucket twin of [[NumericHist]]'s equal-width
    * bins: per decile, population and value span. Used to pick corpus
    * length cutoffs from the distribution rather than fixed thresholds.
    *
    * Scale note: exact positional deciles ARE a global order statement,
    * but they do NOT need a single-task sort — [[Dist.globalNtile]]
    * range-partitions on the order key, numbers rows per partition, adds
    * partition offsets, and re-derives `ntile`'s front-loaded bucket law
    * from the global row number: bit-identical to the serial `ntile`,
    * distributed at any corpus size.
    */
  object LengthDeciles extends GraftQuery {
    val name = "q_length_deciles"
    private val Buckets = 10
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Graft.table(spark, sfDir, "documents")
        .select(col("n_chars"), col("doc_id"))
      Dist.globalNtile(docs, Buckets, "decile",
          col("n_chars").asc, col("doc_id").asc)
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("decile")
    }
    val oracle = Some(
      s"""WITH ranked AS (
         |  SELECT n_chars,
         |         CAST(ntile($Buckets) OVER (ORDER BY n_chars, doc_id) AS INT)
         |           AS decile
         |  FROM documents)
         |SELECT decile, count(*) AS n_docs,
         |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
         |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Single-pass column profiler over `orders` — the null-count /
    * distinct-count / numeric-range report every ingestion pipeline runs
    * before trusting a new drop of data. All metrics come from ONE
    * `groupBy().agg(...)`: Catalyst plans the six exact `countDistinct`s
    * as a single Expand (×6 row multiplication) feeding one scan — the
    * standard multi-distinct shape — and the per-column rows are unpivoted
    * from the 1-row aggregate with `stack`, driver-free. Numeric min/max
    * are passthrough casts (no arithmetic), so every value hash-matches;
    * non-numeric columns report NULL ranges rather than risking
    * engine-specific string/timestamp formatting.
    *
    * At 100 TB the exact-distinct Expand is the honest cost of exact
    * cardinalities; the documented scale alternative is swapping
    * `countDistinct` for `approx_count_distinct` (one pass, no Expand) —
    * same query shape, sketch-valued column.
    */
  object Profile extends GraftQuery {
    val name = "q_profile"
    private val Numeric = Seq("o_orderkey", "o_custkey", "o_totalprice")
    private val NonNumeric = Seq("o_orderstatus", "o_orderpriority")
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val cols = Numeric ++ NonNumeric
      val aggs = cols.flatMap { c =>
        Seq((count(lit(1)) - count(col(c))).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c")) ++
          (if (Numeric.contains(c))
            Seq(min(col(c)).cast("double").as(s"mn_$c"),
              max(col(c)).cast("double").as(s"mx_$c"))
          else Seq.empty)
      }
      val one = Graft.table(spark, sfDir, "orders")
        .agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.map { c =>
        val range =
          if (Numeric.contains(c)) s"mn_$c, mx_$c"
          else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
        s"'$c', nn_$c, nd_$c, $range"
      }.mkString(", ")
      one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nulls, n_distinct, min_num, max_num)")
        .orderBy("column_name")
    }
    val oracle = Some {
      val rows = (Numeric.map { c =>
        s"""SELECT '$c' AS column_name, count(*) - count($c) AS n_nulls,
           |       count(DISTINCT $c) AS n_distinct,
           |       CAST(min($c) AS DOUBLE) AS min_num,
           |       CAST(max($c) AS DOUBLE) AS max_num FROM orders""".stripMargin
      } ++ NonNumeric.map { c =>
        s"""SELECT '$c', count(*) - count($c), count(DISTINCT $c),
           |       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders""".stripMargin
      }).mkString("\nUNION ALL\n")
      s"$rows\nORDER BY column_name"
    }
  }

  /** Time-series spike detection over hourly event volume: each hour is
    * scored against the trailing 24 OBSERVED hour buckets (mean + 3σ rule)
    * — the ingest-monitoring alarm that catches a crawler stampede or a
    * dropped feed between training snapshots.
    *
    * The 3σ test runs ENTIRELY in integer arithmetic: with s = Σn and
    * q = Σn² over the 24 trailing buckets, σ² = (24q − s²)/576 and
    * d = 24n − s, so z > 3 ⇔ d > 0 ∧ d² > 9·(24q − s²) — both sides of
    * the inequality multiplied by the exact positive 576, hence the integer
    * comparison is lossless. The reported
    * z itself is the fixed tree d / sqrt(24q − s²) — one IEEE divide and
    * sqrt, bit-identical cross-engine; NULL while the trailing window is
    * degenerate (σ = 0).
    *
    * Scale shape: one scan folds events into hour buckets via a map-side-
    * combinable count; the single unpartitioned window then sorts TIME
    * BUCKETS, not events — a frame whose row count is the corpus's time
    * span in hours (a year is 8.8k rows), safely single-partition at any
    * data volume.
    */
  object EventSpike extends GraftQuery {
    val name = "q_event_spike"
    private val Trail = 24
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val hourly = Graft.table(spark, sfDir, "events")
        .select(expr("ts div 3600000000000").as("hour"))
        .groupBy("hour").agg(count(lit(1)).as("n"))
      // hour-bucket frame (corpus time span in hours: a year ≈ 8.8k rows),
      // single-partition by design — lit(0) marks the audited bound
      val w = Window.partitionBy(Dist.boundedOne(col("hour"))).orderBy("hour")
        .rowsBetween(-Trail, -1)
      val d = lit(Trail) * col("n") - col("s")
      val varNum = lit(Trail) * col("q") - col("s") * col("s") // 576·σ²
      hourly
        .withColumn("n_trail", count(lit(1)).over(w))
        .withColumn("s", sum(col("n")).over(w))
        .withColumn("q", sum(col("n") * col("n")).over(w))
        .filter(col("n_trail") === Trail)
        .select(col("hour"), col("n"), col("s").as("trail_sum"),
          when(varNum > 0, d.cast("double") / sqrt(varNum.cast("double")))
            .as("z"),
          (d > 0 && d * d > lit(9) * varNum).cast("int").as("spike"))
        .orderBy("hour")
    }
    val oracle = Some(
      s"""WITH hourly AS (
         |  SELECT epoch_ns(ts) // 3600000000000 AS hour, count(*) AS n
         |  FROM events GROUP BY 1),
         |trail AS (
         |  SELECT hour, n,
         |         count(*) OVER w AS n_trail,
         |         sum(n) OVER w AS s,
         |         sum(n * n) OVER w AS q
         |  FROM hourly
         |  WINDOW w AS (ORDER BY hour ROWS BETWEEN $Trail PRECEDING
         |               AND 1 PRECEDING))
         |SELECT hour, n, CAST(s AS BIGINT) AS trail_sum,
         |       CASE WHEN $Trail * q - s * s > 0
         |            THEN CAST($Trail * n - s AS DOUBLE) /
         |                 sqrt(CAST($Trail * q - s * s AS DOUBLE)) END AS z,
         |       CAST($Trail * n - s > 0 AND
         |            ($Trail * n - s) * ($Trail * n - s) >
         |            9 * ($Trail * q - s * s) AS INT) AS spike
         |FROM trail WHERE n_trail = $Trail
         |ORDER BY hour""".stripMargin)
  }

  /** Histogram-based approximate quantiles WITH their exact error — the
    * mergeable-quantile sketch completing the family (KMV = distinct,
    * Count-Min = frequency, Bloom = membership; this = rank): a fixed
    * [[Bins]]-bin equi-width histogram per event type estimates p50/p95
    * as the lower edge of the first bin whose cumulative count reaches
    * the positional rank, with the EXACT positional quantile computed
    * beside it and the absolute error reported. The histogram is the
    * scale path (its partial state is a vector add — the merge law — and
    * the (type, bin) frame is map-side combinable at any volume); the
    * exact side is the evaluation baseline, the same
    * bounded-truth-beside-the-sketch shape as `q_countmin` and the
    * recall queries.
    *
    * Everything is INTEGER: values are lossless cents, bin =
    * ((x−mn)·B) div (mx−mn+1), ranks are the positional
    * max(1, ((n+1)·p) div 100) rule shared with [[Quartiles]], and the
    * estimate mn + (bin·w) div B stays in cents — hash-exact cross-engine
    * with no float anywhere.
    */
  object HistQuantile extends GraftQuery {
    val name = "q_hist_quantile"
    private val Bins = 128L
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("event_type"), col("event_id"),
          graft.plans.DecimalExpressions.money_cents(col("value")).as("x"))
      val stats = ev.groupBy("event_type")
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("mn"), (col("mx") - col("mn") + 1).as("w"),
          greatest(lit(1L), expr("((n + 1) * 50) div 100")).as("r50"),
          greatest(lit(1L), expr("((n + 1) * 95) div 100")).as("r95"))
      val binned = ev.join(broadcast(stats), Seq("event_type"))
      val hist = binned
        .groupBy(col("event_type"), expr(s"((x - mn) * $Bins) div w").as("bin"))
        .agg(count(lit(1)).as("c"))
      val cumW = Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val est = hist.withColumn("cum", sum(col("c")).over(cumW))
        .join(broadcast(stats), Seq("event_type"))
        .groupBy("event_type")
        .agg(min(when(col("cum") >= col("r50"), col("bin"))).as("b50"),
          min(when(col("cum") >= col("r95"), col("bin"))).as("b95"))
        .join(broadcast(stats), Seq("event_type"))
        .select(col("event_type"),
          (col("mn") + expr(s"(b50 * w) div $Bins")).as("est_p50"),
          (col("mn") + expr(s"(b95 * w) div $Bins")).as("est_p95"))
      val rnW = Window.partitionBy("event_type")
        .orderBy(col("x").asc, col("event_id").asc)
      val exact = binned.withColumn("rn", row_number().over(rnW))
        .groupBy("event_type")
        .agg(min(when(col("rn") === col("r50"), col("x"))).as("exact_p50"),
          min(when(col("rn") === col("r95"), col("x"))).as("exact_p95"))
      exact.join(est, Seq("event_type"))
        .select(col("event_type"), col("exact_p50"), col("est_p50"),
          abs(col("est_p50") - col("exact_p50")).as("err_p50"),
          col("exact_p95"), col("est_p95"),
          abs(col("est_p95") - col("exact_p95")).as("err_p95"))
        .orderBy("event_type")
    }
    val oracle = Some(
      s"""WITH ev AS (
         |  SELECT event_type, event_id,
         |         CAST(round(value * 100) AS BIGINT) AS x
         |  FROM events),
         |stats AS (
         |  SELECT event_type, min(x) AS mn, max(x) - min(x) + 1 AS w,
         |         greatest(1, ((count(*) + 1) * 50) // 100) AS r50,
         |         greatest(1, ((count(*) + 1) * 95) // 100) AS r95
         |  FROM ev GROUP BY 1),
         |binned AS (
         |  SELECT ev.*, mn, w, r50, r95, ((x - mn) * $Bins) // w AS bin
         |  FROM ev JOIN stats USING (event_type)),
         |hist AS (
         |  SELECT event_type, bin, count(*) AS c
         |  FROM binned GROUP BY 1, 2),
         |cum AS (
         |  SELECT event_type, bin,
         |         sum(c) OVER (PARTITION BY event_type ORDER BY bin
         |                      ROWS BETWEEN UNBOUNDED PRECEDING
         |                      AND CURRENT ROW) AS cum
         |  FROM hist),
         |est AS (
         |  SELECT c.event_type,
         |         s.mn + (min(CASE WHEN cum >= r50 THEN bin END) * s.w) // $Bins
         |           AS est_p50,
         |         s.mn + (min(CASE WHEN cum >= r95 THEN bin END) * s.w) // $Bins
         |           AS est_p95
         |  FROM cum c JOIN stats s USING (event_type)
         |  GROUP BY 1, s.mn, s.w),
         |exact AS (
         |  SELECT event_type,
         |         min(CASE WHEN rn = r50 THEN x END) AS exact_p50,
         |         min(CASE WHEN rn = r95 THEN x END) AS exact_p95
         |  FROM (SELECT event_type, x, r50, r95,
         |               row_number() OVER (PARTITION BY event_type
         |                                  ORDER BY x, event_id) AS rn
         |        FROM binned)
         |  GROUP BY 1)
         |SELECT event_type, exact_p50, est_p50,
         |       abs(est_p50 - exact_p50) AS err_p50,
         |       exact_p95, est_p95, abs(est_p95 - exact_p95) AS err_p95
         |FROM exact JOIN est USING (event_type)
         |ORDER BY event_type""".stripMargin)
  }

  /** Weighted median — the quantity-weighted median line price per return
    * flag: the smallest value v whose cumulative weight reaches half the
    * total, decided entirely in integers (2·cumw ≥ W — quantities are
    * integral, so no float ever enters the pick). Prices collapse to one
    * row per DISTINCT (flag, cents) first — which both shrinks the sort
    * and makes the answer independent of tie order among equal values
    * (the trap `(l_orderkey, l_linenumber)` non-uniqueness sets for
    * row-level rank formulations). The cumulative window runs per flag
    * over the distinct-value frame; totals ride the same window
    * (unbounded sum), so the op is one aggregate + one window pass.
    */
  object WeightedMedian extends GraftQuery {
    val name = "q_weighted_median"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // two-phase distributed prefix sum (the q_running_total_dist
      // decomposition): the old plan ran the cumulative-weight window
      // partitioned by l_returnflag alone — 3 partitions, i.e. 3 tasks
      // sorting the whole distinct-value set at any scale. Bucketing v
      // (price cents div 2^14 ≈ $164 bands) makes the only big window
      // per-(flag, bucket); the cross-bucket offsets and totals live on
      // the tiny (flag × bucket) frame and broadcast back.
      // Second refinement (r14): the full per-value histogram (a ~N-key
      // hash aggregate — l_extendedprice is near-unique, so perVal was the
      // query's dominant cost) is only ever READ inside the single bucket
      // that contains the median. So: pass 1 aggregates straight to the
      // tiny (flag × bucket) frame (map-side combinable, few hundred
      // groups), locates the median bucket per flag — the FIRST bucket
      // whose end-of-bucket cumulative weight crosses tot/2, which must
      // contain min{v : 2·cumw(v) ≥ tot} — and pass 2 re-scans with a
      // 3-row broadcast semi-filter and builds the per-value cumsum for
      // THAT bucket only (≤ 16384 values per flag). Integer sums are
      // associative, so bucket sums from raw rows equal bucket sums of
      // per-value sums, and the in-bucket cumw equals b_off + the global
      // prefix sum restricted to the bucket — bit-identical selection.
      val li = Graft.table(spark, sfDir, "lineitem")
        .select(col("l_returnflag"),
          graft.plans.DecimalExpressions.money_cents(col("l_extendedprice")).as("v"),
          col("l_quantity").cast("long").as("w"))
        .withColumn("bkt", expr("v div 16384"))
      val bOff = li.groupBy("l_returnflag", "bkt")
        .agg(sum(col("w")).as("bw"))
        .withColumn("b_off", coalesce(sum(col("bw")).over(
          Window.partitionBy("l_returnflag").orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("tot", sum(col("bw")).over(Window.partitionBy("l_returnflag")))
      val mBkt = bOff
        .filter(lit(2L) * (col("b_off") + col("bw")) >= col("tot"))
        .groupBy("l_returnflag").agg(min(col("bkt")).as("bkt"))
        .join(bOff, Seq("l_returnflag", "bkt"))
        .select("l_returnflag", "bkt", "b_off", "tot")
      val inB = Window.partitionBy("l_returnflag", "bkt").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.join(broadcast(mBkt), Seq("l_returnflag", "bkt"))
        .groupBy("l_returnflag", "bkt", "v", "b_off", "tot")
        .agg(sum(col("w")).as("wv"))
        .withColumn("cumw", col("b_off") + sum(col("wv")).over(inB))
        .groupBy("l_returnflag")
        .agg(max(col("tot")).as("total_weight"),
          min(when(lit(2L) * col("cumw") >= col("tot"), col("v")))
            .as("wmedian_cents"))
        .orderBy("l_returnflag")
    }
    val oracle = Some(
      """WITH perval AS (
        |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wv
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT l_returnflag, v,
        |         CAST(sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
        |         CAST(sum(wv) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
        |  FROM perval)
        |SELECT l_returnflag, max(tot) AS total_weight,
        |       min(CASE WHEN 2 * cumw >= tot THEN v END) AS wmedian_cents
        |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** SQL-standard interpolated percentiles (PERCENTILE_CONT semantics)
    * per market segment — the continuous complement of [[Quartiles]]'
    * positional rule. The fractional position (n−1)·p splits EXACTLY in
    * integers (pos100 = (n−1)·k for p = k/100: row index pos100 div 100,
    * fraction pos100 mod 100), so row selection is engine-exact and only
    * the final fixed tree ((100−f)·lo + f·hi)/100 touches doubles. One
    * rank window per segment + one conditional aggregate for all four
    * percentiles.
    */
  object PercentileCont extends GraftQuery {
    val name = "q_percentile_cont"
    private val Ps = Seq(25, 50, 75, 90)
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // bucket-pruned positional select (RankSelect — the r14 shape): the
      // retired spelling ranked the whole join in 5 segment-partition
      // sorts AND exploded the ranked stream ×4 (one copy per percentile)
      // before aggregating; now only the ≤8 percentile-boundary buckets
      // per segment are ranked. v is already exact integer cents, so the
      // bucket override bands it directly (cents are < 2^53, exact as
      // doubles — order and equality preserved through the cast).
      val o = Graft.table(spark, sfDir, "orders")
        .join(Graft.table(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("grp"),
          graft.plans.DecimalExpressions.money_cents(col("o_totalprice"))
            .cast("double").as("v"),
          col("o_orderkey").as("tb"))
      val picked = RankSelect.select(o,
        n => array(Ps.flatMap(p => Seq(
          struct(lit(s"lo$p").as("tag"),
            expr(s"((n - 1) * $p) div 100 + 1").as("r")),
          struct(lit(s"hi$p").as("tag"),
            expr(s"((n - 1) * $p) div 100 + 2").as("r")))): _*),
        bucketOf = Some(v => expr("CAST(v AS BIGINT) div 16384")))
      picked
        .withColumn("p", expr("CAST(substring(tag, 3) AS BIGINT)"))
        .withColumn("kind", expr("substring(tag, 1, 2)"))
        .groupBy(col("grp").as("segment"), col("p"))
        .agg(
          min(when(col("kind") === "lo", col("v").cast("long"))).as("vlo"),
          min(when(col("kind") === "hi", col("v").cast("long"))).as("vhi"),
          max(expr("((n - 1) * p) % 100")).as("f"))
        .select(col("segment"), col("p"),
          (((lit(100L) - col("f")) * col("vlo").cast("double") +
            col("f") * coalesce(col("vhi"), col("vlo")).cast("double")) /
            lit(100.0)).as("pct_cents"))
        .orderBy("segment", "p")
    }
    val oracle = Some(
      s"""WITH j AS (
         |  SELECT c_mktsegment AS segment,
         |         CAST(round(o_totalprice * 100) AS BIGINT) AS v, o_orderkey
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |ranked AS (
         |  SELECT segment, v,
         |         row_number() OVER (PARTITION BY segment
         |                            ORDER BY v ASC, o_orderkey ASC) AS rn,
         |         count(*) OVER (PARTITION BY segment) AS n
         |  FROM j),
         |withp AS (
         |  SELECT * FROM ranked
         |  CROSS JOIN (SELECT CAST(unnest([${Ps.mkString(", ")}]) AS BIGINT) AS p)),
         |agg AS (
         |  SELECT segment, p,
         |         min(CASE WHEN rn = ((n - 1) * p) // 100 + 1 THEN v END) AS vlo,
         |         min(CASE WHEN rn = ((n - 1) * p) // 100 + 2 THEN v END) AS vhi,
         |         max(((n - 1) * p) % 100) AS f
         |  FROM withp GROUP BY 1, 2)
         |SELECT segment, p,
         |       ((100 - f) * CAST(vlo AS DOUBLE)
         |        + f * CAST(coalesce(vhi, vlo) AS DOUBLE)) / 100.0 AS pct_cents
         |FROM agg ORDER BY segment, p""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(Quartiles, Correlation, ZScoreOutliers, NumericHist, LengthDeciles,
      Profile, EventSpike, HistQuantile, WeightedMedian, PercentileCont)
}
