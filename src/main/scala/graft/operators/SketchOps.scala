package graft.operators

import graft.{Graft, GraftQuery}
import graft.functions.PortableHash.pHash28
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators beyond the KMV distinct-count sketch
  * ([[graft.functions.Aggregators]]): frequency estimation under a fixed
  * memory budget. At 100 TB exact per-token counts are themselves large
  * (vocabulary-sized state per combiner is fine; the full long-tail count
  * table can still be billions of rows) — a Count-Min sketch answers
  * point-frequency queries from depth×width cells regardless of corpus
  * size, and its cell grid is a pure two-key aggregate: partial sketches
  * merge by addition, so the map side combines and the shuffle carries at
  * most depth×width rows per partition.
  */
object SketchOps {

  /** Count-Min sketch over document tokens, evaluated against truth.
    *
    * Build: every token occurrence increments `Depth` cells
    * (row r, col = hash_r(token) mod Width). Rather than fanning the raw
    * occurrence stream out `Depth`-fold, the corpus is tokenized ONCE into
    * per-token exact counts (the map-side-combined aggregate the shuffle
    * carries anyway), and the sketch cells sum those counts — the
    * generator fan-out runs over the DISTINCT vocabulary, orders of
    * magnitude smaller than the corpus; the (token, count) frame is
    * persisted because cells and probes both consume it. Probe: the exact
    * top-`TopK` tokens are looked up in the sketch (est = min over rows
    * of the addressed cells); the result reports estimate next to truth,
    * so the oracle certifies both the cell math and the one-sided error
    * (`cms_n >= exact_n` by construction; the spec asserts it, the query
    * exposes `overcount`).
    *
    * Hashes are md5-slice ([[graft.functions.PortableHash]]) so DuckDB
    * replays the exact cell grid. Width 512 / depth 3 at the test corpus
    * scale gives visible-but-small collisions (overcount is nonzero for
    * some probes — the sketch is exercised, not vacuous).
    */
  object CountMin extends GraftQuery {
    val name = "q_countmin"
    private val Depth = 3
    private val Width = 512
    private val TopK = 10
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val exact = Graft.table(spark, sfDir, "documents")
        .select(explode(graft.text.TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("exact_n"))
        // vocab-sized barrier: cells and probes both consume it (released
        // by the caller via clearCache, as with every persisted barrier)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = array((0 until Depth).map(lit): _*)
      val cell = (pHash28(concat(col("r").cast("string"), lit(":"),
        col("token"))) % Width).as("c")
      val cells = exact
        .select(col("token"), col("exact_n"), explode(rows).as("r"))
        .select(col("r"), cell, col("exact_n"))
        .groupBy("r", "c").agg(sum(col("exact_n")).as("cell_n"))
      val probes = exact
        .orderBy(col("exact_n").desc, col("token").asc)
        .limit(TopK)
        .select(col("token"), col("exact_n"), explode(rows).as("r"))
        .select(col("token"), col("exact_n"), col("r"), cell)
      probes.join(cells, Seq("r", "c"))
        .groupBy("token", "exact_n")
        .agg(min(col("cell_n")).as("cms_n"))
        .select(col("token"), col("exact_n"), col("cms_n"),
          (col("cms_n") - col("exact_n")).as("overcount"))
        .orderBy(col("exact_n").desc, col("token").asc)
    }
    val oracle = Some(
      s"""WITH toks AS (
         |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
         |  FROM documents),
         |rows_ AS (SELECT unnest([0, 1, 2]) AS r),
         |cells AS (
         |  SELECT r,
         |         ('0x' || substr(md5(r::VARCHAR || ':' || token), 1, 7))::BIGINT
         |           % $Width AS c,
         |         count(*) AS cell_n
         |  FROM toks CROSS JOIN rows_ GROUP BY 1, 2),
         |probes AS (
         |  SELECT token, count(*) AS exact_n FROM toks GROUP BY 1
         |  ORDER BY exact_n DESC, token LIMIT $TopK),
         |addressed AS (
         |  SELECT p.token, p.exact_n, r.r,
         |         ('0x' || substr(md5(r.r::VARCHAR || ':' || p.token), 1, 7))::BIGINT
         |           % $Width AS c
         |  FROM probes p CROSS JOIN rows_ r)
         |SELECT a.token, a.exact_n, min(cells.cell_n) AS cms_n,
         |       min(cells.cell_n) - a.exact_n AS overcount
         |FROM addressed a JOIN cells ON cells.r = a.r AND cells.c = a.c
         |GROUP BY 1, 2
         |ORDER BY exact_n DESC, token""".stripMargin)
  }

  /** KMV sketch MERGE — the property that makes sketches distributed:
    * per-stratum sketches built independently (one per event_type, the way
    * 1000 executors or 1000 daily partitions would each build their own)
    * and then merged — the global k-min of the UNION OF SKETCHES, never
    * the union of raw sets. The merge law (k smallest of the union of
    * per-stratum k-smallest = k smallest overall, since any global k-min
    * survives its own stratum's top-k) is exactly what the oracle proves:
    * it computes the one-shot global sketch, and the hash-match certifies
    * the merged path equal to it bit-for-bit. Estimator and hash are the
    * q_approx_distinct machinery ([[graft.functions.Aggregators
    * .KmvPortable]]); the merge input is ≤ K × |strata| longs.
    */
  object KmvMerge extends GraftQuery {
    val name = "q_kmv_merge"
    private val K = 256
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      import org.apache.spark.sql.Encoders
      import org.apache.spark.sql.expressions.Window
      val ev = Graft.table(spark, sfDir, "events")
      // per-stratum sketch: k smallest distinct user hashes per event_type
      // (WindowGroupLimit pre-prunes to k per map partition)
      val perStratum = ev
        .select(col("event_type"), pHash60(col("user_id").cast("string")).as("h"))
        .distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy(col("h").asc)))
        .filter(col("rn") <= K)
      val kmvUdaf = udaf(
        new graft.functions.Aggregators.KmvPortable(K), Encoders.scalaLong)
      val merged = perStratum.select(col("h"))
        .agg(kmvUdaf(col("h")).as("kmv_estimate"))
      val exact = ev.agg(
        countDistinct(col("event_type")).as("n_strata"),
        countDistinct(col("user_id")).as("exact_users"))
      exact.crossJoin(broadcast(merged))
        .select(col("n_strata"), col("exact_users"), col("kmv_estimate"))
    }
    val oracle = Some(
      s"""WITH h AS (
         |  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM events),
         |topk AS (
         |  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM h),
         |kmv AS (
         |  SELECT max(h) AS hk, count(*) AS n FROM topk WHERE rn <= $K),
         |ex AS (
         |  SELECT count(DISTINCT event_type) AS n_strata,
         |         count(DISTINCT user_id) AS exact_users
         |  FROM events)
         |SELECT n_strata, exact_users,
         |       CASE WHEN n < $K THEN CAST(n AS DOUBLE)
         |            ELSE ${K - 1}.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)
         |       END AS kmv_estimate
         |FROM ex CROSS JOIN kmv""".stripMargin)
  }

  /** Join-cardinality estimation from Count-Min sketches — the sketch
    * algebra an optimizer's stats layer runs: |A ⋈_k B| estimated as the
    * minimum over depths of the sketch-row inner product
    * Σ_c cmsA[r][c]·cmsB[r][c], reported beside the exact
    * Σ_k cntA(k)·cntB(k). The estimate is one-sided (≥ exact: every true
    * product appears in its cell's product, plus collision cross-terms),
    * which the query exposes as `overcount` and the spec pins. Each side's
    * sketch is depth×width cells built from its per-key count frame —
    * mergeable, bounded state no matter how large the key space — and the
    * inner product is a (depth, cell) equi-join of two tiny grids. The
    * exact side joins the two count frames (key-sized, the stats job a
    * warehouse runs offline).
    */
  object JoinSizeEst extends GraftQuery {
    val name = "q_join_size_est"
    private val Depth = 3
    private val Width = 512
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val rows = array((0 until Depth).map(lit): _*)
      def cell = (pHash28(concat(col("r").cast("string"), lit(":"),
        col("k").cast("string"))) % Width).as("c")
      def counts(df: DataFrame, key: String) =
        df.select(col(key).as("k")).groupBy("k")
          .agg(count(lit(1)).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def sketch(cnts: DataFrame) = cnts
        .select(col("k"), col("n"), explode(rows).as("r"))
        .select(col("r"), cell, col("n"))
        .groupBy("r", "c").agg(sum(col("n")).as("cell_n"))
      val ca = counts(Graft.table(spark, sfDir, "orders"), "o_orderkey")
      val cb = counts(Graft.table(spark, sfDir, "lineitem"), "l_orderkey")
      val est = sketch(ca).as("a")
        .join(sketch(cb).as("b"), Seq("r", "c"))
        .groupBy("r")
        .agg(sum(col("a.cell_n") * col("b.cell_n")).as("ip"))
        .agg(min(col("ip")).as("cms_est"))
      val exactJ = ca.as("ca").join(cb.as("cb"), "k")
        .agg(sum(col("ca.n") * col("cb.n")).as("exact_n"))
      exactJ.crossJoin(est)
        .select(col("exact_n"), col("cms_est"),
          (col("cms_est") - col("exact_n")).as("overcount"))
    }
    val oracle = Some(
      s"""WITH ca AS (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1),
         |cb AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
         |rows_ AS (SELECT unnest([0, 1, 2]) AS r),
         |sa AS (
         |  SELECT r, ('0x' || substr(md5(r::VARCHAR || ':' || k::VARCHAR), 1, 7))::BIGINT
         |           % $Width AS c,
         |         CAST(sum(n) AS BIGINT) AS cell_n
         |  FROM ca CROSS JOIN rows_ GROUP BY 1, 2),
         |sb AS (
         |  SELECT r, ('0x' || substr(md5(r::VARCHAR || ':' || k::VARCHAR), 1, 7))::BIGINT
         |           % $Width AS c,
         |         CAST(sum(n) AS BIGINT) AS cell_n
         |  FROM cb CROSS JOIN rows_ GROUP BY 1, 2),
         |est AS (
         |  SELECT CAST(min(ip) AS BIGINT) AS cms_est FROM (
         |    SELECT sa.r, CAST(sum(sa.cell_n * sb.cell_n) AS BIGINT) AS ip
         |    FROM sa JOIN sb ON sa.r = sb.r AND sa.c = sb.c
         |    GROUP BY 1)),
         |ex AS (
         |  SELECT CAST(sum(ca.n * cb.n) AS BIGINT) AS exact_n
         |  FROM ca JOIN cb USING (k))
         |SELECT exact_n, cms_est, cms_est - exact_n AS overcount
         |FROM ex CROSS JOIN est""".stripMargin)
  }

  /** Bloom-filter URL-seen prefilter — the membership sketch a recrawl
    * frontier runs BEFORE the exact seen-set join. Distinct role from
    * [[LayoutOps.BloomFilter]] (`q_bloom_filter`): that one is the
    * JOIN-side runtime filter (packed bit_or words, the shape a
    * Catalyst runtime-filter rewrite injects ahead of a shuffle join);
    * this one is the standing SEEN-SET sketch a crawl scheduler keeps
    * between runs, so what matters here is the merge law (partials
    * built per partition/day OR together — [[graft.functions.BloomBits]])
    * and the per-host miss/fp truth report. Yesterday's crawl
    * sets K bits per seen URL; today's candidates fetch only if some
    * bit is unset (definitely new) or fall through to the exact check
    * (bloom-positive). The query builds the filter from the "seen"
    * slice (doc_id % 4 != 0) of synthesized per-document URLs, probes
    * the candidate slice (doc_id % 2 = 0) — each side spelling its raw
    * URLs with DIFFERENT variant noise (trailing slash + tracking
    * query vs WWW + fragment), collapsed by the shared FRONTIER
    * canonicalizer ([[graft.text.UrlOps.frontierCanonical]] — round 13:
    * a seen-set key must keep routing queries and path case, so the
    * fixture also plants `?q=<n>` pages that must NOT collapse and
    * case-distinct `/D<id>` candidates that are genuinely new) before
    * any bit math; without that composition the same page hashes to
    * different bits and `n_miss` goes nonzero — and reports the
    * sketch's confusion per
    * host next to ground truth from the exact join it would replace: `n_fp` (bloom-positive but genuinely new — the
    * wasted exact-checks) and `n_miss` (seen but bloom-negative —
    * structurally ZERO, the no-false-negatives property the oracle
    * certifies on every row).
    *
    * Plan shape: the bit array is relational — the DISTINCT occupied
    * positions (≤ M rows regardless of seen-set size) broadcast onto
    * the candidate probes, so the probe side never shuffles. Hashes
    * are md5-slice ([[graft.functions.PortableHash]]) so DuckDB
    * replays the exact bit addressing; a probe passes iff ALL its
    * DISTINCT positions are occupied (two hash rows colliding into one
    * position test one bit — counting matched rows instead would
    * under-pass). M = 2^15 / K = 3 keeps the fixture's load factor low
    * (fp visible at sf0.1, ~zero at sf0.01); production sizes M from
    * the expected insert count (m = -n·ln p / ln²2) and builds the
    * same positions via a fixed byte-array OR-aggregate per partition
    * (the KMV-style merge; SketchOpsSpec pins relation ≡ byte-array
    * decisions and merge associativity).
    */
  object BloomSeen extends GraftQuery {
    val name = "q_bloom_urlseen"
    private[operators] val M = 1 << 15
    private[operators] val K = 3
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // round 12: the two sides synthesize DIFFERENT raw spellings of
      // the same page — yesterday's crawl logged trailing slashes and
      // tracking queries, today's candidates arrive as WWW./fragment
      // variants — so the sketch only works composed with the shared
      // canonicalizer: skip it and the seen probe strings stop
      // matching (n_miss > 0 hash-fails every row).
      // Round 13: the key is the FRONTIER canonicalization
      // ([[graft.text.UrlOps.frontierCanonical]]) — a seen-set must
      // not collapse distinct pages: doc_id%11==0 rows carry a ROUTING
      // `?q=<id%4>` that both sides keep (spelled WITH a utm_source
      // param on the seen side that must strip), and doc_id%13==5
      // candidates arrive at the case-distinct path `/D<id>` that is
      // genuinely NOT the seen `/d<id>` page (paths are
      // case-sensitive) — a whole-query-strip or path-lowercase
      // canonicalizer shifts n_seen/n_fp on those hosts
      val id = col("doc_id").cast("string")
      val hostN = (col("doc_id") % 13).cast("string")
      val routing = when(col("doc_id") % 11 === 0,
        concat(lit("?q="), (col("doc_id") % 4).cast("string")))
        .otherwise(lit(""))
      val seenQuery = when(col("doc_id") % 11 === 0,
        concat(lit("?q="), (col("doc_id") % 4).cast("string"),
          when(col("doc_id") % 5 === 0, lit("&utm_source=1"))
            .otherwise(lit(""))))
        .otherwise(when(col("doc_id") % 5 === 0, lit("?utm_source=1"))
          .otherwise(lit("")))
      val seenRaw = concat(lit("http://s"), hostN, lit(".example/d"), id,
        when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
        seenQuery)
      val candRaw = concat(
        when(col("doc_id") % 3 === 0, lit("HTTP://WWW.s"))
          .otherwise(lit("http://s")), hostN, lit(".example/"),
        when(col("doc_id") % 13 === 5, lit("D")).otherwise(lit("d")), id,
        routing,
        when(col("doc_id") % 7 === 0, lit("#top")).otherwise(lit("")))
      val docs = Graft.table(spark, sfDir, "documents").select(col("doc_id"),
        graft.text.UrlOps.frontierCanonical(seenRaw).as("seen_url"),
        graft.text.UrlOps.frontierCanonical(candRaw).as("cand_url"))
      val seen = docs.filter(col("doc_id") % 4 =!= 0)
        .select(col("doc_id"), col("seen_url").as("url"))
      val cand = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("cand_url").as("url"))
      val ks = array((0 until K).map(lit): _*)
      val pos = (pHash28(concat(col("k").cast("string"), lit(":"),
        col("url"))) % M).as("pos")
      val bits = seen.select(col("url"), explode(ks).as("k"))
        .select(pos).distinct()
      val probed = cand.select(col("doc_id"), col("url"), explode(ks).as("k"))
        .select(col("doc_id"), col("url"), pos)
        .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
        .groupBy("doc_id", "url")
        .agg(countDistinct(col("pos")).as("n_pos"),
          countDistinct(when(col("hit").isNotNull, col("pos"))).as("n_hit"))
        .withColumn("pass", col("n_hit") === col("n_pos"))
      // ground truth: the exact seen-set join the bloom prefilters
      val truth = probed.join(
        seen.select(col("url"), lit(1).as("was_seen")), Seq("url"), "left")
      truth
        .withColumn("host", concat(lit("s"), (col("doc_id") % 13).cast("string")))
        .groupBy("host")
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(col("was_seen").isNotNull, 1L).otherwise(0L)).as("n_seen"),
          sum(when(col("pass") && col("was_seen").isNull, 1L).otherwise(0L))
            .as("n_fp"),
          sum(when(!col("pass") && col("was_seen").isNotNull, 1L)
            .otherwise(0L)).as("n_miss"))
        .orderBy("host")
    }
    val oracle = Some(
      s"""WITH docs AS (
         |  SELECT doc_id,
         |         'http://s' || (doc_id % 13) || '.example/d' || doc_id ||
         |           CASE WHEN doc_id % 11 = 0 THEN '?q=' || (doc_id % 4)
         |                ELSE '' END AS url,
         |         'http://s' || (doc_id % 13) || '.example/' ||
         |           CASE WHEN doc_id % 13 = 5 THEN 'D' ELSE 'd' END ||
         |           doc_id ||
         |           CASE WHEN doc_id % 11 = 0 THEN '?q=' || (doc_id % 4)
         |                ELSE '' END AS cand_url
         |  FROM documents),
         |seen AS (SELECT doc_id, url FROM docs WHERE doc_id % 4 <> 0),
         |cand AS (SELECT doc_id, cand_url AS url FROM docs
         |         WHERE doc_id % 2 = 0),
         |ks AS (SELECT unnest([0, 1, 2]) AS k),
         |bits AS (
         |  SELECT DISTINCT
         |         ('0x' || substr(md5(k || ':' || url), 1, 7))::BIGINT % $M
         |           AS pos
         |  FROM seen CROSS JOIN ks),
         |pr AS (
         |  SELECT doc_id, url,
         |         ('0x' || substr(md5(k || ':' || url), 1, 7))::BIGINT % $M
         |           AS pos
         |  FROM cand CROSS JOIN ks),
         |probed AS (
         |  SELECT pr.doc_id, pr.url,
         |         count(DISTINCT pr.pos) AS n_pos,
         |         count(DISTINCT b.pos) AS n_hit
         |  FROM pr LEFT JOIN bits b ON b.pos = pr.pos
         |  GROUP BY 1, 2),
         |final AS (
         |  SELECT p.doc_id, p.n_hit = p.n_pos AS pass,
         |         s.url IS NOT NULL AS was_seen
         |  FROM probed p LEFT JOIN seen s ON s.url = p.url)
         |SELECT 's' || (doc_id % 13) AS host,
         |       CAST(count(*) AS BIGINT) AS n_candidates,
         |       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_pass,
         |       CAST(sum(CASE WHEN was_seen THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_seen,
         |       CAST(sum(CASE WHEN pass AND NOT was_seen THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_fp,
         |       CAST(sum(CASE WHEN was_seen AND NOT pass THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_miss
         |FROM final GROUP BY 1 ORDER BY host""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(CountMin, KmvMerge, JoinSizeEst, BloomSeen)
}
