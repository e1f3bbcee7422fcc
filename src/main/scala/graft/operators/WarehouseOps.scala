package graft.operators

import graft.{Graft, GraftQuery}
import graft.functions.SafeMath.{exactAvg, exactSum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-shaped analytic queries — the multi-way star-join workloads a
  * 100 TB deployment actually runs (TPC-H flavors over the same star
  * schema: pricing summary, shipping priority, regional volume, returned
  * customers) plus GROUPING SETS and robust-statistics (median/MAD)
  * outlier flagging.
  *
  * Scale stances shared by every query here:
  *   - fact-side filters sit directly on the parquet scan (pushdown +
  *     pruning verified in PLANS.md);
  *   - dimension joins (`region`/`nation`/`supplier`, filtered
  *     `customer`) broadcast — the only repartition-exchanges left are the
  *     fact-table aggregations themselves;
  *   - every money aggregate goes through [[graft.functions.SafeMath]]
  *     decimal summation so results are accumulation-order-independent
  *     (the property that makes the DuckDB hash oracle, AQE re-planning
  *     and speculative re-execution all agree bit-for-bit).
  */
object WarehouseOps {

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  private val RevenueSql =
    "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)"

  /** TPC-H Q1 flavor — the canonical scan-heavy aggregate: one pass over
    * lineitem behind a pushed ship-date filter, grouped to a 6-row result.
    * Pure map-side-combine shape: the exchange carries 6 groups × the
    * partial decimal sums, nothing else, at any scale.
    */
  object PricingSummary extends GraftQuery {
    val name = "q_pricing_summary"
    private val Cutoff = "2001-09-01"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") <= lit(Cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          exactSum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base_price"),
          exactSum(revenue).as("sum_disc_price"),
          exactSum(revenue * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          exactAvg(col("l_quantity")).as("avg_qty"),
          exactAvg(col("l_extendedprice")).as("avg_price"),
          exactAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    val oracle = Some(
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
         |       CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
         |       $RevenueSql AS sum_disc_price,
         |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
         |                     AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
         |       CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
         |         / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
         |       CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
         |         / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
         |       CAST(sum(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE)
         |         / CAST(count(l_discount) AS DOUBLE) AS avg_disc,
         |       count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '$Cutoff'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** TPC-H Q3 flavor — shipping priority: segment-filtered customers ⋈
    * date-filtered orders ⋈ date-filtered lineitem, top-10 orders by
    * revenue. The filtered customer key set broadcasts (a segment is ~1/5
    * of a dimension table); lineitem aggregates on its own join key, so
    * the single wide exchange is the per-order revenue rollup. The top-10
    * is rank-pruned before the final single-partition sort.
    */
  object ShippingPriority extends GraftQuery {
    val name = "q_shipping_priority"
    private val Date = "1998-01-01"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val cust = Graft.table(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Graft.table(spark, sfDir, "orders")
        .filter(col("o_orderdate") < lit(Date).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Graft.table(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") > lit(Date).cast("timestamp"))
        .select(col("l_orderkey"), revenue.as("rev"))
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exactSum(col("rev")).as("revenue"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority").as("priority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }
    val oracle = Some(
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         |       o_orderpriority AS priority,
         |       CAST(sum(CAST(rev AS DECIMAL(27,6))) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT o_orderkey, o_orderdate, o_orderpriority,
         |         l_extendedprice * (1 - l_discount) AS rev
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '$Date'
         |    AND l_shipdate > TIMESTAMP '$Date')
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, o_orderkey ASC
         |LIMIT 10""".stripMargin)
  }

  /** TPC-H Q5 flavor — local-supplier volume in one region: the 6-table
    * star join (region→nation→customer→orders→lineitem→supplier) with the
    * "supplier in the customer's nation" equi-condition. Every dimension
    * chain broadcasts (region×nation prunes customers to one region;
    * supplier is the small side of its join), so the only repartition
    * exchanges are orders⋈lineitem on the order key and the final 5-row
    * nation rollup — the textbook 100 TB star-join shape.
    */
  object RegionalVolume extends GraftQuery {
    val name = "q_regional_volume"
    private val Region = "ASIA"
    private val From = "1996-01-01"
    private val Until = "1998-01-01"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val nat = Graft.table(spark, sfDir, "nation")
        .join(broadcast(Graft.table(spark, sfDir, "region")
            .filter(col("r_name") === Region)),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = Graft.table(spark, sfDir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
      val ord = Graft.table(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit(From).cast("timestamp") &&
          col("o_orderdate") < lit(Until).cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val supp = Graft.table(spark, sfDir, "supplier")
        .select("s_suppkey", "s_nationkey")
      Graft.table(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(exactSum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }
    val oracle = Some(
      s"""SELECT n_name,
         |       $RevenueSql AS revenue,
         |       count(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = '$Region'
         |  AND o_orderdate >= TIMESTAMP '$From'
         |  AND o_orderdate <  TIMESTAMP '$Until'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** TPC-H Q10 flavor — returned-item report: customers ranked by revenue
    * they returned. lineitem('R') ⋈ orders aggregates on the order key,
    * then rolls up per customer; customer + nation broadcast onto the
    * 20-row final. Demonstrates the join→agg→join-dim→top-k pipeline with
    * the dimension attach AFTER the heavy rollup (attach-late: the wide
    * shuffle never carries names).
    */
  object ReturnedCustomers extends GraftQuery {
    val name = "q_returned_customers"
    private val From = "1997-01-01"
    private val Until = "1998-01-01"
    private val K = 20
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ord = Graft.table(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit(From).cast("timestamp") &&
          col("o_orderdate") < lit(Until).cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val returned = Graft.table(spark, sfDir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), revenue.as("rev"))
      val perCust = returned
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(exactSum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
      val cust = Graft.table(spark, sfDir, "customer")
        .join(broadcast(Graft.table(spark, sfDir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name")
      perCust.join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("revenue"), col("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(K)
    }
    val oracle = Some(
      s"""SELECT c_custkey, c_name, n_name,
         |       CAST(sum(CAST(rev AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
         |       count(*) AS n_items
         |FROM (
         |  SELECT o_custkey, l_extendedprice * (1 - l_discount) AS rev
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '$From'
         |    AND o_orderdate <  TIMESTAMP '$Until')
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey ASC
         |LIMIT $K""".stripMargin)
  }

  /** GROUPING SETS — the irregular-rollup shape (rollup and cube are the
    * regular specializations, both already covered): per-status totals,
    * per-priority totals, and the grand total in ONE pass over orders.
    * Spark expands the sets into a single Expand + hash aggregate — the
    * fact table is still scanned once.
    */
  object GroupingSetsAgg extends GraftQuery {
    val name = "q_grouping_sets"
    def run(spark: SparkSession, sfDir: String): DataFrame =
      Graft.table(spark, sfDir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          exactSum(col("o_totalprice")).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("(ALL)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(ALL)")).as("priority"),
          col("n_orders"), col("revenue"))
        .orderBy("status", "priority")
    val oracle = Some(
      """SELECT coalesce(o_orderstatus, '(ALL)') AS status,
        |       coalesce(o_orderpriority, '(ALL)') AS priority,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** Robust outlier flagging via median/MAD — the heavy-tail-safe twin of
    * the 3σ z-score query: per order-status, the positional median of
    * o_totalprice, the median absolute deviation around it, and the count
    * of points beyond 3×MAD. Exact positional medians (same stance as
    * `q_median_price`: rank = (n+1) div 2), so the oracle replays
    * bit-for-bit — deviations are single IEEE subtractions of
    * bit-identical doubles. Plan: two bucket-pruned positional selects
    * ([[RankSelect]] — per-(status, price-band) counts locate each
    * median's bucket and only that bucket's rows are ranked; nothing
    * sorts the full table) + two broadcast joins of the 3-row stats.
    */
  object MadOutliers extends GraftQuery {
    val name = "q_mad_outliers"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // both positional medians via the bucket-pruned RankSelect (r14):
      // the retired shape ran TWO status-keyed row_number windows — at 3
      // statuses, 3 tasks each sorting a third of the table at any scale.
      // Now each median ranks only its median bucket's rows; the dev
      // stream is scanned, never sorted.
      val o = Graft.table(spark, sfDir, "orders")
        .select(col("o_orderstatus").as("status"), col("o_totalprice"),
          col("o_orderkey"))
      val medTarget = (n: org.apache.spark.sql.Column) =>
        array(struct(lit("med").as("tag"), expr("(n + 1) div 2").as("r")))
      // localCheckpoint the 3-row median frame (the q_bucketed_join
      // idiom): dev is referenced three times downstream (the second
      // select's bucket counts, its ranking pass, and the final
      // aggregate) — without the lineage cut each reference re-plans and
      // re-executes the whole first positional select (measured: the
      // naive composition benched SLOWER than the retired full-sort).
      val med = RankSelect.select(
          o.select(col("status").as("grp"), col("o_totalprice").as("v"),
            col("o_orderkey").as("tb")), medTarget)
        .select(col("grp").as("m_status"), col("v").as("med"), col("n"))
        .localCheckpoint(eager = true)
      val dev = o.join(broadcast(med), col("status") === col("m_status"))
        .select(col("status"), col("o_orderkey"),
          abs(col("o_totalprice") - col("med")).as("dev"),
          col("med"), col("n"))
      val mad = RankSelect.select(
          dev.select(col("status").as("grp"), col("dev").as("v"),
            col("o_orderkey").as("tb")), medTarget)
        .select(col("grp").as("d_status"), col("v").as("mad"))
      dev.join(broadcast(mad), col("status") === col("d_status"))
        .groupBy("status")
        .agg(max(col("n")).as("n"), max(col("med")).as("median_price"),
          max(col("mad")).as("mad"),
          sum(when(col("dev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("status")
    }
    val oracle = Some(
      """WITH o AS (
        |  SELECT o_orderstatus AS status, o_totalprice, o_orderkey
        |  FROM orders),
        |ranked AS (
        |  SELECT status, o_totalprice,
        |         row_number() OVER (PARTITION BY status
        |                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        |         count(*) OVER (PARTITION BY status) AS n
        |  FROM o),
        |med AS (
        |  SELECT status AS m_status, o_totalprice AS med, n
        |  FROM ranked WHERE rn = (n + 1) // 2),
        |dev AS (
        |  SELECT status, o_orderkey, abs(o_totalprice - med) AS dev, med, n
        |  FROM o JOIN med ON status = m_status),
        |dranked AS (
        |  SELECT status, dev,
        |         row_number() OVER (PARTITION BY status
        |                            ORDER BY dev ASC, o_orderkey ASC) AS rn,
        |         n
        |  FROM dev),
        |mad AS (
        |  SELECT status AS d_status, dev AS mad
        |  FROM dranked WHERE rn = (n + 1) // 2)
        |SELECT status, max(n) AS n, max(med) AS median_price,
        |       max(mad) AS mad,
        |       CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers
        |FROM dev JOIN mad ON status = d_status
        |GROUP BY status ORDER BY status""".stripMargin)
  }

  /** Corpus mixture planning — the integer arithmetic of "rebalance k
    * sources toward a uniform target": per-source doc counts, the uniform
    * per-source target (total div k), the achievable keep under the cap,
    * and the deficit a mixing recipe would have to fill by upsampling.
    * Pure BIGINT math (no rates, no doubles) so the plan is exact and
    * engine-independent; one source-keyed aggregate + one broadcast of the
    * 1-row totals.
    */
  object MixtureWeights extends GraftQuery {
    val name = "q_mixture_weights"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // persisted barrier: the per-source aggregate feeds both the totals
      // and the report — without it each consumer re-scans documents
      val per = Graft.table(spark, sfDir, "documents")
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = per.agg(sum(col("n_docs")).as("total"),
        count(lit(1)).as("k_sources"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("total"), col("k_sources"),
          expr("total div k_sources").as("target_n"),
          least(col("n_docs"), expr("total div k_sources")).as("planned_keep"),
          greatest(lit(0L), expr("total div k_sources") - col("n_docs"))
            .as("deficit"))
        .orderBy("source")
    }
    val oracle = Some(
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS total,
        |         count(*) AS k_sources FROM per)
        |SELECT source, n_docs, total, k_sources,
        |       total // k_sources AS target_n,
        |       least(n_docs, total // k_sources) AS planned_keep,
        |       greatest(0, total // k_sources - n_docs) AS deficit
        |FROM per CROSS JOIN tot
        |ORDER BY source""".stripMargin)
  }

  /** CDC compaction / last-write-wins snapshot (the SCD-1 companion to
    * [[graft.operators.BehaviorOps.Scd2]]): the latest event per
    * (user_id, event_type) key, totally ordered by (sec, event_id) so
    * same-second writers resolve deterministically. This is the MERGE
    * "upsert → current state" materialization every warehouse maintains.
    *
    * Plan shape: one key-partitioned window with `row_number() = 1` —
    * Spark's WindowGroupLimit pushes the rank-1 filter below the exchange
    * (partial top-1 per key per map partition), so the shuffle carries at
    * most one row per (key, map-partition): the same partial-reduction
    * shape a MERGE-on-read compaction job needs at 100 TB. Values pass
    * through untouched (no arithmetic) — hashes match trivially.
    */
  object LatestSnapshot extends GraftQuery {
    val name = "q_latest_snapshot"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("sec").desc, col("event_id").desc)
      Graft.table(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("value"), expr("ts div 1000000000").as("sec"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("sec").as("last_sec"), col("event_id").as("last_event_id"),
          col("value").as("last_value"))
        .orderBy("user_id", "event_type")
    }
    val oracle = Some(
      """SELECT user_id, event_type, sec AS last_sec,
        |       event_id AS last_event_id, value AS last_value
        |FROM (
        |  SELECT user_id, event_type, event_id, value,
        |         epoch_ns(ts) // 1000000000 AS sec,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_ns(ts) // 1000000000 DESC,
        |                                     event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin)
  }

  /** Snapshot diff — the CDC derivation every warehouse load emits when
    * only full snapshots are available: classify each key across two
    * corpus versions as added / removed / modified / unchanged by FULL
    * OUTER join on the key and content-fingerprint comparison. The two
    * versions are carved deterministically from the documents table by
    * the portable md5 bucket (b=2 docs exist only in v2 → added; b=0
    * docs only in v1 → removed; b=1 docs get revised text in v2 →
    * modified), so the classification — and the md5 fingerprints that
    * decide "modified" — replay exactly in the oracle.
    *
    * Scale shape: one scan feeds both version frames (the bucket carve
    * is scan-side); the diff is ONE full outer join on the key whose
    * shuffle carries (id, 32-byte fingerprint) pairs, never text bodies —
    * the q_contamination argument applied to snapshot reconciliation —
    * and the report is a 4-key aggregate.
    */
  object SnapshotDiff extends GraftQuery {
    val name = "q_snapshot_diff"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val b = pmod(pHash60(col("doc_id").cast("string")), lit(10L))
      // ONE text scan: both versions' fingerprints are computed up front
      // and the persisted barrier carries (id, bucket, 2 × 32-byte fp) —
      // never text — into the two version filters (without it each
      // version side would re-scan and re-hash the corpus)
      val pre = Graft.table(spark, sfDir, "documents")
        .select(col("doc_id"), b.as("b"), md5(col("text")).as("fp"),
          md5(concat(col("text"), lit(" rev2"))).as("fp_rev"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val v1 = pre.filter(col("b") =!= 2)
        .select(col("doc_id"), col("fp").as("fp1"))
      val v2 = pre.filter(col("b") =!= 0)
        .select(col("doc_id"),
          when(col("b") === 1, col("fp_rev")).otherwise(col("fp")).as("fp2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(
          when(col("fp1").isNull, "added")
            .when(col("fp2").isNull, "removed")
            .when(col("fp1") =!= col("fp2"), "modified")
            .otherwise("unchanged").as("status"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("status")
    }
    val oracle = Some(
      """WITH docs AS (
        |  SELECT doc_id, text,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10 AS b
        |  FROM documents),
        |v1 AS (
        |  SELECT doc_id, md5(text) AS fp1 FROM docs WHERE b <> 2),
        |v2 AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN b = 1 THEN text || ' rev2' ELSE text END) AS fp2
        |  FROM docs WHERE b <> 0)
        |SELECT CASE WHEN fp1 IS NULL THEN 'added'
        |            WHEN fp2 IS NULL THEN 'removed'
        |            WHEN fp1 <> fp2 THEN 'modified'
        |            ELSE 'unchanged' END AS status,
        |       count(*) AS n_docs
        |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** MERGE / upsert — applying a CDC change batch (inserts + updates +
    * deletes) to a keyed base snapshot in one pass: the `MERGE INTO`
    * semantics every warehouse load runs, completing the CDC family
    * ([[SnapshotDiff]] classifies the difference; this APPLIES it).
    * The base snapshot and the change batch are carved deterministically
    * from `orders` by the portable md5 key bucket (buckets 0–7 = base;
    * 6/7 = update/delete of existing rows, 8/9 = inserts of new keys), so
    * the whole merge replays in the oracle; updates double the price — an
    * exact power-of-two scaling, bit-identical cross-engine.
    *
    * Plan shape: ONE scan computes bucket + both sides behind a persisted
    * barrier (without it each side of the merge re-scans the table); the
    * merge itself is a single full-outer equi-join on the BIGINT key —
    * shuffle on key only, the distributed-upsert shape that holds at any
    * fact size. Delete rows are dropped by a post-join filter; every
    * surviving row reports its provenance (`kept`/`update`/`insert`).
    */
  object MergeUpsert extends GraftQuery {
    val name = "q_merge_upsert"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val b = pmod(pHash60(col("o_orderkey").cast("string")), lit(10L))
      val pre = Graft.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          b.as("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val base = pre.filter(col("b") < 8)
        .select(col("o_orderkey"), col("o_custkey").as("b_cust"),
          col("o_totalprice").as("b_price"))
      val changes = pre.filter(col("b") >= 6)
        .select(col("o_orderkey"),
          when(col("b") >= 8, "insert").when(col("b") === 6, "update")
            .otherwise("delete").as("op"),
          col("o_custkey").as("c_cust"),
          (col("o_totalprice") * 2).as("new_price"))
      base.join(changes, Seq("o_orderkey"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "delete")
        .select(col("o_orderkey"),
          coalesce(col("c_cust"), col("b_cust")).as("o_custkey"),
          when(col("op").isNotNull, col("new_price")).otherwise(col("b_price"))
            .as("o_totalprice"),
          coalesce(col("op"), lit("kept")).as("status"))
        .orderBy("o_orderkey")
    }
    val oracle = Some(
      """WITH pre AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |         ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT % 10 AS b
        |  FROM orders),
        |base AS (
        |  SELECT o_orderkey, o_custkey AS b_cust, o_totalprice AS b_price
        |  FROM pre WHERE b < 8),
        |changes AS (
        |  SELECT o_orderkey,
        |         CASE WHEN b >= 8 THEN 'insert' WHEN b = 6 THEN 'update'
        |              ELSE 'delete' END AS op,
        |         o_custkey AS c_cust, o_totalprice * 2 AS new_price
        |  FROM pre WHERE b >= 6)
        |SELECT o_orderkey,
        |       coalesce(c_cust, b_cust) AS o_custkey,
        |       CASE WHEN op IS NOT NULL THEN new_price ELSE b_price END
        |         AS o_totalprice,
        |       coalesce(op, 'kept') AS status
        |FROM base FULL OUTER JOIN changes USING (o_orderkey)
        |WHERE op IS NULL OR op <> 'delete'
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** TPC-H Q18 flavor ("large volume customers"): orders whose total
    * lineitem quantity exceeds a threshold, joined back to order + customer
    * detail. The distinctive plan shape — an AGGREGATE-DERIVED filter on
    * the fact table (SQL's HAVING-subquery-in-IN) — is one orderkey
    * aggregate whose survivors then equi-join `orders` (already key-sized)
    * and broadcast-join the customer dimension. Quantities sum through
    * [[graft.functions.SafeMath.exactSum]]'s decimal path: order-
    * independent, hash-exact.
    */
  object LargeOrders extends GraftQuery {
    val name = "q_large_orders"
    private val MinQty = 200.0
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val big = Graft.table(spark, sfDir, "lineitem")
        .groupBy("l_orderkey").agg(exactSum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > MinQty)
      val o = Graft.table(spark, sfDir, "orders")
      val c = Graft.table(spark, sfDir, "customer")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_totalprice"),
          col("sum_qty"))
        .orderBy("o_orderkey")
    }
    val oracle = Some(
      s"""WITH big AS (
         |  SELECT l_orderkey,
         |         CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
         |           AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
         |         > $MinQty)
         |SELECT c_name, o_orderkey, o_totalprice, sum_qty
         |FROM big JOIN orders ON l_orderkey = o_orderkey
         |         JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_orderkey""".stripMargin)
  }

  /** TPC-H Q22 flavor ("global sales opportunity"): high-balance customers
    * with no RECENT orders — per nation, how many such dormant accounts
    * and their total balance. Two classic shapes in one plan: an anti
    * join against the date-filtered fact (the date predicate pushes to
    * the parquet scan, so the anti side builds from a pruned key set) and
    * a scalar-subquery threshold (the 1-row exact average broadcast back
    * onto the customer scan). Balances aggregate decimal-exact.
    */
  object DormantCustomers extends GraftQuery {
    val name = "q_dormant_customers"
    private val Cutoff = "2000-01-01"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val cust = Graft.table(spark, sfDir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(exactAvg(col("c_acctbal")).as("avg_bal"))
      val recent = Graft.table(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= expr(s"TIMESTAMP '$Cutoff'"))
        .select(col("o_custkey").as("c_custkey"))
      val n = Graft.table(spark, sfDir, "nation")
      cust.join(recent, Seq("c_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"), exactSum(col("c_acctbal")).as("total_bal"))
        .orderBy("n_name")
    }
    val oracle = Some(
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
        |         / CAST(count(c_acctbal) AS DOUBLE) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0),
        |dormant AS (
        |  SELECT c.* FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_custkey = c.c_custkey
        |                      AND o.o_orderdate >= TIMESTAMP '2000-01-01'))
        |SELECT n_name, count(*) AS n_cust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
        |         AS total_bal
        |FROM dormant, avg_bal
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > avg_bal
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Incremental aggregate maintenance — the materialized-view pattern
    * that makes nightly loads cheap: the fact is split at an ingest
    * boundary (day 20 of the window, from a 1-row min-day broadcast) into
    * a BASE aggregate and a DELTA aggregate, and the published view is
    * their algebraic merge (counts add, sums add, min/max combine). The
    * oracle recomputes the aggregate from the full fact in one shot, so
    * the green hash CERTIFIES the merge law — the property that lets a
    * 100 TB deployment maintain the view by scanning only the new
    * partition (the same algebra [[SketchOps]]' KMV merge proves for
    * sketches, here for the plain additive aggregates).
    *
    * Both partials are map-side-combinable aggregates over disjoint
    * pushed-down scans; the merge is a union of two TYPE-sized frames.
    */
  object IncrAgg extends GraftQuery {
    val name = "q_incr_agg"
    private val BaseDays = 20
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("event_type"), expr("ts div 86400000000000").as("day"),
          graft.plans.DecimalExpressions.money_cents(col("value")).as("cents"))
      val cut = ev.agg(min(col("day")).as("d0"))
      val tagged = ev.crossJoin(broadcast(cut))
        .withColumn("is_base", col("day") < col("d0") + BaseDays)
      def partial(df: DataFrame) = df.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      val base = partial(tagged.filter(col("is_base")))
      val delta = partial(tagged.filter(!col("is_base")))
      base.unionAll(delta)
        .groupBy("event_type")
        .agg(sum(col("n")).as("n"), sum(col("s")).as("total_cents"),
          min(col("mn")).as("min_cents"), max(col("mx")).as("max_cents"))
        .orderBy("event_type")
    }
    val oracle = Some(
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |       min(CAST(round(value * 100) AS BIGINT)) AS min_cents,
        |       max(CAST(round(value * 100) AS BIGINT)) AS max_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** TPC-H Q14 flavor (promotion effect): per ship month, the share of
    * revenue from PROMO-typed parts. One fact scan with the part
    * dimension broadcast, conditional + total decimal revenue in the SAME
    * aggregate (no second pass), one final IEEE division per month row.
    */
  object PromoShare extends GraftQuery {
    val name = "q_promo_share"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
      val p = Graft.table(spark, sfDir, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM")
          .as("month"))
        .agg(
          exactSum(when(col("p_type").startsWith("PROMO"), revenue)
            .otherwise(lit(0.0))).as("promo_revenue"),
          exactSum(revenue).as("total_revenue"))
        .withColumn("promo_share_pct",
          (lit(100.0) * col("promo_revenue")) / col("total_revenue"))
        .orderBy("month")
    }
    val oracle = Some(
      """WITH m AS (
        |  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
        |         CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
        |                       ELSE CAST(0.0 AS DECIMAL(27,6)) END) AS DOUBLE)
        |           AS promo_revenue,
        |         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
        |           AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT month, promo_revenue, total_revenue,
        |       (100.0 * promo_revenue) / total_revenue AS promo_share_pct
        |FROM m ORDER BY month""".stripMargin)
  }

  /** TPC-H Q4 flavor (order-priority checking): orders with at least one
    * line shipped more than 60 days after the order date, counted per
    * priority. The EXISTS subquery is a LEFT SEMI join with the date gap
    * as a join residual — one pass over each table, no decorrelation
    * machinery, no duplicate-then-distinct.
    */
  object OrderPriority extends GraftQuery {
    val name = "q_order_priority"
    private val LateDays = 60
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Graft.table(spark, sfDir, "orders")
      val li = Graft.table(spark, sfDir, "lineitem")
      o.join(li,
          o("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > o("o_orderdate") + expr(s"INTERVAL $LateDays DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }
    val oracle = Some(
      s"""SELECT o_orderpriority, count(*) AS n_orders
         |FROM orders
         |WHERE EXISTS (
         |  SELECT 1 FROM lineitem
         |  WHERE l_orderkey = o_orderkey
         |    AND l_shipdate > o_orderdate + INTERVAL $LateDays DAY)
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** TPC-H Q17 flavor (small-quantity-order revenue): revenue locked in
    * lines whose quantity is below 20% of their part's average quantity.
    * The correlated scalar subquery (per-part average) is a per-part
    * aggregate joined back onto the fact, and because quantities are
    * integral the threshold `q < 0.2·(Σq/n)` is decided EXACTLY as
    * `5·q·n < Σq` — no float ever enters the predicate, so the row set
    * (and the decimal revenue over it) is engine-exact.
    */
  object SmallQtyRevenue extends GraftQuery {
    val name = "q_small_qty_revenue"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
          col("l_extendedprice"))
      val perPart = li.groupBy("l_partkey")
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("nq"))
      li.join(perPart, "l_partkey")
        .filter(lit(5L) * col("q") * col("nq") < col("sq"))
        .agg(count(lit(1)).as("n_small"),
          exactSum(col("l_extendedprice")).as("revenue"))
    }
    val oracle = Some(
      """WITH pp AS (
        |  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        |         count(*) AS nq
        |  FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_small,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN pp USING (l_partkey)
        |WHERE 5 * CAST(l_quantity AS BIGINT) * nq < sq""".stripMargin)
  }

  /** TPC-H Q7 flavor (volume shipping): the cross-border trade matrix —
    * revenue between DIFFERENT supplier and customer nations. The shape
    * this adds to the star-join family: the SAME dimension (nation) joined
    * twice under different roles, which Catalyst must alias apart. Both
    * nation dims and supplier broadcast; the one real shuffle is
    * lineitem⋈orders on orderkey; customer joins post-shuffle (broadcast
    * at catalog scale, AQE's call beyond).
    */
  object NationTrade extends GraftQuery {
    val name = "q_nation_trade"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Graft.table(spark, sfDir, "lineitem")
      val o = Graft.table(spark, sfDir, "orders")
      val s = Graft.table(spark, sfDir, "supplier")
      val c = Graft.table(spark, sfDir, "customer")
      val n = Graft.table(spark, sfDir, "nation")
      val sn = n.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val cn = n.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      li.join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(count(lit(1)).as("n_lines"), exactSum(revenue).as("revenue"))
        .orderBy("supp_nation", "cust_nation")
    }
    val oracle = Some(
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |       count(*) AS n_lines, $RevenueSql AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE sn.n_name <> cn.n_name
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  val all: Seq[GraftQuery] =
    Seq(PricingSummary, ShippingPriority, RegionalVolume, ReturnedCustomers,
      GroupingSetsAgg, MadOutliers, MixtureWeights, LatestSnapshot,
      SnapshotDiff, MergeUpsert, LargeOrders, DormantCustomers, IncrAgg,
      PromoShare, OrderPriority, SmallQtyRevenue, NationTrade)
}
