package graft.operators

import graft.{Graft, GraftQuery}
import graft.functions.PortableHash.pHash28
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-integrity audits — the checks a warehouse load or a training-data
  * ingest runs before promoting a snapshot. Complements [[StatOps.Profile]]
  * (per-column stats) and [[Salting.KeySkew]] (join-key health) with the
  * cross-table dimension: referential integrity.
  */
object AuditOps {

  /** Referential-integrity audit: for every foreign-key edge of the star
    * schema, count child rows whose key has no parent (orphans), the
    * distinct orphan keys, and the orphan ratio. The clean edges are
    * audited as-is (expected 0 — a valid audit outcome the oracle pins);
    * one deliberately-degraded edge drops a deterministic md5-half of the
    * parent side, proving the detection path end-to-end at data scale.
    *
    * Scale shape: each edge is ONE left join child⋈parent-keys (Catalyst
    * broadcasts the small dims; the fact-fact edge shuffles on the key,
    * which is the join the warehouse already pays) aggregated to a single
    * row — no row-level data ever leaves the join, only counts. The five
    * audit rows union driver-side.
    */
  object OrphanAudit extends GraftQuery {
    val name = "q_orphan_audit"

    /** (relation label, child rows with `k`, parent keys as `k`).
      *
      * r14 shape: the child stream is pre-aggregated per key BEFORE the
      * parent join. The old spelling's `count + countDistinct` pair
      * planned as an Expand (2× the joined child stream) feeding a
      * k-keyed aggregate; aggregating to (k, cnt) first pays the same
      * k-keyed exchange WITHOUT the doubling, the parent join probes one
      * row per distinct key, and n_orphan_keys degenerates to a plain
      * filtered count (rows are per-key now). n_rows = Σ cnt and
      * n_orphans = Σ cnt over absent keys are the same integer sums
      * re-associated — bit-identical.
      */
    private[graft] def audit(label: String, child: DataFrame, parent: DataFrame): DataFrame = {
      val p = parent.distinct().withColumn("present", lit(1))
      child.groupBy("k").agg(count(lit(1)).as("cnt"))
        .join(p, Seq("k"), "left")
        .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("present").isNull, col("cnt"))), lit(0L))
            .as("n_orphans"),
          count(when(col("present").isNull, lit(1))).as("n_orphan_keys"))
        .select(lit(label).as("relation"), col("n_rows"), col("n_orphans"),
          col("n_orphan_keys"),
          (col("n_orphans").cast("double") / col("n_rows").cast("double"))
            .as("orphan_ratio"))
    }

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      def t(n: String) = Graft.table(spark, sfDir, n)
      val customerKeys = t("customer").select(col("c_custkey").as("k"))
      // deterministic md5-half of the parent: simulates a partial dim load
      val degradedCustomer = t("customer")
        .select(col("c_custkey").as("k"))
        .filter(pHash28(concat(lit("ri:"), col("k").cast("string"))) % 2 === 0)
      audit("lineitem->orders", t("lineitem").select(col("l_orderkey").as("k")),
          t("orders").select(col("o_orderkey").as("k")))
        .unionAll(audit("lineitem->part", t("lineitem").select(col("l_partkey").as("k")),
          t("part").select(col("p_partkey").as("k"))))
        .unionAll(audit("lineitem->supplier", t("lineitem").select(col("l_suppkey").as("k")),
          t("supplier").select(col("s_suppkey").as("k"))))
        .unionAll(audit("orders->customer", t("orders").select(col("o_custkey").as("k")),
          customerKeys))
        .unionAll(audit("orders->customer_degraded",
          t("orders").select(col("o_custkey").as("k")), degradedCustomer))
        .orderBy("relation")
    }

    val oracle = Some(
      """WITH edges AS (
        |  SELECT 'lineitem->orders' AS relation, l_orderkey AS k,
        |         k IN (SELECT o_orderkey FROM orders) AS present
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem->part', l_partkey,
        |         l_partkey IN (SELECT p_partkey FROM part)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem->supplier', l_suppkey,
        |         l_suppkey IN (SELECT s_suppkey FROM supplier)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders->customer', o_custkey,
        |         o_custkey IN (SELECT c_custkey FROM customer)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders->customer_degraded', o_custkey,
        |         o_custkey IN (SELECT c_custkey FROM customer
        |                       WHERE ('0x' || substr(md5('ri:' || c_custkey::VARCHAR), 1, 7))::BIGINT % 2 = 0)
        |  FROM orders)
        |SELECT relation, count(*) AS n_rows,
        |       count(*) FILTER (WHERE NOT present) AS n_orphans,
        |       count(DISTINCT k) FILTER (WHERE NOT present) AS n_orphan_keys,
        |       CAST(count(*) FILTER (WHERE NOT present) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS orphan_ratio
        |FROM edges GROUP BY relation ORDER BY relation""".stripMargin)
  }

  /** Order-independent table checksum — the migration-validation primitive:
    * a single fingerprint over every row of `orders` that two engines (or
    * two copies, or before/after a rewrite) can compare without moving the
    * data. Row fingerprint = portable md5-60 of a canonical string encoding
    * (money as integer cents, timestamps formatted — doubles never
    * stringified, their engine-specific rendering would break the
    * portability this op exists for); table checksum = DECIMAL(38,0) sum
    * of row fingerprints, order-independent by construction, so partial
    * aggregation, AQE and any partitioning all produce the identical
    * value. Emitted as a string (DuckDB's HUGEINT and Spark's decimal
    * then compare equal byte-for-byte).
    */
  object TableChecksum extends GraftQuery {
    val name = "q_table_checksum"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val canon = concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.plans.DecimalExpressions.money_cents(col("o_totalprice")),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        col("o_orderpriority"))
      Graft.table(spark, sfDir, "orders")
        .select(pHash60(canon).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("string").as("checksum"))
    }
    val oracle = Some(
      """SELECT count(*) AS n_rows,
        |       CAST(sum(('0x' || substr(md5(
        |         o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|'
        |         || CAST(round(o_totalprice * 100) AS BIGINT) || '|'
        |         || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '|'
        |         || o_orderpriority), 1, 15))::BIGINT) AS VARCHAR) AS checksum
        |FROM orders""".stripMargin)
  }

  /** Key-contiguity audit — missing-range detection over a supposedly
    * dense surrogate key. The synthetic keys ARE dense, so (exactly like
    * [[OrphanAudit]]'s degraded parent) the audit runs against a
    * deterministically DEGRADED key set (every key whose md5-60 ≡ 0
    * mod 97 is dropped) and must recover those holes as (gap_start,
    * gap_end) ranges — proving the detection path with a
    * fixture-independent oracle.
    *
    * Scale shape: the two-phase bucket decomposition a third time —
    * within-bucket gaps from a lag window under HashPartitioning(bkt),
    * cross-boundary gaps from a lag over the BUCKET-sized min/max frame;
    * no global window over the keys. Top-10 widest gaps reported.
    */
  object IdGapAudit extends GraftQuery {
    val name = "q_id_gap_audit"
    private val B = 1000L
    private val K = 10
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val keys = Graft.table(spark, sfDir, "orders")
        .select(col("o_orderkey").as("k"))
        .filter(pmod(pHash60(col("k").cast("string")), lit(97L)) =!= 0L)
        .withColumn("bkt", expr(s"k div $B"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val inB = Window.partitionBy("bkt").orderBy("k")
      val inner = keys
        .withColumn("nxt", lead(col("k"), 1).over(inB))
        .filter(col("nxt") > col("k") + 1)
        .select((col("k") + 1).as("gap_start"), (col("nxt") - 1).as("gap_end"))
      val bounds = keys.groupBy("bkt")
        .agg(min(col("k")).as("mn"), max(col("k")).as("mx"))
      val cross = bounds
        .withColumn("nxt_mn", lead(col("mn"), 1).over(
          Window.partitionBy(Dist.boundedOne(col("bkt"))).orderBy("bkt"))) // bucket frame: n/B rows
        .filter(col("nxt_mn") > col("mx") + 1)
        .select((col("mx") + 1).as("gap_start"), (col("nxt_mn") - 1).as("gap_end"))
      inner.unionAll(cross)
        .select(col("gap_start"), col("gap_end"),
          (col("gap_end") - col("gap_start") + 1).as("n_missing"))
        .orderBy(col("n_missing").desc, col("gap_start").asc)
        .limit(K)
    }
    val oracle = Some(
      s"""WITH keys AS (
         |  SELECT o_orderkey AS k FROM orders
         |  WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
         |        % 97 <> 0),
         |gaps AS (
         |  SELECT k + 1 AS gap_start, nxt - 1 AS gap_end
         |  FROM (SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM keys)
         |  WHERE nxt > k + 1)
         |SELECT gap_start, gap_end, gap_end - gap_start + 1 AS n_missing
         |FROM gaps
         |ORDER BY n_missing DESC, gap_start ASC LIMIT $K""".stripMargin)
  }

  /** Right-to-be-forgotten purge, proven complete — the compliance
    * operation every event store must support: given a deletion list
    * (here the deterministic md5 cohort standing in for the legal list),
    * drop every event of every listed user and PROVE the result clean.
    * One broadcast anti join (the deletion list is small by nature);
    * the readout reports, per event type, rows before / after / deleted
    * AND the residual count of listed users still present after the
    * purge — the column that must be zero, reported from the purged
    * frame itself rather than asserted off-line.
    */
  object GdprPurge extends GraftQuery {
    val name = "q_gdpr_purge"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import graft.functions.PortableHash.pHash60
      val ev = Graft.table(spark, sfDir, "events")
        .select(col("event_type"), col("user_id"))
      val listed = pmod(pHash60(col("user_id").cast("string")), lit(13L)) === 0L
      val before = ev.groupBy("event_type").agg(count(lit(1)).as("n_before"))
      val purged = ev.filter(!listed)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_after"),
          sum(when(listed, 1L).otherwise(0L)).as("n_residual"))
      before.join(purged, Seq("event_type"), "left")
        .select(col("event_type"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          (col("n_before") - coalesce(col("n_after"), lit(0L))).as("n_deleted"),
          coalesce(col("n_residual"), lit(0L)).as("n_residual"))
        .orderBy("event_type")
    }
    val oracle = Some(
      """WITH ev AS (
        |  SELECT event_type, user_id,
        |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |           % 13 = 0 AS listed
        |  FROM events),
        |before AS (SELECT event_type, count(*) AS n_before FROM ev GROUP BY 1),
        |purged AS (
        |  SELECT event_type, count(*) AS n_after,
        |         CAST(sum(CASE WHEN listed THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_residual
        |  FROM ev WHERE NOT listed GROUP BY 1)
        |SELECT event_type, n_before,
        |       coalesce(n_after, 0) AS n_after,
        |       n_before - coalesce(n_after, 0) AS n_deleted,
        |       coalesce(n_residual, 0) AS n_residual
        |FROM before LEFT JOIN purged USING (event_type)
        |ORDER BY event_type""".stripMargin)
  }

  /** Join-fanout histogram — how many lineitems each order actually has:
    * the distribution that drives join cost models and flags both
    * degenerate parents (fanout 0 — headers with no lines) and blowup
    * keys. Left join from orders keeps the zero class honest; two stacked
    * small aggregates after the per-key count.
    */
  object FanoutHist extends GraftQuery {
    val name = "q_fanout_hist"
    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val perOrder = Graft.table(spark, sfDir, "orders").select("o_orderkey")
        .join(Graft.table(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"), lit(1L).as("one")),
          Seq("o_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(sum(coalesce(col("one"), lit(0L))).as("fanout"))
      perOrder.groupBy("fanout").agg(count(lit(1)).as("n_orders"))
        .orderBy("fanout")
    }
    val oracle = Some(
      """WITH per_order AS (
        |  SELECT o_orderkey,
        |         CAST(sum(CASE WHEN l_orderkey IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |           AS fanout
        |  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1)
        |SELECT fanout, count(*) AS n_orders
        |FROM per_order GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val all: Seq[GraftQuery] = Seq(OrphanAudit, TableChecksum, IdGapAudit,
    GdprPurge, FanoutHist)
}
