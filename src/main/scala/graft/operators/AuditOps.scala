package graft.operators

import graft.{Graft, GraftQuery}
import graft.functions.PortableHash.pHash28
import org.apache.spark.sql.{DataFrame, SparkSession}
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

    /** (relation label, child rows with `k`, parent keys as `k`). */
    private[graft] def audit(label: String, child: DataFrame, parent: DataFrame): DataFrame = {
      val p = parent.distinct().withColumn("present", lit(1))
      child.join(p, Seq("k"), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("present").isNull, lit(1))).as("n_orphans"),
          countDistinct(when(col("present").isNull, col("k"))).as("n_orphan_keys"))
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

  val all: Seq[GraftQuery] = Seq(OrphanAudit)
}
