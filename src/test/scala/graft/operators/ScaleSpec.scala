package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-technique correctness: salted aggregation equivalence and
  * bucketed co-located joins (shuffle elimination asserted on the plan).
  */
class ScaleSpec extends SparkSpec {

  test("saltedSumCount ≡ plain groupBy sum/count (algebraic two-phase)") {
    val li = graft.Graft.table(spark, sf, "lineitem")
    val salted = Salting.saltedSumCount(
        li, col("l_returnflag"), col("l_extendedprice"), salts = 16)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = li.groupBy(col("l_returnflag").as("key"))
      .agg(sum(col("l_extendedprice").cast("decimal(27,6)")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain) // bit-identical via decimal-exact partials
  }

  test("partitioned parquet layout prunes partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/li"
    val li = graft.Graft.table(spark, sf, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val scan = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"no partition filter pushed:\n$plan")
    val expect = li.filter(col("l_returnflag") === "R").count()
    assert(scan.count() == expect)
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    // (warehouse dir is a static conf — tables land in ./spark-warehouse,
    // dropped in the finally; the dir is gitignored)
    // disable broadcast so the planner would otherwise have to shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = graft.Graft.table(spark, sf, "orders")
      val c = graft.Graft.table(spark, sf, "customer")
      o.write.mode("overwrite").bucketBy(4, "o_custkey")
        .sortBy("o_custkey").saveAsTable("orders_b")
      c.write.mode("overwrite").bucketBy(4, "c_custkey")
        .sortBy("c_custkey").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == o.count()) // every order has its customer
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
