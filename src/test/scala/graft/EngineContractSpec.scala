package graft

/** Engine-level contracts enforced across the ENTIRE query registry, not
  * per-operator: plan-shape invariants the 100 TB design stance promises,
  * and the determinism property the driver's hash-compare gate assumes.
  */
class EngineContractSpec extends SparkSpec {

  test("no query plans an unbounded CartesianProduct") {
    // broadcast nested-loop joins against literal/bounded sides are fine
    // (brute-force cosine, IVF centroid assignment, contains-theta dims);
    // a non-broadcast CartesianProduct would be a scale bug anywhere.
    SparkEntry.registry.foreach { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct:\n$plan")
    }
  }

  test("every query is bit-deterministic across shuffle-partition counts") {
    // the driver's correctness gate hash-compares result sets, so results
    // must not depend on partitioning: total output order, decimal-exact /
    // integer-exact aggregation, total tie-breaks in every window. Running
    // the whole registry under a different partition count exercises
    // different merge orders, partial-aggregation trees, and sort merges.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val base = SparkEntry.registry.map { q =>
        q.name -> q.run(spark, sf).collect().map(_.toString).toSeq
      }.toMap
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      SparkEntry.registry.foreach { q =>
        val again = q.run(spark, sf).collect().map(_.toString).toSeq
        assert(again == base(q.name),
          s"${q.name} output depends on shuffle partitioning")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
