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

  test("oracle-backed queries emit flat, uniquely named columns") {
    // the driver's comparator sorts columns BY NAME and hashes cell values
    // on the pandas side: duplicate names make the sort ambiguous, and
    // array/map/struct cells are unhashable there (this silently broke
    // q_binary_scan in round 1 until its arrays were flattened)
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.registry.filter(_.oracle.isDefined).foreach { q =>
      val schema = q.run(spark, sf).schema
      val names = schema.fields.map(_.name)
      assert(names.distinct.length == names.length,
        s"${q.name} has duplicate column names: ${names.mkString(",")}")
      schema.fields.foreach { f =>
        assert(!f.dataType.isInstanceOf[ArrayType] &&
          !f.dataType.isInstanceOf[MapType] &&
          !f.dataType.isInstanceOf[StructType],
          s"${q.name}.${f.name} is nested-typed (${f.dataType}); " +
            "flatten or serialize for the comparator")
      }
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
