package graft.images

import graft.SparkSpec

class CocoClassesSpec extends SparkSpec {
  test("80 classes, known anchor ids, out-of-range fallback (M8)") {
    assert(CocoClasses.Names.length == 80)
    assert(CocoClasses.name(0) == "person")
    assert(CocoClasses.name(16) == "dog")
    assert(CocoClasses.name(2) == "car")
    assert(CocoClasses.name(99) == "class_99")
  }
  test("dim joins against exploded predictions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val preds = Seq((0, 3L), (16, 1L)).toDF("cls", "cnt")
    val named = preds.join(CocoClasses.dim(spark), "cls")
      .select(col("class_name"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(named == Map("person" -> 3L, "dog" -> 1L))
  }
}
