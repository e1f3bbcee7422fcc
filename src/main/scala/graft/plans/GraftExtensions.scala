package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions, via the
  * standard `SparkSessionExtensions` hook:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: spark.sql.extensions=graft.plans.GraftExtensions
  *   spark.sql("SELECT dot_long(quantize_vec(a), quantize_vec(b)) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("quantize_vec"),
      new ExpressionInfo(classOf[VectorExpressions.QuantizeVec].getName, "quantize_vec"),
      (children: Seq[Expression]) => VectorExpressions.QuantizeVec(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[VectorExpressions.DotLong].getName, "dot_long"),
      (children: Seq[Expression]) => VectorExpressions.DotLong(children(0), children(1))))
    ext.injectPlannerStrategy(_ => AsOfJoinPlan.AsOfStrategy)
  }
}

object GraftExtensions {
  /** Same registrations on an already-built session (builder extensions
    * only bind at session construction). `experimental.extraStrategies` is
    * the public runtime hook for planner strategies.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("quantize_vec",
      (children: Seq[Expression]) => VectorExpressions.QuantizeVec(children.head),
      "built-in")
    reg.createOrReplaceTempFunction("dot_long",
      (children: Seq[Expression]) => VectorExpressions.DotLong(children(0), children(1)),
      "built-in")
    if (!spark.experimental.extraStrategies.contains(AsOfJoinPlan.AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinPlan.AsOfStrategy
  }
}
