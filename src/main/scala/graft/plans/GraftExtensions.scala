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
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.plans", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => AsOfJoinPlan.AsOfStrategy)
  }
}

object GraftExtensions {

  /** A scalar int parameter of a SQL-surface kernel call (gram length,
    * bit width …) — must be a foldable literal at registration time.
    */
  private def intArg(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn expects a literal integer argument")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** Every native kernel with a plain child signature, as SQL functions.
    * (minhash_sig / lsh_keys embed build-time constant tables — they stay
    * Column-API-only by design.)
    */
  private[plans] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "quantize_vec" -> ((cs: Seq[Expression]) =>
      VectorExpressions.QuantizeVec(cs.head)),
    "dot_long" -> ((cs: Seq[Expression]) =>
      VectorExpressions.DotLong(cs(0), cs(1))),
    "count_eq" -> ((cs: Seq[Expression]) =>
      VectorExpressions.CountEq(cs(0), cs(1))),
    "shingle_hashes" -> ((cs: Seq[Expression]) =>
      ShingleExpression.ShingleHashes(cs.head, intArg(cs(1), "shingle_hashes"))),
    "shingle_strings" -> ((cs: Seq[Expression]) =>
      ShingleExpression.ShingleStrings(cs.head, intArg(cs(1), "shingle_strings"))),
    "winnow_fps" -> ((cs: Seq[Expression]) =>
      WinnowExpression.WinnowFps(cs.head,
        intArg(cs(1), "winnow_fps"), intArg(cs(2), "winnow_fps"))),
    "simhash60" -> ((cs: Seq[Expression]) =>
      SimHashExpression.SimHash60(cs.head, intArg(cs(1), "simhash60"))))

  /** Same registrations on an already-built session (builder extensions
    * only bind at session construction). `experimental.extraStrategies` is
    * the public runtime hook for planner strategies.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraStrategies.contains(AsOfJoinPlan.AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinPlan.AsOfStrategy
  }
}
