package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 §2.2.3 rule-pattern match as a native predicate — the
  * residual condition of the frontier's host-keyed rule join. The
  * round-11 queries used `startsWith(rpath)` (the RFC's base prefix
  * rule), which cannot express the mandatory `*`/`$` grammar; a full
  * regex translation per row would compile a pattern per (path, rule)
  * pair inside the join. This expression calls the same greedy
  * segment matcher the driver-side [[graft.text.RobotsOps.pathMatches]]
  * uses (one static call, codegen-friendly — the
  * [[HtmlEntityExpression]] shape), so plan-side and parse-side
  * decisions are one implementation. URL paths are percent-normalized
  * here (§2.2.2); rule paths arrive pre-normalized from
  * [[graft.text.RobotsOps.rules]].
  */
object RobotsMatchExpression {

  /** (pattern, rawPath) → §2.2.3 match over the normalized path. */
  def matches(pattern: UTF8String, path: UTF8String): Boolean =
    graft.text.RobotsOps.pathMatches(pattern.toString,
      graft.text.RobotsOps.normalizePercent(path.toString))

  case class RobotsMatch(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(pattern: Any, path: Any): Any =
      matches(pattern.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (p, s) =>
        s"graft.plans.RobotsMatchExpression.matches($p, $s)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): RobotsMatch =
      copy(left = newLeft, right = newRight)
  }

  /** Column predicate: does robots rule `pattern` match URL `path`? */
  def robotsMatch(pattern: Column, path: Column): Column =
    Bridge.column(RobotsMatch(Bridge.expression(pattern),
      Bridge.expression(path)))
}
