package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** The FRONTIER URL canonicalization as a native codegen expression —
  * the round-13 third-wave replacement for the higher-order
  * `split`/`filter`/`array_join` column chain. That chain is
  * semantically right but evaluates two regexp extracts, three regexp
  * replaces, and a per-param lambda filter per URL; on the seen-set
  * query (`q_bloom_urlseen`, two synthesized URLs per document, 2 M
  * rows at sf1) the chain was the named per-row cost of the round-13
  * frontier-key switch (~2× the old corpus chain). One static call
  * into the single-pass scan-side implementation
  * ([[graft.text.UrlOps.frontierCanonicalStr]] — RFC 3986 §6.2.2.1
  * scheme+host-only lowercase, fragment strip, post-scheme `www.`
  * drop, one trailing-slash drop, tracking-param-only query strip)
  * keeps plan-side and scan-side keys ONE implementation by
  * construction, stays inside whole-stage codegen, and never
  * materializes the param array. The retired column chain survives as
  * [[graft.text.UrlOps.frontierCanonicalColumns]], pinned ≡ this
  * expression ≡ the scan twin by UrlOpsSpec's randomized differential.
  */
object UrlCanonicalExpression {

  def frontier(input: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.text.UrlOps.frontierCanonicalStr(input.toString))

  case class FrontierCanonical(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DataTypes.StringType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      frontier(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.UrlCanonicalExpression.frontier($c)")
    override protected def withNewChildInternal(
        newChild: Expression): FrontierCanonical = copy(child = newChild)
  }

  /** Column form: the frontier canonical key of URL column `c`. */
  def frontierCanonical(c: Column): Column =
    Bridge.column(FrontierCanonical(Bridge.expression(c)))
}
