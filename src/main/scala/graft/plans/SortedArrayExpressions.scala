package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions over SORTED DISTINCT arrays — the
  * [[VectorExpressions]] stance applied to set arithmetic on the shingle
  * arrays the dedup family materializes with
  * `array_sort(shingle_strings(...))` (distinct by construction, sorted by
  * UTF8String binary order).
  *
  * `size(array_intersect(a, b))` builds an OpenHashSet over one side,
  * probes every element of the other, and materializes the intersection
  * ARRAY just to take its size — per candidate pair. For sorted distinct
  * inputs the same count is one linear merge with no allocation, inside
  * whole-stage codegen. Equivalence (asserted term-for-term by
  * SortedArrayExpressionsSpec): on distinct inputs `array_intersect`
  * returns each common element once, and a linear merge over two sorted
  * distinct sequences visits each common element exactly once.
  */
object SortedArrayExpressions {

  /** |a ∩ b| for two sorted distinct array<string> values. */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.plans.SortedArrayExpressions.intersectCount($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  /** Column API: exact |a ∩ b| of two sorted distinct string arrays. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
