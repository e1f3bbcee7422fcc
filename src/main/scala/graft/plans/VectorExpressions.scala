package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the vector hot path (SURVEY §7 design
  * stance allows custom expressions where built-ins can't express the
  * semantics *efficiently*). The composable formulation —
  * `aggregate(zip_with(a, b, multiply), 0, add)` — allocates a zipped array
  * and evaluates two lambda closures per element per pair; over an
  * O(|Q|·|C|) candidate set that is the dominant ANN cost. These
  * expressions do the same arithmetic as a primitive loop inside
  * whole-stage codegen.
  *
  * Semantics are bit-compatible with the SQL/oracle formulation
  * (`round(x*1e6)` → BIGINT, exact integer sums — see
  * [[graft.similarity.Similarity]] for why that is cross-engine
  * deterministic).
  */
object VectorExpressions {

  /** Round-half-away-from-zero of x*1e6. For float inputs and Q=1e6 this is
    * bit-identical to both Spark's `round()` (HALF_UP over the
    * shortest-string decimal) and DuckDB's C `round()`: a float's 24-bit
    * mantissa times 10^6 = m·5^6·2^k needs ≤38 significand bits, so `x*1e6`
    * and the subsequent `+0.5` are EXACT double ops, the fractional part is
    * a multiple of 2^-16, and all three roundings agree on every
    * representable input (no straddle within half an ulp of .5).
    */
  @inline def quantize(x: Float): Long = {
    val d = x.toDouble * 1000000.0
    if (d >= 0) math.floor(d + 0.5).toLong else -math.floor(-d + 0.5).toLong
  }

  /** array<float> → array<long>: per-element [[quantize]]. */
  def quantizeArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = quantize(arr.getFloat(i)); i += 1 }
    new GenericArrayData(out)
  }

  case class QuantizeVec(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      quantizeArray(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.VectorExpressions.quantizeArray($c)")
    override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
      copy(child = newChild)
  }

  /** Integer dot product of two array<long> columns — a tight primitive
    * loop in generated code; exact and order-independent.
    */
  case class DotLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0L
      var i = 0
      while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotLong =
      copy(left = newLeft, right = newRight)
  }

  /** Count of positions where two array<long> columns agree — the MinHash
    * estimated-Jaccard numerator. The composable spelling
    * `size(filter(zip_with(a, b, eq), id))` allocates a boolean array and
    * runs two interpreted lambdas per pair; this is the same count as a
    * primitive loop in generated code.
    */
  /** Shared eval for [[CountEq]] (and its property tests). */
  def countEqArrays(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) acc += 1; i += 1 }
    acc
  }

  case class CountEq(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      countEqArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $acc = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.getLong($i) == $b.getLong($i)) $acc++;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CountEq =
      copy(left = newLeft, right = newRight)
  }

  /** Column API. */
  def quantize_vec(c: Column): Column = Bridge.column(QuantizeVec(Bridge.expression(c)))
  def dot_long(a: Column, b: Column): Column =
    Bridge.column(DotLong(Bridge.expression(a), Bridge.expression(b)))
  def count_eq(a: Column, b: Column): Column =
    Bridge.column(CountEq(Bridge.expression(a), Bridge.expression(b)))
}
