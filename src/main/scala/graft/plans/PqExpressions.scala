package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the PQ (product-quantization) hot path —
  * the [[VectorExpressions]] stance applied to the ADC family (guide §"UDFs
  * and expressions": prefer codegen-friendly primitives over interpreted
  * higher-order lambdas in per-row hot loops).
  *
  * The composable formulation these replace ran, PER ROW, nested
  * `aggregate(zip_with(slice(...), element_at(...)))` folds: every subspace
  * × centroid distance allocated a slice copy, a zipped array, and two
  * interpreted lambda closures per element. For code assignment that is
  * M·K·Sub ≈ 1024 interpreted ops per vector; the old `q_pq_codes` shape
  * additionally EXPLODED M rows per vector and shuffled N·M·K candidate
  * rows through a window argmin. Each expression below does the identical
  * integer arithmetic as one primitive loop inside whole-stage codegen, so
  * code assignment and ADC lookup become pure scan-side projections.
  *
  * Exactness: all inputs are on the engine's quantized integer grid
  * ([[VectorExpressions.quantize_vec]]); distances are exact BIGINT sums of
  * products, argmins break ties by strict `<` over ascending code (≡ the
  * oracle's `ORDER BY dist, code LIMIT 1`), so results are bit-identical to
  * the composable spelling (PqExpressionsSpec asserts it term for term).
  */
object PqExpressions {

  /** Exact integer L2 (sum of squared differences) of two array<long>
    * columns over their common prefix — the distance twin of
    * [[VectorExpressions.DotLong]].
    */
  def l2Arrays(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** L2 between the `sub`-long slice of `q` starting at `off` (0-based) and
    * the codebook subvector `c`.
    */
  @inline private def l2Slice(q: ArrayData, off: Int, c: ArrayData, sub: Int): Long = {
    var acc = 0L
    var p = 0
    while (p < sub) {
      val d = q.getLong(off + p) - c.getLong(p)
      acc += d * d
      p += 1
    }
    acc
  }

  /** Per-subspace nearest-centroid assignment: for each s in 0..m-1 the
    * (code, dist) minimizing (dist, code) over the k codebook entries
    * cb[s·k + code]. Returns array<struct<code int, dist long>> indexed by
    * subspace — strict `<` over ascending code, the exact argmin rule of
    * the join+window formulation it replaces.
    */
  def assign(q: ArrayData, cb: ArrayData, m: Int, sub: Int, k: Int): ArrayData = {
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var bestD = Long.MaxValue
      var bestC = -1
      var c = 0
      while (c < k) {
        val d = l2Slice(q, s * sub, cb.getArray(s * k + c), sub)
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(s) = InternalRow(bestC, bestD)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The codes alone (array<int>) — the ADC lookup key of [[assign]]. */
  def codes(q: ArrayData, cb: ArrayData, m: Int, sub: Int, k: Int): ArrayData = {
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestD = Long.MaxValue
      var bestC = -1
      var c = 0
      while (c < k) {
        val d = l2Slice(q, s * sub, cb.getArray(s * k + c), sub)
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The per-query ADC lookup table: table[s·k + c] = L2(q's subspace-s
    * slice, cb[s·k + c]) — the flatten(transform(transform(l2))) spelling
    * as one loop.
    */
  def table(q: ArrayData, cb: ArrayData, m: Int, sub: Int, k: Int): ArrayData = {
    val out = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        out(s * k + c) = l2Slice(q, s * sub, cb.getArray(s * k + c), sub)
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance: Σ_s table[s·k + codes[s]]. */
  def adcSum(codes: ArrayData, table: ArrayData, k: Int): Long = {
    val m = codes.numElements()
    var acc = 0L
    var s = 0
    while (s < m) {
      acc += table.getLong(s * k + codes.getInt(s))
      s += 1
    }
    acc
  }

  case class L2Long(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      l2Arrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.plans.PqExpressions.l2Arrays($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): L2Long =
      copy(left = newLeft, right = newRight)
  }

  case class PqAssign(left: Expression, right: Expression,
      m: Int, sub: Int, k: Int) extends BinaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("code", IntegerType, nullable = false),
      StructField("dist", LongType, nullable = false))), containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      assign(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, sub, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.plans.PqExpressions.assign($a, $b, $m, $sub, $k)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAssign =
      copy(left = newLeft, right = newRight)
  }

  case class PqCodesExpr(left: Expression, right: Expression,
      m: Int, sub: Int, k: Int) extends BinaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      codes(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, sub, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.plans.PqExpressions.codes($a, $b, $m, $sub, $k)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqCodesExpr =
      copy(left = newLeft, right = newRight)
  }

  case class AdcTable(left: Expression, right: Expression,
      m: Int, sub: Int, k: Int) extends BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      table(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, sub, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.plans.PqExpressions.table($a, $b, $m, $sub, $k)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AdcTable =
      copy(left = newLeft, right = newRight)
  }

  case class AdcSum(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(a: Any, b: Any): Any =
      adcSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.plans.PqExpressions.adcSum($a, $b, $k)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AdcSum =
      copy(left = newLeft, right = newRight)
  }

  /** Column API. */
  def l2_long(a: Column, b: Column): Column =
    Bridge.column(L2Long(Bridge.expression(a), Bridge.expression(b)))
  def pq_assign(q: Column, cb: Column, m: Int, sub: Int, k: Int): Column =
    Bridge.column(PqAssign(Bridge.expression(q), Bridge.expression(cb), m, sub, k))
  def pq_codes(q: Column, cb: Column, m: Int, sub: Int, k: Int): Column =
    Bridge.column(PqCodesExpr(Bridge.expression(q), Bridge.expression(cb), m, sub, k))
  def adc_table(q: Column, cb: Column, m: Int, sub: Int, k: Int): Column =
    Bridge.column(AdcTable(Bridge.expression(q), Bridge.expression(cb), m, sub, k))
  def adc_sum(codes: Column, table: Column, k: Int): Column =
    Bridge.column(AdcSum(Bridge.expression(codes), Bridge.expression(table), k))
}
