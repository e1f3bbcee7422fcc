package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native windowed skip-gram pair emitter — the scan-side generator of
  * `q_skipgram_pairs` as ONE primitive loop. The composable spelling ran,
  * per token, nested `transform` lambdas allocating a 2-element array of
  * structs per (i, d) plus two `flatten` passes — measured at 1.1 s of the
  * query's 1.4 s (sf0.1 w8). The kernel emits the identical (center,
  * context, d) rows (both directions, d ≤ w) in the identical order; token
  * strings are copied once per token and shared across their ≤2·w pair
  * rows.
  */
object SkipGramExpression {

  def pairs(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    var total = 0
    var i = 0
    while (i < n - 1) { total += 2 * math.min(w, n - 1 - i); i += 1 }
    // fresh copies (the ShingleExpression stance): one clone per token,
    // shared by every pair row that references it
    val toks = new Array[UTF8String](n)
    i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).clone(); i += 1 }
    val out = new Array[Any](total)
    var o = 0
    i = 0
    while (i < n - 1) {
      val dMax = math.min(w, n - 1 - i)
      var d = 1
      while (d <= dMax) {
        out(o) = InternalRow(toks(i), toks(i + d), d)
        out(o + 1) = InternalRow(toks(i + d), toks(i), d)
        o += 2
        d += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  case class SkipGramPairs(child: Expression, w: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("center", StringType, nullable = true),
      StructField("context", StringType, nullable = true),
      StructField("d", IntegerType, nullable = false))), containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      pairs(input.asInstanceOf[ArrayData], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.SkipGramExpression.pairs($c, $w)")
    override protected def withNewChildInternal(newChild: Expression): SkipGramPairs =
      copy(child = newChild)
  }

  /** array<string> → array<struct<center,context,d>> for window radius w. */
  def skipgram_pairs(arr: Column, w: Int): Column =
    Bridge.column(SkipGramPairs(Bridge.expression(arr), w))

  /** Native adjacent-pair (positional bigram) emitter: arr →
    * [(arr[0],arr[1]), (arr[1],arr[2]), …] as one primitive loop. The
    * engine spelled this three ways — `transform(sequence(0, n−2), i →
    * struct(arr[i], arr[i+1]))` (LmOps) and `zip_with(slice, slice,
    * concat(a, ' ', b))` later re-`split` (TokenLift / NextToken) — all
    * interpreted per row, the latter also paying a concat + 2 splits per
    * pair. Equivalence with the concat-then-split spelling holds because
    * tokens come from a whitespace split and therefore never contain the
    * ' ' separator. Token strings are copied once and shared by their ≤2
    * pair rows.
    */
  def adjacentPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) null else t.clone()
      i += 1
    }
    val out = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = InternalRow(toks(i), toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  case class AdjacentPairs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("w1", StringType, nullable = true),
      StructField("w2", StringType, nullable = true))), containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      adjacentPairs(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.SkipGramExpression.adjacentPairs($c)")
    override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
      copy(child = newChild)
  }

  /** array<string> → array<struct<w1,w2>> of adjacent pairs. */
  def adjacent_pairs(arr: Column): Column =
    Bridge.column(AdjacentPairs(Bridge.expression(arr)))
}
