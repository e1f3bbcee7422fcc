package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash signature: one pass over the shingle-hash array computes
  * all k permutation minima. The composable form — k independent
  * `array_min(transform(...))` expressions — traverses the array k times
  * and materializes k intermediate arrays per row.
  *
  * Arithmetic is identical to the composable form: min over shingles of
  * `pmod(h*a_i + b_i, p)` with Java long overflow-wrap semantics, so
  * signatures are interchangeable with [[graft.dedup.Dedup]]'s reference
  * formulation (spec-verified).
  */
object MinHashExpression {

  val MersennePrime = 2147483647L // 2^31 - 1

  def sig(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        // pmod semantics: Scala % then wrap negatives
        val m = (h * a(i) + b(i)) % MersennePrime
        val v = if (m < 0) m + MersennePrime else m
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    // empty shingle set → nulls would poison bands; keep MaxValue sentinel
    new GenericArrayData(out)
  }

  case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      sig(input.asInstanceOf[ArrayData], a.toArray, b.toArray)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("mhA", a.toArray, "long[]")
      val bRef = ctx.addReferenceObj("mhB", b.toArray, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.MinHashExpression.sig($c, $aRef, $bRef)")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  def minhash_sig(c: Column, a: Seq[Long], b: Seq[Long]): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), a, b))
}
