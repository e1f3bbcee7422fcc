package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Fused multi-table sign-LSH bucketing: all tables × planes sign dots over
  * the quantized embedding in one loop, emitting the namespaced key array
  * `t * 2^planes + bucket`.
  *
  * The composable form builds tables×planes separate `dot_long` expressions,
  * each closing over its own 64-long literal plane — correct, but the
  * generated code is ~32 fused dot loops per projection and its cold
  * compile dominated the ANN bench. Values are bit-identical (same integer
  * dots, same `>= 0` sign rule; spec-verified element-wise).
  */
object LshExpression {

  def keys(q: ArrayData, planes: Array[Array[Long]], tables: Int, nPlanes: Int): GenericArrayData = {
    val dim = q.numElements()
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < nPlanes) {
        val plane = planes(t * nPlanes + p)
        var dot = 0L
        var i = 0
        while (i < dim) { dot += q.getLong(i) * plane(i); i += 1 }
        if (dot >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = (t << nPlanes) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Planes carried as `Seq[Seq[Long]]`, not arrays: case-class equality /
    * hashCode stay structural, so Catalyst canonicalization and
    * common-subexpression elimination can dedup two identical LshKeys
    * (array params compare by reference and silently defeat plan sharing).
    * The eval/codegen hot path uses the pre-converted [[planeArr]].
    */
  case class LshKeys(child: Expression, planes: Seq[Seq[Long]],
      tables: Int, nPlanes: Int) extends UnaryExpression {
    @transient private lazy val planeArr: Array[Array[Long]] =
      planes.map(_.toArray).toArray
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      keys(input.asInstanceOf[ArrayData], planeArr, tables, nPlanes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lshPlanes", planeArr, "long[][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.LshExpression.keys($c, $ref, $tables, $nPlanes)")
    }
    override protected def withNewChildInternal(newChild: Expression): LshKeys =
      copy(child = newChild)
  }

  def lsh_keys(q: Column, planes: Seq[Array[Long]], tables: Int, nPlanes: Int): Column =
    Bridge.column(LshKeys(Bridge.expression(q), planes.map(_.toSeq), tables, nPlanes))
}
