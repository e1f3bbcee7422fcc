package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for content-defined chunk boundaries
  * ([[graft.dedup.CdcOps]]): one pass over the string's code points,
  * rolling h' = (2h + (cp · gear) mod m) mod m, emitting a boundary
  * wherever the min-length gate and the mask condition hold, with the
  * final partial chunk always closed. Identical semantics to the
  * `aggregate`-fold formulation (`ascii(substr(text, j, 1))` per position)
  * — but that fold is interpreted, builds a struct per character, and its
  * `substr(j, 1)` re-walks the string from the start each step
  * (O(chars²)); this kernel is a tight codegen-callable loop, the same
  * move [[CharGramsExpression]] made for the substring-dedup emit.
  */
object CdcExpression {

  def cdcBounds(text: UTF8String, gear: Long, mod: Long, maskPlus1: Int,
      minLen: Int): GenericArrayData = {
    val s = text.toString
    var h = 0L
    var last = 0
    var j = 0 // code-point position (1-based after increment)
    var i = 0 // UTF-16 char index
    val bs = new scala.collection.mutable.ArrayBuffer[Int](8)
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      j += 1
      h = (2 * h + (cp.toLong * gear) % mod) % mod
      if (j - last >= minLen && h % maskPlus1 == 0) { bs += j; last = j }
    }
    if (bs.isEmpty || bs(bs.length - 1) != j) bs += j
    new GenericArrayData(bs.toArray)
  }

  case class CdcBounds(child: Expression, gear: Long, mod: Long,
      maskPlus1: Int, minLen: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      cdcBounds(input.asInstanceOf[UTF8String], gear, mod, maskPlus1, minLen)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.CdcExpression.cdcBounds($c, ${gear}L, ${mod}L, " +
          s"$maskPlus1, $minLen)")
    override protected def withNewChildInternal(newChild: Expression): CdcBounds =
      copy(child = newChild)
  }

  def cdc_bounds(c: Column, gear: Long, mod: Long, maskPlus1: Int,
      minLen: Int): Column =
    Bridge.column(CdcBounds(Bridge.expression(c), gear, mod, maskPlus1, minLen))
}
