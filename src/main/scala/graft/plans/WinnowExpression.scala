package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused winnowing fingerprint: one pass over the normalized text bytes
  * computes every k-gram's 28-bit md5-prefix hash, slides the w-gram
  * window, and returns the sorted distinct window minima.
  *
  * The composable form (`transform(sequence(...), i -> conv(substring(
  * md5(substring(t,i,k)),1,7),16,10))` + a second transform for window
  * mins) is semantically identical but runs every element through
  * interpreted higher-order-function eval — ~1.4M interpreted expression
  * trees per 5k docs benched 6.6s warm; this expression does the same work
  * in a single JVM loop per row. Hash identity with the SQL form (and the
  * DuckDB oracle) is spec-verified: the 28-bit value IS the first 7 hex
  * chars of the md5.
  */
object WinnowExpression {

  def fps(bytes: Array[Byte], k: Int, w: Int): GenericArrayData = {
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val ng = n - k + 1
    val hs = new Array[Long](ng)
    val md = java.security.MessageDigest.getInstance("MD5")
    // digest into a reused buffer: one md5 per k-gram is the dominant cost
    // of the whole fingerprint — a fresh 16-byte result array per call is
    // ~1.5M allocations per 5k docs of pure GC pressure
    val d = new Array[Byte](16)
    var i = 0
    while (i < ng) {
      md.update(bytes, i, k)
      md.digest(d, 0, 16)
      hs(i) = TextKernel.top28(d)
      i += 1
    }
    val nw = math.max(ng - w + 1, 1)
    val mins = new Array[Long](nw)
    var j = 0
    while (j < nw) {
      var m = Long.MaxValue
      var t = j
      val end = math.min(j + w, ng)
      while (t < end) { if (hs(t) < m) m = hs(t); t += 1 }
      mins(j) = m
      j += 1
    }
    java.util.Arrays.sort(mins)
    // dedup in place on the sorted array
    var out = 1
    var p = 1
    while (p < nw) {
      if (mins(p) != mins(out - 1)) { mins(out) = mins(p); out += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }

  case class WinnowFps(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    require(k > 0 && w > 0, "winnow gram and window lengths must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      fps(input.asInstanceOf[Array[Byte]], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.WinnowExpression.fps($c, $k, $w)")
    override protected def withNewChildInternal(newChild: Expression): WinnowFps =
      copy(child = newChild)
  }

  def winnow_fps(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFps(Bridge.expression(c), k, w))
}
