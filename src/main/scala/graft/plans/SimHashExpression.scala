package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document SimHash: whitespace-tokenize, 60-bit md5-prefix hash
  * per token OCCURRENCE, ±1 vote per bit, sign → packed hash — one pass,
  * one output long per row.
  *
  * SimHash is a pure per-document function, so computing it scan-side
  * removes the explode + per-doc aggregation the composable form pays:
  * that plan shuffles one aggregation buffer per document ([[
  * graft.functions.Aggregators.SimHashAgg]] — still the right shape when
  * the input IS already exploded tokens); this expression makes the
  * fingerprint a plain projected column with NO shuffle at any scale.
  * Value-identical to the aggregator formulation (spec-verified) and to
  * the DuckDB replay in [[graft.dedup.Dedup.simhashOracleCtes]].
  */
object SimHashExpression {

  // RE2-equivalent whitespace (no \x0B), matching TextOps.WhitespaceClass
  private val Ws = java.util.regex.Pattern.compile("[ \\t\\n\\f\\r]+")

  def simhash(text: UTF8String, bits: Int): Long = {
    val s = text.toString
    // SQL trim semantics: spaces only (String.trim would strip controls)
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    // limit -1 keeps leading/trailing empty tokens, like Spark's split —
    // an all-whitespace doc tokenizes to [""] and "" votes like any token
    val toks = Ws.split(s.substring(b, e), -1)
    val votes = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16) // reused digest buffer — no alloc per token
    var i = 0
    while (i < toks.length) {
      md.update(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.digest(d, 0, 16)
      // first 15 hex chars == top 60 bits of the digest
      val h = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
      var bit = 0
      while (bit < bits) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < bits) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  case class SimHash60(child: Expression, bits: Int) extends UnaryExpression {
    require(bits > 0 && bits <= 60, "md5 prefix provides at most 60 bits")
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      simhash(input.asInstanceOf[UTF8String], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.SimHashExpression.simhash($c, $bits)")
    override protected def withNewChildInternal(newChild: Expression): SimHash60 =
      copy(child = newChild)
  }

  def simhash60(c: Column, bits: Int): Column =
    Bridge.column(SimHash60(Bridge.expression(c), bits))
}
