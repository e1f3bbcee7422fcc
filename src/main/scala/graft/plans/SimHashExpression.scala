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

  def simhash(text: UTF8String, bits: Int): Long = {
    // shared dialect-exact tokenizer — an all-whitespace doc tokenizes to
    // [""] and "" votes like any token, matching the exploded form
    val toks = TextKernel.tokenize(text)
    val votes = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16) // reused digest buffer — no alloc per token
    var i = 0
    while (i < toks.length) {
      md.update(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.digest(d, 0, 16)
      val h = TextKernel.top60(d)
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
