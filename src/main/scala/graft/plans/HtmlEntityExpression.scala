package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass HTML character-reference decoder — the round-11 upgrade
  * of the five-entity regexp chain. Real crawl HTML leans on numeric
  * charrefs (`&#233;`, `&#xE9;`) and `&nbsp;` far more than on the five
  * XML-predefined names, and a chained-replace decoder cannot express
  * "decode each reference exactly once, left to right" (HTML 5
  * §13.5's behavior for the subset below): `&amp;lt;` must come out as
  * the literal text `&lt;`, never `<`.
  *
  * Decoded references, one pass, output never re-scanned:
  *  - `&#D+;` (1–7 digits) and `&#xH+;`/`&#XH+;` (1–6 hex) → the code
  *    point, when it is a valid non-surrogate scalar value > 0;
  *  - named: `amp lt gt quot apos nbsp` (nbsp → U+00A0 — real, not a
  *    plain space; tokenizers that split on ASCII whitespace keep it,
  *    which is exactly how production corpus pipelines see it).
  * Anything else — unknown names, missing semicolons, overlong or
  * invalid numerics — is left byte-for-byte literal (strict,
  * oracle-replayable; the full HTML5 named table is ~2 200 entries a
  * curation gate does not need).
  *
  * Value-identical to the independent character-walker in HtmlOpsSpec;
  * codegen-friendly (a static call, same shape as
  * [[SimHashExpression]]).
  */
object HtmlEntityExpression {

  def decode(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    var i = s.indexOf('&')
    if (i < 0) return input // fast path: nothing to decode
    val out = new java.lang.StringBuilder(n)
    out.append(s, 0, i)
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        var consumed = 0 // chars consumed beyond this point, 0 = literal
        if (i + 1 < n && s.charAt(i + 1) == '#') {
          val hex = i + 2 < n && (s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X')
          val d0 = if (hex) i + 3 else i + 2
          var j = d0
          var cp = 0L
          val radix = if (hex) 16 else 10
          val maxDigits = if (hex) 6 else 7
          var ok = true
          while (ok && j < n && j - d0 < maxDigits + 1 && s.charAt(j) != ';') {
            val d = Character.digit(s.charAt(j), radix)
            if (d < 0) ok = false
            else { cp = cp * radix + d; j += 1 }
          }
          if (ok && j < n && s.charAt(j) == ';' && j > d0 &&
            j - d0 <= maxDigits && cp > 0 && cp <= 0x10FFFF &&
            !(cp >= 0xD800 && cp <= 0xDFFF)) {
            out.appendCodePoint(cp.toInt)
            consumed = j + 1 - i
          }
        } else {
          var j = i + 1
          while (j < n && j - i <= 5 && Character.isLetter(s.charAt(j))) j += 1
          if (j < n && s.charAt(j) == ';') {
            val rep = s.substring(i + 1, j) match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case "nbsp" => "\u00A0"
              case _ => null
            }
            if (rep != null) {
              out.append(rep)
              consumed = j + 1 - i
            }
          }
        }
        if (consumed == 0) { out.append('&'); i += 1 }
        else i += consumed
      }
    }
    UTF8String.fromString(out.toString)
  }

  case class DecodeHtmlEntities(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DataTypes.StringType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      decode(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.HtmlEntityExpression.decode($c)")
    override protected def withNewChildInternal(
        newChild: Expression): DecodeHtmlEntities = copy(child = newChild)
  }

  def decodeHtmlEntities(c: Column): Column =
    Bridge.column(DecodeHtmlEntities(Bridge.expression(c)))
}
