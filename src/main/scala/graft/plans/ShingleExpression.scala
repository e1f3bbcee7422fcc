package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-n-gram shingle hashing: whitespace-tokenize, join each n-gram
  * with single spaces, de-duplicate the shingle STRINGS (first-occurrence,
  * like `array_distinct`), and hash each with the 28-bit md5 prefix
  * ([[graft.functions.PortableHash.pHash28]]).
  *
  * Replaces the composable chain `split → n× slice → zip_with concat →
  * array_compact → array_distinct → transform(md5)` whose higher-order
  * functions all run interpreted (no codegen for HOF lambdas) — that chain
  * was the remaining hot path of the MinHash queries. Distinct-then-hash
  * order is preserved exactly (a hash collision between distinct shingles
  * must keep both occurrences, as the SQL form does).
  */
object ShingleExpression {

  /** Tokenize ([[TextKernel.tokenize]] — the shared dialect-exact
    * tokenizer) + n-gram + first-occurrence dedup, matching the composable
    * `split(trim(text), "\\s+")` chain exactly.
    */
  private def grams(text: UTF8String, n: Int): java.util.LinkedHashSet[String] = {
    val toks = TextKernel.tokenize(text)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length < n) return seen
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder()
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen
  }

  def hashes(text: UTF8String, n: Int): GenericArrayData = {
    val seen = grams(text, n)
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16) // reused digest buffer — no alloc per shingle
    val out = new Array[Long](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) {
      md.update(it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.digest(d, 0, 16)
      out(k) = TextKernel.top28(d)
      k += 1
    }
    new GenericArrayData(out)
  }

  case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
    require(n > 0, "shingle length must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      hashes(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.ShingleExpression.hashes($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  def shingle_hashes(c: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c), n))

  /** The distinct shingle STRINGS themselves (same [[grams]] pipeline, no
    * hashing) — for operators that group on the n-gram text, e.g. bigram
    * frequency stats.
    */
  def strings(text: UTF8String, n: Int): GenericArrayData = {
    val seen = grams(text, n)
    val out = new Array[AnyRef](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {
    require(n > 0, "shingle length must be positive")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      strings(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.ShingleExpression.strings($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
      copy(child = newChild)
  }

  def shingle_strings(c: Column, n: Int): Column =
    Bridge.column(ShingleStrings(Bridge.expression(c), n))
}
