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

  // RE2-equivalent whitespace (no \x0B), matching TextOps.WhitespaceClass
  // and therefore every DuckDB oracle's `\s+`
  private val Ws = java.util.regex.Pattern.compile("[ \\t\\n\\f\\r]+")

  /** Tokenize + n-gram + first-occurrence dedup, matching the composable
    * `split(trim(text), "\\s+")` EXACTLY: SQL `trim` strips leading/trailing
    * SPACES only (Java's `String.trim` would also strip \n/\t/controls and
    * diverge from both engines), and the regex split keeps leading/trailing
    * empty tokens like Spark's `split` (limit -1; Java's default limit 0
    * drops trailing empties).
    */
  private def grams(text: UTF8String, n: Int): java.util.LinkedHashSet[String] = {
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val toks = Ws.split(s.substring(b, e), -1)
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
      // first 7 hex chars == top 28 bits
      out(k) = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
      k += 1
    }
    new GenericArrayData(out)
  }

  case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
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
