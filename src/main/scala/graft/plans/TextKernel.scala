package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** The ONE copy of the dialect-exact tokenizer + md5-prefix packers shared
  * by every native text kernel ([[ShingleExpression]],
  * [[SimHashExpression]]). The contract these helpers pin down is
  * load-bearing for cross-engine hash-match and must stay in lockstep with
  * `TextOps.WhitespaceClass` and every DuckDB oracle's `\s+`:
  *
  *  - SQL `trim` semantics: strip SPACES only (Java's `String.trim` also
  *    strips \n/\t/controls and would diverge from both engines);
  *  - whitespace split on the RE2-equivalent class `[ \t\n\f\r]` (Java's
  *    `\s` additionally matches vertical tab);
  *  - split limit -1: leading/trailing empty tokens are KEPT, like Spark's
  *    `split` (Java's default limit 0 drops trailing empties).
  */
private[plans] object TextKernel {

  private val Ws = java.util.regex.Pattern.compile("[ \\t\\n\\f\\r]+")

  /** Tokenize exactly like `split(trim(text), TextOps.WhitespaceClass)`. */
  def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    Ws.split(s.substring(b, e), -1)
  }

  /** Top 28 bits of an md5 digest == its first 7 hex chars as an integer. */
  @inline def top28(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)

  /** Top 60 bits of an md5 digest == its first 15 hex chars as an integer. */
  @inline def top60(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
}
