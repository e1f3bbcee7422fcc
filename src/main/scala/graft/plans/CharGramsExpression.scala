package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All overlapping L-character windows of a string, as `array<string>` —
  * the positional char-shingle kernel of `q_substring_dupes`.
  *
  * For `length(text) >= L`, semantically identical to
  * `transform(sequence(1, length(text) - L + 1), i -> substring(text, i, L))`
  * (array index k holds the gram starting at 1-based character k+1; char =
  * code point, like `substring` and DuckDB's `substr`), but evaluated as
  * one primitive loop inside whole-stage codegen. BELOW L the two
  * DIVERGE: `sequence(1, n)` with n <= 0 DESCENDS (1, 0, -1, …), so the
  * chain emits garbage grams from negative substring positions, while
  * `char_grams` returns the empty array — the semantics a caller wants.
  * (`SubstringDedup` pre-filters `length >= L`, so it sits in the
  * identical regime either way.) The composable chain
  * runs its lambda INTERPRETED per element (higher-order functions have no
  * codegen), and each `substring(text, i, L)` call re-walks the string's
  * bytes from the start to find code point i — O(chars²) per document on
  * top of the interpreter overhead. This kernel walks the byte offsets
  * once and emits zero-copy slices (`UTF8String.fromBytes` over the shared
  * byte array), making the corpus-sized shingle emit scan-cheap — the cost
  * profile the operator's 100 TB story assumes.
  */
object CharGramsExpression {

  def charGrams(text: UTF8String, l: Int): GenericArrayData = {
    // getBytes copies unless the string exactly spans its backing array
    // (offset 0, length == array.length). Buffer-backed strings from
    // UnsafeRows / columnar vectors sit at interior offsets, so they are
    // copied here and the emitted slices reference this call's private
    // array — never a buffer the scan will overwrite. In the full-span
    // case the array is owned by an immutable UTF8String, equally safe.
    val bytes = text.getBytes
    val nBytes = bytes.length
    val offs = new Array[Int](nBytes + 1) // char index -> byte offset
    var i = 0
    var c = 0
    while (i < nBytes) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = nBytes
    if (c < l) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](c - l + 1)
    var k = 0
    while (k <= c - l) {
      out(k) = UTF8String.fromBytes(bytes, offs(k), offs(k + l) - offs(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  case class CharGrams(child: Expression, l: Int) extends UnaryExpression {
    require(l > 0, "gram length must be positive")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      charGrams(input.asInstanceOf[UTF8String], l)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.CharGramsExpression.charGrams($c, $l)")
    override protected def withNewChildInternal(newChild: Expression): CharGrams =
      copy(child = newChild)
  }

  def char_grams(c: Column, l: Int): Column =
    Bridge.column(CharGrams(Bridge.expression(c), l))
}
