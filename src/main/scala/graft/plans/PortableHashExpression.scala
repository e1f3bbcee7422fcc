package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native kernel behind [[graft.functions.PortableHash]]: the first k hex
  * chars of `md5(bytes)` as an unsigned integer, computed directly from the
  * digest bits.
  *
  * The composable spelling — `conv(substring(md5(x), 1, k), 16, 10)` —
  * materializes the 32-char hex STRING, slices it, and re-parses the slice
  * through `conv`'s radix converter, per call; across the sketch family
  * (feature hashing, MinHash seeds, KMV, salting, Bloom bits) that chain is
  * pure per-row overhead on top of the digest itself. The kernel digests the
  * same bytes with the same MD5 and reads the value straight off the first
  * digest bytes.
  *
  * Equivalence (asserted on randomized inputs by PortableHashExpressionSpec):
  * md5's hex form is big-endian per byte, two chars per byte, so the first
  * 15 hex chars are exactly the digest's first 60 bits (first 8 bytes
  * big-endian, shifted right 4) and the first 7 hex chars its first 28 bits
  * — both nonnegative in a long, matching `conv(..., 16, 10).cast("long")`.
  */
object PortableHashExpression {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(b) — ≡ ('0x' || substr(md5(b),1,15))::BIGINT. */
  def md5Prefix60(b: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(b)
    val hi = ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    hi >>> 4
  }

  /** First 28 bits of md5(b) — ≡ ('0x' || substr(md5(b),1,7))::BIGINT. */
  def md5Prefix28(b: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(b)
    val hi = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    hi >>> 4
  }

  case class Md5Prefix(child: Expression, bits: Int) extends UnaryExpression {
    require(bits == 60 || bits == 28, s"unsupported prefix width $bits")
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      if (bits == 60) md5Prefix60(input.asInstanceOf[Array[Byte]])
      else md5Prefix28(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.PortableHashExpression.md5Prefix$bits($c)")
    override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
      copy(child = newChild)
  }

  def md5_prefix60(c: Column): Column =
    Bridge.column(Md5Prefix(Bridge.expression(c.cast("binary")), 60))

  def md5_prefix28(c: Column): Column =
    Bridge.column(Md5Prefix(Bridge.expression(c.cast("binary")), 28))

  private val Space = ' '.toByte

  /** Fused scan-side hashed-bigram featurizer: per adjacent token pair,
    * `md5Prefix60(w1 ⧺ ' ' ⧺ w2) % modulo` — ≡ the retired
    * `explode(transform(sequence(0, n−2), i → concat(arr[i], ' ',
    * arr[i+1])))` + `pHash60(bg) % B` chain (DsirOps / ClassifierOps),
    * which ran an interpreted lambda AND allocated the concatenated
    * string per pair only to digest it. The digest here streams the same
    * three byte runs through the same MD5 (UTF8String concat is byte
    * concatenation), so the value is bit-identical; a null token yields a
    * null element exactly as `concat` propagates null. The long array
    * explodes far lighter than a string array.
    */
  def bigramFeats(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      modulo: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val d = md.get()
    val out = new Array[Any](n - 1)
    var prev: Array[Byte] =
      if (arr.isNullAt(0)) null else arr.getUTF8String(0).getBytes
    var i = 0
    while (i < n - 1) {
      val cur: Array[Byte] =
        if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1).getBytes
      if (prev == null || cur == null) out(i) = null
      else {
        d.reset()
        d.update(prev); d.update(Space); d.update(cur)
        val h = d.digest()
        val hi = ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
          ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
          ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
          ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
        out(i) = (hi >>> 4) % modulo
      }
      prev = cur
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class BigramFeats(child: Expression, modulo: Long) extends UnaryExpression {
    require(modulo > 0, s"modulo must be positive, got $modulo")
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      bigramFeats(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], modulo)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.PortableHashExpression.bigramFeats($c, ${modulo}L)")
    override protected def withNewChildInternal(newChild: Expression): BigramFeats =
      copy(child = newChild)
  }

  /** array<string> → array<long> of `pHash60(w1 ⧺ ' ' ⧺ w2) % modulo`
    * per adjacent pair.
    */
  def bigram_feats(arr: Column, modulo: Long): Column =
    Bridge.column(BigramFeats(Bridge.expression(arr), modulo))
}
