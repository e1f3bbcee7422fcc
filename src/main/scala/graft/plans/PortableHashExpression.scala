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
}
