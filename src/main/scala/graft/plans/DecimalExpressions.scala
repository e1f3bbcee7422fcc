package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** Fast double → DECIMAL(27,6) conversion for the engine's exact money
  * sums ([[graft.functions.SafeMath.exactSum]]).
  *
  * Spark's `cast(x AS DECIMAL(27,6))` goes through
  * `BigDecimal.valueOf(x)` — i.e. `Double.toString` (shortest decimal
  * representation) plus a parse plus `setScale(6, HALF_UP)` — PER VALUE
  * PER AGGREGATE; on the TPC-H-style money aggregates that chain, not the
  * scan or the sum, dominated (q_pricing_summary: 7 decimal aggregates =
  * 1.5 s of 1.8 s at sf0.1 w8).
  *
  * Fast path: m = rint(x·10⁶); if |x| < 10⁹ and m/10⁶ == x exactly, the
  * result is the compact decimal (m, 27, 6). Proof of bit-identity with
  * the cast: `m/10⁶ == x` (correctly rounded division) means the decimal
  * m·10⁻⁶ lies inside x's half-ulp interval; for |x| < 10⁹ that interval
  * is narrower than 2.5·10⁻⁷ — less than half the 10⁻⁶ grid spacing — so
  * (a) m is the ONLY 6-decimal value in the interval, and (b) every
  * decimal in the interval, in particular `Double.toString(x)`'s shortest
  * representation, is strictly inside (m−½, m+½)·10⁻⁶ or on the (m−½)
  * boundary, and therefore rounds HALF_UP to exactly m. Anything else —
  * values with >6 significant decimals, magnitudes ≥ 10⁹, NaN/Inf — takes
  * the VERBATIM cast path (same BigDecimal.valueOf + changePrecision,
  * null on NaN/Inf like the non-ANSI cast). DecimalExpressionsSpec
  * differentials the expression against the real cast on adversarial
  * doubles.
  */
object DecimalExpressions {

  val Precision = 27
  val Scale = 6

  def toDecimal6(x: Double): Decimal = {
    if (math.abs(x) < 1e9) {
      val m = math.rint(x * 1e6)
      if (m / 1e6 == x) return Decimal(m.toLong, Precision, Scale)
    }
    // the exact semantics of Cast(DoubleType -> DecimalType(27,6)):
    // shortest-representation BigDecimal, then HALF_UP to scale 6;
    // out-of-range/NaN/Inf throw like the ANSI cast (the session default —
    // no engine value reaches either branch)
    val d = Decimal(scala.math.BigDecimal(java.math.BigDecimal.valueOf(x)))
    if (d.changePrecision(Precision, Scale)) d
    else throw new ArithmeticException(
      s"$x cannot be represented as Decimal($Precision, $Scale)")
  }

  case class Double6(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DecimalType(Precision, Scale)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      toDecimal6(input.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.DecimalExpressions.toDecimal6($c)")
    override protected def withNewChildInternal(newChild: Expression): Double6 =
      copy(child = newChild)
  }

  /** double column → DECIMAL(27,6), ≡ `c.cast("decimal(27,6)")`. */
  def double_to_decimal6(c: Column): Column =
    Bridge.column(Double6(Bridge.expression(c.cast("double"))))
}
