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

  /** ≡ `CAST(round(x * 100) AS BIGINT)` — the engine's cents conversion,
    * spelled ~23 times across the stats/behavior/inference tiers. Spark's
    * `round` on a double is `BigDecimal(d)` (= `Double.toString`, shortest
    * decimal representation) + `setScale(0, HALF_UP)` PER ROW, then the
    * ANSI cast re-checks range.
    *
    * Fast path (all finite |d| < 2⁵¹, no grid assumption): with
    * t = trunc(d) and frac = |d − t| — both EXACT, because trunc of
    * |d| < 2⁵³ is exact and the real difference d − t is a trailing-bit
    * suffix of d's significand, hence representable, hence the correctly
    * rounded subtraction returns it — the result is t when frac < ½ and
    * t±1 (away from zero) when frac ≥ ½. Proof that this equals the
    * shortest-repr HALF_UP: every integer and half-integer below 2⁵² is
    * itself a double, and the shortest representation r of d re-parses to
    * d, so r can never lie on the far side of (or exactly on) a
    * representable boundary k+½ unless d IS that boundary (if r ≥ b > d
    * for a representable b, r would re-parse to b or nearer, not d);
    * ties therefore occur exactly when d = k+½ in binary, where shortest
    * repr is "k.5" (no shorter decimal lies in the half-ulp interval for
    * |d| < 2⁵¹) and HALF_UP rounds away from zero — our frac = ½ branch.
    * The rounded integer is < 2⁵², so Round's `.toDouble` and the ANSI
    * BIGINT cast are exact no-ops. Everything else — |d| ≥ 2⁵¹, NaN, ±Inf
    * — takes the verbatim BigDecimal path and throws on NaN/Inf/overflow
    * like the session's ANSI cast (no engine value reaches it).
    */
  def moneyCents(x: Double): Long = {
    val d = x * 100.0
    if (math.abs(d) < 2.251799813685248e15) { // 2^51
      val t = d.toLong
      val frac = math.abs(d - t.toDouble)
      if (frac < 0.5) t
      else if (d >= 0) t + 1L
      else t - 1L
    } else {
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
        throw new ArithmeticException(s"$d cannot be cast to BIGINT")
      val r = scala.math.BigDecimal(d)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      if (math.floor(r) <= Long.MaxValue.toDouble &&
          math.ceil(r) >= Long.MinValue.toDouble) r.toLong
      else throw new ArithmeticException(s"$r cannot be cast to BIGINT")
    }
  }

  case class MoneyCents(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      moneyCents(input.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.plans.DecimalExpressions.moneyCents($c)")
    override protected def withNewChildInternal(newChild: Expression): MoneyCents =
      copy(child = newChild)
  }

  /** double column → cents BIGINT, ≡ `expr("CAST(round(c * 100) AS BIGINT)")`. */
  def money_cents(c: Column): Column =
    Bridge.column(MoneyCents(Bridge.expression(c.cast("double"))))
}
