package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, Decimal, DoubleType}

/** DOUBLE → DECIMAL(p, s) quantization that is bit-identical to Spark's
  * `Cast(d as decimal(p,s))` but skips the per-row
  * `Double.toString → BigDecimal parse → setScale(HALF_UP)` churn that
  * dominates every exact-decimal aggregate kernel (QueryPack.dsum,
  * Stats.corrMatrix moments, the 2^45 fixed-point graph sums) — measured
  * ~400 ns/row/agg in Stats.scala, the single largest per-row cost on
  * the TPC-H and agg axes (guide §4: expression cost in the hot path;
  * OPTIMIZATION_r17.md has the numbers).
  *
  * Semantics contract (why this is safe to swap in under an oracle that
  * hash-compares results): Spark's cast computes
  * `HALF_UP(shortest_decimal(d) * 10^s)` where `shortest_decimal(d)` is
  * the `Double.toString` shortest round-tripping representation
  * (`java.math.BigDecimal.valueOf`). The fast path reproduces exactly
  * that value with no allocation:
  *
  *   hi = fl(d * 10^s), lo = fma(d, 10^s, -hi)   // hi + lo = d*10^s EXACTLY
  *   r  = rint(hi)                               // candidate integer
  *   t  = (hi - r) + lo                          // (hi-r) exact by Sterbenz
  *   h  = ulp(d)/2 * 10^s                        // shortest-repr radius:
  *                                               // |shortest(d) - d| <= ulp/2
  *
  * Every decimal value that rounds to the same double d lies within h of
  * d, so `shortest(d)*10^s ∈ [hi+lo-h, hi+lo+h] = [r+t-h, r+t+h]`. When
  * `|t| + h < 0.5 - margin` that whole interval sits strictly between
  * the two half-integer rounding boundaries around r, so HALF_UP of ANY
  * value in it — in particular of shortest(d) — is exactly r. The margin
  * (1e-8) swallows the two float roundings in computing t and |t|+h
  * (each <= 2^-52 of operands bounded by 0.5-ish) with seven orders of
  * magnitude to spare. Values inside the margin (probability ~1e-8 per
  * row, boundary-straddling inputs) take the slow path, which is
  * LITERALLY Spark's own cast code — so the expression is exact on every
  * input, not just on measured data.
  *
  * |hi| < 1e15 additionally guarantees: r.toLong is exact (< 2^53), the
  * Sterbenz argument for (hi - r) holds, the unscaled result fits any
  * precision >= 16 (both call-site families use 18 and 38), and NaN/Inf
  * fail the bound and fall through to the slow path.
  *
  * Overflow/NaN note: every engine session runs Spark 4's default ANSI
  * mode, where Cast THROWS on decimal overflow — and all 356 declared
  * queries pass, so no dsum input ever overflows or is NaN/Inf. This
  * expression therefore throws ArithmeticException on those inputs:
  * observationally identical on all query data, and loud (never a
  * silent null) on anything new.
  */
case class FastDoubleToDecimal(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {
  require(scale >= 0 && scale <= 18 && precision >= scale,
    s"fast_decimal supports scale 0..18, got ($precision, $scale)")
  override def dataType: DataType = DecimalType(precision, scale)
  override def prettyName: String = "fast_decimal"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fast_decimal needs DOUBLE, got ${child.dataType} (cast explicitly — " +
        "integral/decimal inputs should keep the plain Cast, which is " +
        "already allocation-free for them)")
  override def nullSafeEval(v: Any): Any =
    FastDecimalImpl.quantize(v.asInstanceOf[Double], precision, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.FastDecimalImpl.quantize($c, $precision, $scale);")
  override protected def withNewChildInternal(c: Expression): FastDoubleToDecimal =
    copy(child = c)
}

object FastDecimalImpl {
  // 10^s is exactly representable as a double for s <= 22
  private val POW10: Array[Double] =
    (0 to 18).map(i => math.pow(10.0, i)).toArray
  private val LONG_POW10: Array[Long] =
    (0 to 18).scanLeft(1L)((a, _) => a * 10L).toArray

  /** Exact replacement for the rounding of
    * `Decimal(d).changePrecision(precision, scale)`; throws on
    * overflow/NaN/Inf (the ANSI-session contract — see
    * [[FastDoubleToDecimal]] for the proof and rationale). */
  def quantize(d: Double, precision: Int, scale: Int): Decimal = {
    val p = POW10(scale)
    val hi = d * p
    // NaN/Inf fail this comparison and take the slow path
    if (java.lang.Math.abs(hi) < 1e15) {
      val lo = java.lang.Math.fma(d, p, -hi)
      val r = java.lang.Math.rint(hi)
      val t = (hi - r) + lo
      val h = java.lang.Math.ulp(d) * (0.5 * p)
      if (java.lang.Math.abs(t) + h < 0.49999999) {
        val u = r.toLong
        // |u| < 1e15 always fits precision >= 16
        if (precision >= 16 || java.lang.Math.abs(u) < LONG_POW10(precision))
          return Decimal(u, precision, scale)
        throw overflow(d, precision, scale)
      }
    }
    slow(d, precision, scale)
  }

  private def slow(d: Double, precision: Int, scale: Int): Decimal = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw overflow(d, precision, scale)
    val dec = Decimal(d) // Double.toString → BigDecimal: Spark's own cast path
    if (dec.changePrecision(precision, scale)) dec
    else throw overflow(d, precision, scale)
  }

  private def overflow(d: Double, precision: Int, scale: Int) =
    new ArithmeticException(
      s"fast_decimal: $d cannot be represented as Decimal($precision, $scale)")
}
