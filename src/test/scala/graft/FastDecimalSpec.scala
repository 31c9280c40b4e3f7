package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{Decimal, DecimalType}
import graft.plans.FastDecimalImpl

/** FastDoubleToDecimal must be bit-identical to Spark's
  * `cast(DecimalType(p, s))` on every input — the dsum/corrMatrix
  * kernels feed the DuckDB oracle's hash comparison, so a single
  * off-by-one-unscaled row anywhere would fail a gate. Locked three
  * ways: an adversarial direct-impl sweep (boundary-straddling values
  * hunting the fast/slow seam), a large randomized sweep across
  * magnitudes, and an end-to-end DataFrame comparison under the real
  * session (codegen path, session ANSI setting).
  */
class FastDecimalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Reference rounding: literally what Spark's Cast does for
    * double→decimal (ANSI overflow/NaN → None = "throws"). */
  private def ref(d: Double, p: Int, s: Int): Option[Decimal] = {
    if (d.isNaN || d.isInfinite) return None
    val dec = Decimal(d)
    if (dec.changePrecision(p, s)) Some(dec) else None
  }

  private def check(d: Double, p: Int, s: Int): Unit = {
    val got = try Some(FastDecimalImpl.quantize(d, p, s))
      catch { case _: ArithmeticException => None }
    val want = ref(d, p, s)
    assert(got.isDefined == want.isDefined &&
      got.forall(g => g.toJavaBigDecimal.compareTo(want.get.toJavaBigDecimal) == 0),
      s"quantize($d, $p, $s): got $got want $want")
  }

  test("adversarial: half-boundary-straddling values at every scale") {
    for (s <- Seq(0, 2, 4, 6); p <- Seq(18, 38)) {
      val pow = math.pow(10.0, s)
      // unscaled targets across the whole fast-path magnitude range
      val bases = Seq(0L, 1L, 7L, 12345L, 999999L, 123456789L,
        999999999999L, 99999999999999L, 999999999999999L)
      for (b <- bases; sign <- Seq(1L, -1L)) {
        val u = b * sign
        // exact representable points around k and k+0.5 in value space,
        // then walk ulps across the boundary
        for (center <- Seq(u / pow, (u + 0.5) / pow, (u - 0.5) / pow)) {
          var x = center
          for (_ <- 0 until 6) { check(x, p, s); x = Math.nextUp(x) }
          x = center
          for (_ <- 0 until 6) { check(x, p, s); x = Math.nextDown(x) }
        }
      }
    }
  }

  test("adversarial: specials, subnormals, overflow edges") {
    for ((p, s) <- Seq((18, 4), (18, 2), (18, 6), (38, 6), (38, 0))) {
      Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
        1e-300, -1e-300, 4.9e-324, Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.MaxValue, -Double.MaxValue,
        1e14, 1e15, 1e15 - 1, 1e15 + 1, 9.999999999999999e14,
        1e16, 1e17, 1e18, 1e19, -1e19,
        // dyadic-structured terms (the documented DuckDB hazard class)
        0.5, 0.25, 0.125, 3.0 / 62.0, 1.0 / 3.0, 2.0 / 3.0,
        math.pow(2, -45), 123456.789 * math.pow(2, -20))
        .foreach(check(_, p, s))
    }
  }

  test("randomized sweep across magnitudes (1M values)") {
    val rnd = new java.util.Random(0xfa57dec1L)
    var i = 0
    while (i < 1000000) {
      // exponent-uniform: magnitudes from 1e-12 to 1e15
      val mag = math.pow(10.0, rnd.nextDouble() * 27 - 12)
      val d = (rnd.nextDouble() * 2 - 1) * mag
      check(d, 18, 4)
      check(d, 38, 6)
      if ((i & 7) == 0) { check(d, 18, 2); check(d, 18, 0) }
      i += 1
    }
  }

  test("randomized fixed-point money values (TPC-H shape)") {
    val rnd = new java.util.Random(42)
    (0 until 200000).foreach { _ =>
      val cents = rnd.nextLong() % 20000000L
      val d = cents / 100.0
      check(d, 18, 2); check(d, 18, 4)
      val disc = (rnd.nextInt(11)) / 100.0
      check(d * (1.0 - disc), 18, 6)
    }
  }

  test("end-to-end DataFrame: fast_decimal == cast under session codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new java.util.Random(7)
    // magnitudes capped below 1e13 so no (18,4) overflow: the session is
    // ANSI, so cast would throw — overflow parity is locked by the
    // impl-level sweeps and the explicit throw check below
    val xs = (0 until 50000).map { i =>
      if (i % 5 == 0) (rnd.nextLong() % 2000000L) / 100.0
      else (rnd.nextDouble() * 2 - 1) * math.pow(10.0, rnd.nextDouble() * 18 - 6)
    } ++ Seq(0.0, -0.0, 1e12, -1e12, 0.00005, -0.00005, 2.5e-5)
    val df = xs.toDF("x")
    for ((p, s) <- Seq((18, 4), (18, 2), (38, 6))) {
      val bad = df.select(
        col("x").cast(DecimalType(p, s)).as("c"),
        graft.plans.GraftExpressions.fastDecimal(col("x"), p, s).as("f"))
        .filter(!(col("c") <=> col("f"))).count()
      assert(bad == 0L, s"fast_decimal($p,$s) diverged from cast on $bad rows")
    }
    // and the aggregate totals are identical through dsum's full shape
    val viaCast = df.agg(sum(col("x").cast(DecimalType(18, 4))).cast("double"))
      .collect()(0).getDouble(0)
    val viaFast = df.agg(graft.queries.QueryPack.dsum(col("x"), 4))
      .collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(viaCast) ==
      java.lang.Double.doubleToRawLongBits(viaFast))
    // overflow throws (ANSI parity), never a silent null
    val thrown = intercept[Exception] {
      Seq(1e15).toDF("x")
        .select(graft.plans.GraftExpressions.fastDecimal(col("x"), 18, 4))
        .collect()
    }
    assert(thrown.toString.toLowerCase.contains("decimal") ||
      thrown.getCause != null)
  }
}
