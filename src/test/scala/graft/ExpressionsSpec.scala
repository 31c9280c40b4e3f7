package graft

import graft.plans.{GraftExpressions, PorterStem}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("NormalizeNaNZero maps -0.0 to +0.0 and keeps values") {
    val got = Seq(-0.0, 0.0, 1.5, -2.5).toDF("x")
      .select(GraftExpressions.normalizeNanZero($"x").as("y"))
      .as[Double].collect()
    assert(got.toSeq == Seq(0.0, 0.0, 1.5, -2.5))
    assert(1.0 / got(0) > 0, "-0.0 must become +0.0")
  }

  test("NormalizeNaNZero canonicalizes NaN") {
    val got = Seq(Double.NaN).toDF("x")
      .select(GraftExpressions.normalizeNanZero($"x")).as[Double].head()
    assert(got.isNaN)
  }

  test("PorterStem matches classic algorithm outputs") {
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing", "happy" -> "happi",
      "relational" -> "relat", "conditional" -> "condit",
      "hopeful" -> "hope", "goodness" -> "good",
      // step 4 fires ONE rule: no al-then-ion double strip
      "professional" -> "profession", "adoption" -> "adopt")
    cases.foreach { case (in, want) =>
      assert(PorterStem.stem(in) == want, s"stem($in)")
    }
  }

  test("DotProduct matches the interpreted HOF fold bit-for-bit") {
    val df = Seq(
        (Seq(1.5f, -2.25f, 0.5f), Seq(4.0f, 0.125f, -8.0f)),
        (Seq(0.1f, 0.2f, 0.3f), Seq(0.7f, 0.8f, 0.9f)))
      .toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)).as[Double].collect()
    val gen = df.select(GraftExpressions.dotProduct($"a", $"b"))
      .as[Double].collect()
    // exact equality: both are sequential element-order double folds
    assert(gen.toSeq == hof.toSeq)
    // null array -> null; null element -> null
    val nulls = Seq(
        (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
        (null, Seq[java.lang.Double](1.0)))
      .toDF("a", "b")
      .select(GraftExpressions.dotProduct($"a", $"b").as("d"))
      .collect().map(_.isNullAt(0))
    assert(nulls.toSeq == Seq(true, true))
    // null ELEMENT inside NON-NULLABLE array children (CreateArray):
    // locks the nullable override — without it codegen never declares
    // isNull and the emitted assignment fails to compile
    val ca = Seq((Some(1.0), 2.0), (None, 3.0)).toDF("x", "y")
      .select(GraftExpressions.dotProduct(array($"x"), array($"y")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(ca.toSeq == Seq(Some(2.0), None))
    // SQL registration
    GraftExpressions.register(spark)
    val viaSql = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .selectExpr("dot_product(a, b)").as[Double].head()
    assert(viaSql == 11.0)
  }

  test("GraftExtensions installs SQL functions in a fresh session") {
    import org.apache.spark.sql.SparkSession
    val base = spark // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      val got = s2.sql("SELECT porter_stem('running') AS s").collect()(0).getString(0)
      assert(got == "run")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("porter_stem registered as SQL function") {
    GraftExpressions.register(spark)
    val got = spark.sql("SELECT porter_stem('running') AS s")
      .as[String].head()
    assert(got == "run")
  }

  test("WordPieceTokenize: greedy longest match, ## continuations, [UNK]") {
    import graft.plans.WordPieceTokenize
    val vocab = Seq("un", "##aff", "##able", "aff", "the")
    val got = Seq("the unaffable zzz").toDF("s")
      .select(WordPieceTokenize($"s", vocab).as("p"))
      .as[Seq[String]].head()
    assert(got == Seq("the", "un", "##aff", "##able", "[UNK]"))
  }

  test("RangeJoin custom operator matches the built-in join result") {
    import graft.plans.RangeJoin
    val facts = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, 9.99), (5L, 10.0))
      .toDF("k", "v")
    val bins = Seq(("low", 0.0, 10.0), ("mid", 10.0, 20.0))
      .toDF("label", "lo", "hi")
    val custom = RangeJoin.rangeJoin(facts, bins, "v", "lo", "hi")
      .select("k", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val builtin = facts.join(bins, $"v" >= $"lo" && $"v" < $"hi")
      .select("k", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(custom == builtin)
    assert(custom == Set((1L, "low"), (4L, "low"), (5L, "mid"), (2L, "mid")))
    // physical plan actually uses the custom exec (nodeName drops "Exec")
    val exec = RangeJoin.rangeJoin(facts, bins, "v", "lo", "hi")
      .queryExecution.executedPlan
    assert(exec.collectFirst { case e: graft.plans.RangeJoinExec => e }.isDefined,
      exec.toString)
  }

  test("RangeJoin drops null interval bounds and rejects non-numeric cols") {
    import graft.plans.RangeJoin
    val facts = Seq((1L, 5.0), (2L, 15.0)).toDF("k", "v")
    val bins = Seq(("low", Some(0.0), Some(10.0)),
        ("bad_lo", None, Some(99.0)), ("bad_hi", Some(0.0), None))
      .toDF("label", "lo", "hi")
    val got = RangeJoin.rangeJoin(facts, bins, "v", "lo", "hi")
      .select("k", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "low")), "null-bounded intervals must not match")
    val strBins = Seq(("x", "a", "b")).toDF("label", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(facts, strBins, "v", "lo", "hi")
    }
  }

  test("ewma merge path raises instead of silently merging partial states") {
    import org.apache.spark.sql.graftshim.ColumnBridge
    import graft.plans.Ewma
    // Bypass the WindowSpec-requiring API to simulate a user planting the
    // aggregate in groupBy/agg, where partial-merge would be wrong.
    val df = (1 to 100).map(i => (i % 2, i.toDouble)).toDF("k", "v")
      .repartition(4)
    val agg = ColumnBridge.column(
      Ewma(ColumnBridge.expression($"v"), 0.5).toAggregateExpression())
    val ex = intercept[Exception] {
      df.groupBy($"k").agg(agg.as("e")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("ewma")), ex.toString)
  }

  test("BpeEncode applies merges in rank order (classic lower->low+er)") {
    import graft.plans.BpeEncode
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "r", "low" -> "er")
    val got = Seq("lower low newer").toDF("s")
      .select(BpeEncode($"s", merges)).as[Seq[String]].head()
    assert(got == Seq("lower", "low", "n", "e", "w", "er"))
  }

  test("BpeEncode with no applicable merges returns characters") {
    import graft.plans.BpeEncode
    val got = Seq("xyz").toDF("s")
      .select(BpeEncode($"s", Seq("a" -> "b"))).as[Seq[String]].head()
    assert(got == Seq("x", "y", "z"))
  }

  test("TDigestQuantile tracks exact percentiles within tolerance") {
    import graft.plans.TDigestQuantile
    val df = (1 to 10000).map(i => (i % 7, i.toDouble)).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(TDigestQuantile.of($"v", 0.5, 100).as("td"),
        expr("percentile(v, 0.5)").as("exact"))
      .select(abs($"td" - $"exact") / $"exact").as[Double].collect()
    assert(got.forall(_ < 0.02), s"relative errors: ${got.toSeq}")
  }

  test("TDigest sketch merge equals single-pass digest quantiles (approx)") {
    import graft.plans.TDigest
    val a = new TDigest(100); val b = new TDigest(100); val all = new TDigest(100)
    (1 to 5000).foreach { i => a.add(i); all.add(i) }
    (5001 to 10000).foreach { i => b.add(i); all.add(i) }
    a.merge(b)
    Seq(0.1, 0.5, 0.9).foreach { q =>
      assert(math.abs(a.quantile(q) - all.quantile(q)) / 10000 < 0.02)
      assert(math.abs(a.quantile(q) - q * 10000) / 10000 < 0.02)
    }
  }

  test("searchSorted/labelBins match hand expectations") {
    import graft.functions.NumericFunctions._
    val df = Seq(-1.0, 0.0, 5.0, 10.0, 45.0, 60.0).toDF("v")
    val got = df.select(labelBins($"v", Seq(0.0, 10.0, 20.0, 30.0, 40.0, 51.0)))
      .as[Int].collect()
    assert(got.toSeq == Seq(-1, 0, 0, 1, 4, -1))
  }

  test("ewma window matches hand computation") {
    val df = Seq((1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, 30.0))
      .toDF("k", "i", "v")
    val w = Window.partitionBy($"k").orderBy($"i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df.select(GraftExpressions.ewma($"v", 0.5, w))
      .as[Double].collect()
    assert(got.toSeq == Seq(10.0, 15.0, 22.5)) // 0.5*20+0.5*10, 0.5*30+0.5*15
  }
}
