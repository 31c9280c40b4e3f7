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
      "hopeful" -> "hope", "goodness" -> "good")
    cases.foreach { case (in, want) =>
      assert(PorterStem.stem(in) == want, s"stem($in)")
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

  test("ewma window matches hand computation") {
    val df = Seq((1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, 30.0))
      .toDF("k", "i", "v")
    val w = Window.partitionBy($"k").orderBy($"i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df.select(GraftExpressions.ewma($"v", 0.5).over(w))
      .as[Double].collect()
    assert(got.toSeq == Seq(10.0, 15.0, 22.5)) // 0.5*20+0.5*10, 0.5*30+0.5*15
  }
}
