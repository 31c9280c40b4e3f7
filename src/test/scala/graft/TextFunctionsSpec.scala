package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens lower-cases and splits on whitespace runs") {
    val got = Seq("  The Fast  fox ").toDF("text")
      .select(tokens($"text")).as[Seq[String]].head()
    assert(got == Seq("the", "fast", "fox"))
  }

  test("fingerprint is invariant to token order and duplication") {
    val df = Seq("a b c", "c b a a", "a b d").toDF("text")
      .select(fingerprint($"text").as("fp")).as[String].collect()
    assert(df(0) == df(1))
    assert(df(0) != df(2))
  }

  test("minhash signatures are equal for identical token sets") {
    val df = Seq("x y z", "z y x").toDF("text")
      .withColumn("toks", array_distinct(tokens($"text")))
      .withColumn("toks", sort_array($"toks"))
      .select(minhashSig("toks", 16)).as[Seq[Long]].collect()
    assert(df(0) == df(1))
    assert(df(0).length == 16)
  }

  test("jaccard matches hand computation") {
    val got = Seq(("a b c d", "c d e f")).toDF("x", "y")
      .select(jaccard(tokens($"x"), tokens($"y"))).as[Double].head()
    assert(got == 2.0 / 6.0) // {c,d} over {a,b,c,d,e,f}
  }

  test("simhash of identical docs has hamming distance 0, distinct docs differ") {
    val df = Seq("p q r", "p q r", "completely different words here").toDF("text")
      .withColumn("toks", tokens($"text"))
      .select(simhash64("toks").as("sh")).as[Long].collect()
    assert(df(0) == df(1))
    assert(df(0) != df(2))
  }

  test("langId picks the profile with most hits") {
    val got = Seq("the cat and the hat", "el sort y sort los").toDF("text")
      .select(langId(tokens($"text"))).as[String].collect()
    assert(got(0) == "en")
    assert(got(1) == "es")
  }

  test("charNgrams produces sliding character windows") {
    val got = Seq("abcd").toDF("s")
      .select(charNgrams("s", 2)).as[Seq[String]].head()
    assert(got == Seq("ab", "bc", "cd"))
  }

  test("tokenNgrams joins sliding token windows") {
    val got = Seq("a b c").toDF("text").withColumn("toks", tokens($"text"))
      .select(tokenNgrams("toks", 2)).as[Seq[String]].head()
    assert(got == Seq("a_b", "b_c"))
  }
}
