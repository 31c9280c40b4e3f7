package graft

import graft.functions.TextFunctions
import graft.plans.PorterStem
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests for expression algebra (SURVEY.md §5: the
  * reference has no property tests — this is the planned upgrade).
  * Null/NaN semantics checks run through real Spark plans on generated
  * data; scalar kernels (Porter) are checked as pure functions.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic sampling harness over a scalacheck Gen (the
    * scalatest/scalacheck bridge artifact isn't on the offline
    * classpath, so we drive Gen directly). */
  private def forAll[T](g: Gen[T], n: Int = 25)(f: T => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach { v => f(v); i += 1 }
      seed = seed.next
    }
  }

  private def whenever(b: Boolean)(f: => Unit): Unit = if (b) f

  test("porter stem is idempotent-safe: stemming never grows a word") {
    forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty)) { w =>
      assert(PorterStem.stem(w).length <= w.length)
    }
  }

  test("null-safe equality <=> equals null-aware semantics (NULL_EQUALS)") {
    val gen = Gen.listOfN(24,
      Gen.zip(Gen.option(Gen.choose(-3, 3)), Gen.option(Gen.choose(-3, 3))))
    forAll(gen) { pairs =>
      whenever(pairs.nonEmpty) {
        val df = pairs.map { case (a, b) =>
          (a.map(_.toString).orNull, b.map(_.toString).orNull)
        }.toDF("a", "b")
        val got = df.select(($"a" <=> $"b").as("eq")).as[Boolean].collect()
        val want = pairs.map { case (a, b) => a == b }
        assert(got.toSeq == want)
      }
    }
  }

  test("greatest/least skip nulls (NULL_MAX/NULL_MIN semantics)") {
    val gen = Gen.listOfN(16,
      Gen.zip(Gen.option(Gen.choose(-100, 100)), Gen.option(Gen.choose(-100, 100))))
    forAll(gen) { pairs =>
      whenever(pairs.nonEmpty) {
        val df = pairs.map { case (a, b) =>
          (a.map(Integer.valueOf).orNull, b.map(Integer.valueOf).orNull)
        }.toDF("a", "b")
        val got = df.select(greatest($"a", $"b"), least($"a", $"b")).collect()
        pairs.zip(got).foreach { case ((a, b), row) =>
          val vals = Seq(a, b).flatten
          val wantMax = if (vals.isEmpty) null else Integer.valueOf(vals.max)
          val wantMin = if (vals.isEmpty) null else Integer.valueOf(vals.min)
          assert(row.get(0) == wantMax && row.get(1) == wantMin)
        }
      }
    }
  }

  test("jaccard is symmetric, bounded in [0,1], and 1 on self") {
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    forAll(Gen.zip(text, text)) { case (x, y) =>
      val df = Seq((x, y)).toDF("x", "y")
      val Array(j1, j2, js) = df.select(
        TextFunctions.jaccard(TextFunctions.tokens($"x"), TextFunctions.tokens($"y")),
        TextFunctions.jaccard(TextFunctions.tokens($"y"), TextFunctions.tokens($"x")),
        TextFunctions.jaccard(TextFunctions.tokens($"x"), TextFunctions.tokens($"x")))
        .as[(Double, Double, Double)].head() match {
          case (a, b, c) => Array(a, b, c)
        }
      assert(j1 == j2)
      assert(j1 >= 0.0 && j1 <= 1.0)
      assert(js == 1.0)
    }
  }

  test("minhash signature entries are element-wise <= any member token hash") {
    val word = Gen.oneOf("p", "q", "r", "s", "t")
    forAll(Gen.nonEmptyListOf(word).map(_.distinct)) { toks =>
      val df = Seq(toks.mkString(" ")).toDF("text")
        .withColumn("toks", TextFunctions.tokens($"text"))
      val sig = df.select(TextFunctions.minhashSig("toks", 8))
        .as[Seq[Long]].head()
      val h0 = df.select(expr("transform(toks, t -> xxhash64(t, 0))"))
        .as[Seq[Long]].head()
      assert(sig.length == 8)
      assert(sig.head == h0.min) // seed-0 row is the min over seed-0 hashes
    }
  }
}
