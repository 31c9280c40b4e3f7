package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null/NaN semantics matrix (FIXTURES.md §B.1: typed columns with
  * validity masks; reference tests like cpp/tests/groupby and
  * drop_nulls/drop_nans, stream_compaction.hpp:73-151). Locks the
  * Spark-rule semantics the reference explicitly models
  * (binaryop.hpp:79-82 NULL_LOGICAL_AND/OR "Spark rules").
  */
class NullNaNSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nums = Seq(Some(1.0), Some(Double.NaN), None, Some(3.0))
    .toDF("v")

  test("aggregates skip nulls but propagate NaN (COUNT_VALID semantics)") {
    val r = nums.agg(count($"v"), sum($"v"), max($"v")).head()
    assert(r.getLong(0) == 3)                 // count skips null, counts NaN
    assert(r.getDouble(1).isNaN)              // sum poisoned by NaN
    assert(r.getDouble(2).isNaN)              // Spark: NaN > any double
  }

  test("drop_nulls vs drop_nans are distinct operations") {
    // Spark's na.drop treats NaN as missing on double columns → drops BOTH
    assert(nums.na.drop().count() == 2)
    // drop_nulls only (stream_compaction.hpp:73): isNotNull filter
    assert(nums.filter($"v".isNotNull).count() == 3)
    // drop_nans only (stream_compaction.hpp:151): keep nulls, drop NaN
    assert(nums.filter(!isnan($"v") || $"v".isNull).count() == 3)
  }

  test("nanvl replaces NaN but not null (replace_nans, replace.hpp:114)") {
    val got = nums.select(nanvl($"v", lit(-1.0))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got(1) == -1.0 && got(2) == null)
  }

  test("NaN equals NaN in groupBy/distinct keys (normalized key semantics)") {
    val g = Seq(Double.NaN, Double.NaN, 1.0).toDF("v")
      .groupBy($"v").count().collect()
    assert(g.length == 2, "NaNs must group together")
  }

  test("null-safe logical ops: Spark three-valued AND/OR (binaryop.hpp:79)") {
    val df = Seq((Some(true), None: Option[Boolean]),
      (Some(false), None), (None, None)).toDF("a", "b")
    val got = df.select($"a" && $"b", $"a" || $"b").collect()
    assert(got(0).isNullAt(0), "true AND null must be null")
    assert(got(0).getBoolean(1), "true OR null must be true")
    assert(!got(1).getBoolean(0), "false AND null must be false")
    assert(got(1).isNullAt(1), "false OR null must be null")
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
  }

  test("empty string and null string are distinct values") {
    val df = Seq(Some(""), None, Some("x")).toDF("s")
    assert(df.filter($"s" === "").count() == 1)
    assert(df.filter($"s".isNull).count() == 1)
    assert(df.select(length($"s")).collect()(0).getInt(0) == 0)
  }

  test("empty array vs null array are distinct (lists fixture §B.4)") {
    val df = Seq(Some(Seq.empty[Int]), None, Some(Seq(1)))
      .toDF("a")
    assert(df.filter(size($"a") === 0).count() == 1)
    assert(df.filter($"a".isNull).count() == 1)
    // explode drops both empty and null; explode_outer keeps one row each
    assert(df.select(explode($"a")).count() == 1)
    assert(df.select(explode_outer($"a")).count() == 3)
  }

  test("unicode multi-byte strings: length/substr/upper/reverse/split (§B.5)") {
    val df = Seq("héllo wörld", "日本語 テスト", "emoji 🚀 test").toDF("s")
    val got = df.select(length($"s"), substring($"s", 1, 5), upper($"s"),
      reverse($"s"), size(split($"s", " "))).collect()
    // length counts characters (code points for BMP; surrogate pairs = 2)
    assert(got(0).getInt(0) == 11)
    assert(got(0).getString(1) == "héllo")
    assert(got(0).getString(2) == "HÉLLO WÖRLD")
    assert(got(1).getInt(0) == 7)
    assert(got(1).getString(1) == "日本語 テ")
    assert(got(1).getString(3) == "トステ 語本日")
    assert(got.map(_.getInt(4)).toSeq == Seq(2, 2, 3))
    // byte length differs from char length for multi-byte text
    val bytes = df.select(octet_length($"s")).collect().map(_.getInt(0))
    assert(bytes(0) == 13 && bytes(1) > 7)
  }

  test("decimal(38) arithmetic keeps exactness at max precision") {
    val df = Seq("99999999999999999999999999999999999.99")
      .toDF("s").select($"s".cast("decimal(37,2)").as("d"))
    val r = df.select(($"d" - $"d").cast("string")).head().getString(0)
    assert(r == "0.00")
  }
}
