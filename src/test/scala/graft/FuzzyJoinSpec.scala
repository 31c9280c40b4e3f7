package graft

import graft.operators.FuzzyJoin
import org.scalatest.funsuite.AnyFunSuite

/** SymSpell deletion-neighborhood edit-distance join: recall 1 within
  * radius (candidate generation is lossless), precision 1 (exact
  * levenshtein verify), no cross join in the plan. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val words = Seq(
    (1L, "scan"), (2L, "scat"),   // sub, dist 1
    (3L, "scans"),                // ins vs 1, dist 1
    (4L, "can"),                  // del vs 1, dist 1
    (5L, "plan"),                 // dist 2 from scan
    (6L, "window")                // far from everything
  ).toDF("id", "w")

  private def pairs(k: Int): Set[(Long, Long)] =
    FuzzyJoin.editDistanceJoin(
        words.select($"id".as("id1"), $"w".as("w1")), "id1", "w1",
        words.select($"id".as("id2"), $"w".as("w2")), "id2", "w2", k)
      .filter($"id1" < $"id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("k=1 finds exactly the substitution/insert/delete neighbors") {
    val p = pairs(1)
    assert(p.contains((1L, 2L)) && p.contains((1L, 3L)) && p.contains((1L, 4L)))
    assert(!p.contains((1L, 5L)), "dist-2 pair must not appear at k=1")
    assert(!p.exists(t => t._1 == 6L || t._2 == 6L))
    // verify step keeps reported distances exact
    val d = FuzzyJoin.editDistanceJoin(
        words.select($"id".as("id1"), $"w".as("w1")), "id1", "w1",
        words.select($"id".as("id2"), $"w".as("w2")), "id2", "w2", 1)
      .filter($"id1" === 1L && $"id2" === 2L)
      .select("dist").head.getInt(0)
    assert(d == 1)
  }

  test("k=2 widens to the dist-2 pairs and matches brute force exactly") {
    val p = pairs(2)
    assert(p.contains((1L, 5L)), "scan~plan is dist 2")
    assert(p.contains((2L, 4L)), "scat~can is dist 2")
    // brute-force ground truth over all pairs
    val brute = words.as("a").crossJoin(words.as("b"))
      .filter($"a.id" < $"b.id")
      .filter(org.apache.spark.sql.functions
        .levenshtein($"a.w", $"b.w") <= 2)
      .select($"a.id", $"b.id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == brute, "deletion-neighborhood join must equal brute force")
  }

  test("closestMatch corrects toward the nearest dictionary entry") {
    val dict = Seq("scan", "window", "filter").toDF("term")
    val out = FuzzyJoin.closestMatch(
        Seq((1L, "scon"), (2L, "window"), (3L, "zzzzz")).toDF("id", "w"),
        "id", "w", dict, "term", k = 1)
      .orderBy("id").collect()
    assert(out(0).getString(2) == "scan")
    assert(out(1).getString(2) == "window")
    assert(out(2).isNullAt(2), "no-match rows survive with null suggestion")
  }

  test("plan has no cross join or nested-loop join") {
    val p = FuzzyJoin.editDistanceJoin(
        words.select($"id".as("id1"), $"w".as("w1")), "id1", "w1",
        words.select($"id".as("id2"), $"w".as("w2")), "id2", "w2", 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"candidate generation must be an equi-join on variants:\n$p")
  }
}
