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

  test("jaroWinklerBlockedJoin equals brute force restricted to the block") {
    import org.apache.spark.sql.functions.{col, substring}
    import graft.plans.JaroWinklerImpl.jw
    val names = Seq("martha", "marhta", "marcus", "dwayne", "duane",
      "dixon", "dickson", "window", "windows").toDF("nm")
    val got = FuzzyJoin.jaroWinklerBlockedJoin(
        names, "nm", n => substring(n, 1, 1), 0.8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    // brute force with the same block + threshold, driver-side
    val vocab = names.as[String].collect()
    val brute = (for {
      a <- vocab; b <- vocab
      if a < b && a.head == b.head && jw(a, b) >= 0.8
    } yield (a, b, jw(a, b))).toSet
    assert(got == brute)
    // recall contract is exactly "same block": dwayne~duane share 'd'
    // and appear; a cross-block near pair would not — all pairs here
    // share first letters by construction of the blocking key
    assert(got.forall { case (a, b, _) => a.head == b.head })
    assert(got.exists { case (a, b, _) => a == "duane" && b == "dwayne" })
  }

  test("jaroWinklerBestMatch resolves the argmax with deterministic ties") {
    import org.apache.spark.sql.functions.substring
    import graft.plans.JaroWinklerImpl.jw
    val dirty = Seq("marhta", "dwayne", "zzz").toDF("nm")
    val dict = Seq("martha", "marcus", "duane", "dwain").toDF("d")
    val got = FuzzyJoin.jaroWinklerBestMatch(
        dirty, "nm", dict, "d", n => substring(n, 1, 1), 0.8)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("marhta") == "martha",
      s"martha (jw=${jw("marhta", "martha")}) beats marcus")
    // dwayne: duane vs dwain — whichever jw is higher must win
    val expect = if (jw("dwayne", "duane") > jw("dwayne", "dwain")) "duane"
      else if (jw("dwayne", "duane") < jw("dwayne", "dwain")) "dwain"
      else "duane" // tie → lexicographic
    assert(got("dwayne") == expect)
    assert(!got.contains("zzz"), "no in-block candidate → no row")
    // exact jw tie broken by match ascending
    val tied = FuzzyJoin.jaroWinklerBestMatch(
        Seq("abcd").toDF("nm"), "nm",
        Seq("abcx", "abcy").toDF("d"), "d",
        n => substring(n, 1, 1), 0.5)
      .collect()
    assert(tied.length == 1 && tied(0).getString(1) == "abcx")
  }

  test("jaroWinklerBestMatch: a key present in the dict resolves to itself") {
    import org.apache.spark.sql.functions.substring
    // bipartite resolution: the exact hit (jw = 1.0) must win — the old
    // self-join exclusion would have resolved "martha" to "marcus"
    val got = FuzzyJoin.jaroWinklerBestMatch(
        Seq("martha").toDF("nm"), "nm",
        Seq("martha", "marcus").toDF("d"), "d",
        n => substring(n, 1, 1), 0.8)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("martha") == "martha", s"exact dict hit lost: $got")
    // and excludeExact = true restores the self-linkage behavior
    val self = FuzzyJoin.jaroWinklerBestMatch(
        Seq("martha").toDF("nm"), "nm",
        Seq("martha", "marhta").toDF("d"), "d",
        n => substring(n, 1, 1), 0.8, excludeExact = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(self("martha") == "marhta")
  }

  test("editDistanceJoin disambiguates colliding output column names") {
    val t = Seq((1L, "abc"), (2L, "abd")).toDF("id", "key")
    val out = FuzzyJoin.editDistanceJoin(t, "id", "key", t, "id", "key", 1)
    assert(out.columns.toSeq == Seq("id_l", "id_r", "key_l", "key_r", "dist"))
    assert(out.count() > 0) // and the frame is actually usable by name
  }

  test("jaroWinklerBlockedJoin pair generation is posting-list shaped") {
    import org.apache.spark.sql.functions.substring
    val names = Seq("martha", "marhta", "dwayne", "duane").toDF("nm")
    val p = FuzzyJoin.jaroWinklerBlockedJoin(
        names, "nm", n => substring(n, 1, 1), 0.8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"),
      s"blocked candidates must come from posting lists, not a self-join:\n$p")
  }
}
