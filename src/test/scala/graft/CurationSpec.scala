package graft

import graft.operators.{Curation, TextPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = (0L until 400L).map(i => (i, s"g${i % 7}")).toDF("id", "g")

  test("assignSplit labels every row, deterministically, near the cuts") {
    val cuts = Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)
    val a = Curation.assignSplit(docs, "id", "s1", cuts)
    val counts = a.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 400)
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    // hash split is unbiased: 400 rows at 80/10/10 should land within wide bounds
    assert(counts("train") > 280 && counts("train") < 360)
    // deterministic: identical rerun, and disjoint relabel under a new seed
    val b = Curation.assignSplit(docs, "id", "s1", cuts)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val c = Curation.assignSplit(docs, "id", "s2", cuts)
    assert(c.except(a).count() > 0) // some rows moved under the new seed
  }

  test("sampleByGroup returns at most k per group, deterministically") {
    val s = Curation.sampleByGroup(docs, "g", "id", k = 10, seed = "q")
    val per = s.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(per.values.forall(_ == 10)) // every group has >= 10 of 400/7 rows
    val again = Curation.sampleByGroup(docs, "g", "id", k = 10, seed = "q")
    assert(s.except(again).isEmpty && again.except(s).isEmpty)
    // a group smaller than k survives whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    assert(Curation.sampleByGroup(tiny, "g", "id", 10, "q").count() == 3)
  }

  test("mixCorpora keeps ~weight per source and drops unlisted sources") {
    val m = Curation.mixCorpora(docs, "g", "id",
      Map("g0" -> 1.0, "g1" -> 0.5, "g2" -> 0.0), seed = "w")
    val per = m.groupBy("g").count().as[(String, Long)].collect().toMap
    val g0 = docs.filter($"g" === "g0").count()
    assert(per("g0") == g0)                   // weight 1.0 keeps all
    assert(!per.contains("g2"))               // weight 0.0 drops all
    assert(per.keySet.subsetOf(Set("g0", "g1"))) // default weight drops g3..g6
    val g1 = docs.filter($"g" === "g1").count().toDouble
    assert(per("g1") > g1 * 0.25 && per("g1") < g1 * 0.75)
  }

  test("survivorsByScore keeps the max score, lowest id on ties") {
    val d = Seq(
      (1L, "k1", 5.0), (2L, "k1", 9.0), (3L, "k1", 9.0),
      (4L, "k2", 1.0)
    ).toDF("id", "k", "score")
    val got = Curation.survivorsByScore(d, "k", "id", "score")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 4L)) // id 2 beats tie with id 3; k2 keeps its only row
  }

  test("shuffleKey is a stable pseudo-random permutation key") {
    val k1 = Curation.shuffleKey(docs, "id", "e0").select("id", "shuffle_key")
    val k2 = Curation.shuffleKey(docs, "id", "e0").select("id", "shuffle_key")
    assert(k1.except(k2).isEmpty)
    // all keys in [0,1), essentially all distinct
    val keys = k1.select("shuffle_key").as[Double].collect()
    assert(keys.forall(v => v >= 0.0 && v < 1.0))
    assert(keys.distinct.length > 395)
    // a different seed produces a different ordering
    val o1 = k1.orderBy("shuffle_key").select("id").as[Long].collect().toSeq
    val o3 = Curation.shuffleKey(docs, "id", "e1")
      .orderBy("shuffle_key").select("id").as[Long].collect().toSeq
    assert(o1 != o3)
  }

  test("repetitionStats computes Gopher-style duplicate-ngram fractions") {
    val d = Seq(
      (1L, "a b a b a"),  // bigrams: a_b, b_a, a_b, b_a -> 4 total, 2 distinct
      (2L, "x y z"),      // 2 total, 2 distinct
      (3L, "solo")        // < 2 tokens -> zero counts, fractions 0.0
    ).toDF("doc_id", "text")
    val got = TextPipeline.repetitionStats(d, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .select("total_ngrams", "distinct_ngrams", "top_cnt", "dup_frac", "top_frac")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got(0) == ((4L, 2L, 2L, 0.5, 0.5)))
    assert(got(1) == ((2L, 2L, 1L, 0.0, 0.5)))
    assert(got(2) == ((0L, 0L, 0L, 0.0, 0.0)))
  }

  test("leakage-free split keeps duplicate groups together") {
    val docs = (1L to 200L).map { i =>
      // ids 2k and 2k+1 share content: 100 duplicate pairs
      (i, s"content ${i / 2}")
    }.toDF("id", "text")
    val cuts = Seq("train" -> 0.5, "test" -> 1.0)
    val leakFree = Curation.assignSplitLeakFree(docs, "id", "text",
      "s1", cuts).select("id", "text", "split").collect()
    // invariant: same content -> same split, every time
    leakFree.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getString(2)).distinct.length == 1,
        "a duplicate group spanned two splits")
    }
    // the row-level split DOES leak on this corpus (some pair straddles
    // a cut) — proving the group variant isn't vacuously identical
    val rowLevel = Curation.assignSplit(docs, "id", "s1", cuts)
      .select("text", "split").collect()
    val leaked = rowLevel.groupBy(_.getString(0))
      .exists(_._2.map(_.getString(1)).distinct.length > 1)
    assert(leaked, "corpus too small to show the leak; grow it")
    // both splits are populated (sanity)
    assert(leakFree.map(_.getString(2)).distinct.sorted.toSeq ==
      Seq("test", "train"))
  }

  test("assignSplitByGroup labels rows with a NULL group key instead of dropping them") {
    // a plain equality join would silently DELETE the null-group rows —
    // e.g. null-text docs in the digest-grouped leakage-free split
    val docs = Seq((1L, "alpha"), (2L, "alpha"), (3L, null), (4L, null))
      .toDF("id", "grp")
    val out = Curation.assignSplitByGroup(docs, "grp", "id", "s1",
      Seq("train" -> 0.5, "test" -> 1.0)).collect()
    assert(out.length == 4, s"rows lost: ${out.length}")
    val nullSplits = out.filter(_.isNullAt(1)).map(_.getString(2)).distinct
    assert(nullSplits.length == 1,
      "null-group rows must land in ONE split (group atomicity)")
  }

  test("BpeLearn.applyMerge is the greedy non-overlapping scan") {
    import graft.operators.BpeLearn
    val df = Seq("aaa", "abab", "cab", "xy").toDF("w")
      .select(split($"w", "").as("syms"))
    val got = df.select(BpeLearn.applyMerge($"syms", "a", "a"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("aa", "a"), "overlap must not re-merge")
    val got2 = df.select(BpeLearn.applyMerge($"syms", "a", "b"))
      .as[Seq[String]].collect()
    assert(got2(1) == Seq("ab", "ab") && got2(2) == Seq("c", "ab"))
    assert(got2(3) == Seq("x", "y"), "no-op when the pair is absent")
  }

  test("BpeLearn learns frequency-weighted merges with deterministic ties") {
    import graft.operators.BpeLearn
    // corpus: "low" x3, "lower" x1  →  pair counts (l,o)=4, (o,w)=4,
    // (w,e)=1, (e,r)=1; tie on 4 broken lexicographically → (l,o) first,
    // then (lo,w)=4 dominates, then (low,e)=1 ties (e,r) → (e,r) wins
    val corpus = Seq(
      (1L, "low low low lower")
    ).toDF("id", "text")
    val merges = BpeLearn.learnFromCorpus(corpus, "text", numMerges = 3)
    assert(merges == Seq(("l", "o", 4L), ("lo", "w", 4L), ("e", "r", 1L)),
      s"got $merges")
  }

  test("BpeLearn stops early when nothing is left to merge") {
    import graft.operators.BpeLearn
    val corpus = Seq((1L, "ab ab")).toDF("id", "text")
    val merges = BpeLearn.learnFromCorpus(corpus, "text", numMerges = 10)
    // (a,b) merges once; the single-symbol words then have no pairs
    assert(merges == Seq(("a", "b", 2L)))
  }

  test("charEntropy computes Shannon entropy in nats over char histograms") {
    val d = Seq(
      (1L, "aab"),   // p = 2/3, 1/3 → ln3 − (2/3)·ln2
      (2L, "aaaa"),  // single symbol → 0
      (3L, "abcd")   // uniform over 4 → ln4
    ).toDF("doc_id", "text")
    val got = TextPipeline.charEntropy(d, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_chars", "distinct_chars", "entropy")
      .as[(Long, Long, Double)].collect()
    assert(got(0)._1 == 3L && got(0)._2 == 2L)
    assert(math.abs(got(0)._3 - (math.log(3) - 2.0 / 3 * math.log(2))) < 1e-15)
    assert(got(1) == ((4L, 1L, 0.0)))
    assert(math.abs(got(2)._3 - math.log(4)) < 1e-15)
  }

  test("filterOutliersIqr keeps the body and drops Tukey-fence outliers") {
    // sorted values -200,1..9,50: q1 = 2.5, q3 = 7.5, iqr = 5
    // k=1.5 fence [-5, 15] keeps only the body
    val d = ((1 to 9).map(i => (i.toLong, i)) ++
      Seq((100L, 50), (101L, -200))).toDF("id", "v")
    val kept = graft.operators.Curation.filterOutliersIqr(d, "v")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == (1L to 9L))
    // k=12 fence [-57.5, 67.5] re-admits 50, still drops -200
    val wide = graft.operators.Curation.filterOutliersIqr(d, "v", k = 12)
      .select("id").as[Long].collect().sorted
    assert(wide.contains(100L) && !wide.contains(101L))
  }

  test("winsorize clamps to quantiles; mad matches hand computation") {
    val d = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    // p10 = 1.9, p90 = 9.1 (interpolated): ends clamp, middle unchanged
    val w = graft.operators.Curation.winsorize(d, "v", lo = 0.1, hi = 0.9)
      .orderBy("id").select("winsorized").as[Double].collect()
    assert(w.head == 1.9 && w.last == 9.1 && w(4) == 5.0)
    assert(w.length == 10) // row-preserving
    // median of 1..10 = 5.5; |x - 5.5| = 4.5,3.5,...,0.5,0.5,...,4.5 -> mad 2.5
    val m = graft.operators.Curation.mad(d, "v").head
    assert(m.getDouble(0) == 5.5 && m.getDouble(1) == 2.5)
    // a NULL value stays NULL (least/greatest would fabricate the bound)
    val withNull = (Seq((0L, Option.empty[Double])) ++
      (1 to 10).map(i => (i.toLong, Some(i.toDouble)))).toDF("id", "v")
    val nw = graft.operators.Curation.winsorize(withNull, "v")
      .filter($"id" === 0).select("winsorized").head
    assert(nw.isNullAt(0))
  }

  test("sampleWeighted: deterministic, partition-invariant, weight-biased") {
    val d = (0L until 500L)
      .map(i => (i, if (i < 50) 100.0 else 1.0)).toDF("id", "w")
    val a = Curation.sampleWeighted(d, "id", "w", k = 40, seed = "p")
    assert(a.count() == 40)
    // exactly reproducible, and invariant to physical partitioning
    // (the mergeability property that makes partial top-k exact)
    val b = Curation.sampleWeighted(d.repartition(13), "id", "w", 40, "p")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // the 10% of ids carrying 100x weight must dominate the sample
    val heavy = a.filter($"id" < 50).count()
    assert(heavy > 20, s"heavy ids underrepresented: $heavy/40")
    // null / zero / negative weights can never be drawn
    val junk = Seq((1000L, Option.empty[Double]), (1001L, Some(0.0)),
      (1002L, Some(-5.0)), (1003L, Some(1e9))).toDF("id", "w")
    val j = Curation.sampleWeighted(d.union(junk), "id", "w", 40, "p")
    assert(j.filter($"id" >= 1000L && $"id" =!= 1003L).isEmpty)
    assert(j.filter($"id" === 1003L).count() == 1) // huge weight ~always wins
  }

  test("sampleNegatives: k per anchor, never self, partition-invariant") {
    val d = (0L until 97L).map(i => (i, s"d$i")).toDF("id", "payload")
    val negs = Curation.sampleNegatives(d, "id", k = 3, seed = "n")
    val rows = negs.as[(Long, Int, Long)].collect()
    assert(rows.length == 97 * 3)
    assert(rows.forall { case (a, _, b) => a != b }, "self-pair leaked")
    assert(rows.map(_._1).distinct.length == 97)
    // negative ids must all be real corpus ids
    assert(rows.forall { case (_, _, b) => b >= 0 && b < 97 })
    // deterministic and invariant to physical partitioning
    val again = Curation.sampleNegatives(d.repartition(11), "id", 3, "n")
      .as[(Long, Int, Long)].collect()
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    // a different seed re-pairs (some pair must move)
    val other = Curation.sampleNegatives(d, "id", 3, "n2")
      .as[(Long, Int, Long)].collect()
    assert(other.sorted.toSeq != rows.sorted.toSeq)
    // near-uniform usage: over 291 draws from 96 candidates, no id
    // should dominate (loose bound; catches off-by-one mod bias)
    val usage = rows.groupBy(_._3).view.mapValues(_.size).values
    assert(usage.max <= 15, s"skewed negative usage: max ${usage.max}")
  }

  test("sampleWeightedByGroup caps each group at k and respects weights") {
    val d = (0L until 300L).map(i => (i, s"g${i % 3}",
      if (i % 10 == 0) 1000.0 else 1.0)).toDF("id", "g", "w")
    val s = Curation.sampleWeightedByGroup(d, "g", "id", "w", k = 5, seed = "q")
    val per = s.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(per.values.forall(_ == 5) && per.size == 3)
    // per group, the 10 ids carrying 1000x weight should take most slots
    val heavy = s.filter($"id" % 10 === 0).count()
    assert(heavy >= 10, s"heavy ids underrepresented across groups: $heavy/15")
    val again = Curation.sampleWeightedByGroup(
      d.repartition(7), "g", "id", "w", 5, "q")
    assert(s.except(again).isEmpty && again.except(s).isEmpty)
  }

  test("filterTopFracByGroup cuts at each group's own percentile") {
    val d = ((1 to 100).map(i => (i.toLong, "a", i.toDouble)) ++
      (101 to 110).map(i => (i.toLong, "b", 1000.0 + i))).toDF("id", "g", "s")
    val kept = Curation.filterTopFracByGroup(d, "g", "s", 0.2)
    val per = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    // group a: cut = 80th pct of 1..100 = 80.2 → keeps 81..100 (20 rows)
    assert(per("a") == 20, per.toString)
    // group b keeps its own top 20% — NOT wiped out by a's high scores
    assert(per("b") >= 2 && per("b") <= 3, per.toString)
    assert(kept.filter($"g" === "a" && $"s" < 80.0).count() == 0)
  }

  test("standardizeByGroup centers per group; constant groups get z=0") {
    val d = (Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0)) ++
      Seq((4L, "c", 7.0), (5L, "c", 7.0))).toDF("id", "g", "v")
    val z = Curation.standardizeByGroup(d, "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("z")).toMap
    // group a: mean 20, pop std sqrt(200/3)
    val std = math.sqrt(200.0 / 3.0)
    assert(math.abs(z(1L) - (-10.0 / std)) < 1e-12)
    assert(math.abs(z(2L)) < 1e-12)
    assert(math.abs(z(3L) - 10.0 / std) < 1e-12)
    // zero-variance group: z = 0, never NaN/Inf
    assert(z(4L) == 0.0 && z(5L) == 0.0)
  }

  test("interleaveBySource cycles sources; exhausted sources drop out") {
    val d = ((1L to 6L).map((_, "a")) ++ (7L to 8L).map((_, "b")))
      .toDF("id", "src")
    val order = Curation.interleaveBySource(d, "src", "id", "s")
      .collect().map(_.getString(1)).toSeq
    // cycle a,b while b lasts (2 rounds), then a alone
    assert(order == Seq("a", "b", "a", "b", "a", "a", "a", "a"), order)
    // deterministic under repartition (same sequence, same rows)
    val again = Curation.interleaveBySource(d.repartition(5), "src", "id", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val base = Curation.interleaveBySource(d, "src", "id", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(again == base)
  }

  test("quantileNormalizeByGroup ranks within group; edge cases portable") {
    val d = (Seq((1L, "a", 5.0), (2L, "a", 1.0), (3L, "a", 3.0),
      (4L, "a", 3.0), (5L, "b", 42.0))).toDF("id", "g", "v")
    val q = Curation.quantileNormalizeByGroup(d, "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("qnorm"))
      .toMap
    // group a, n=4: ranks 1,2(tie),2(tie),4 → (rank-1)/(n-1)
    assert(q(2L) == 0.0 && q(1L) == 1.0)
    assert(q(3L) == q(4L) && math.abs(q(3L) - 1.0 / 3.0) < 1e-15)
    // single-row group: 0.0, not NaN
    assert(q(5L) == 0.0)
    // null score → null qnorm, EXCLUDED from the denominator: the
    // non-null ranks are unchanged by adding a null row to group a
    val withNull = d.union(
      Seq((6L, "a", Option.empty[Double])).toDF("id", "g", "v"))
    val q2 = Curation.quantileNormalizeByGroup(withNull, "g", "v")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Double]("qnorm"))).toMap
    assert(q2(6L).isEmpty)
    assert(q2(1L).contains(1.0) && q2(2L).contains(0.0))
  }

  test("corpusDiff classifies added/removed/changed by content digest") {
    val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val nw = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("doc_id", "text")
    val got = Curation.corpusDiff(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    val full = Curation.corpusDiff(old, nw, "doc_id", "text",
      includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full(2L) == "unchanged" && full.size == 4)
    // null text present in both versions is UNCHANGED, not "added"
    // (md5(null) = null would misfire the added branch)
    val o2 = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("doc_id", "text")
    val n2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val d2 = Curation.corpusDiff(o2, n2, "doc_id", "text",
      includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2 == Map(1L -> "unchanged", 2L -> "changed"), d2.toString)
  }

  test("decontaminate removes train docs overlapping eval by >= minShared fps") {
    // train doc 1 copies eval doc 10's text (max overlap); train doc 2
    // is disjoint vocabulary
    val evalDf = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val kept = Curation.decontaminate(train, evalDf, "doc_id", "text",
      minShared = 1).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"contaminated doc survived: $kept")
    // a high threshold lets the overlap through
    val lax = Curation.decontaminate(train, evalDf, "doc_id", "text",
      minShared = 100).count()
    assert(lax == 2)
  }

  test("modifiedZByGroup is robust to the outlier it flags") {
    val d = ((1L to 9L).map(i => (i, "a", 10.0)) :+ (10L, "a", 1000.0))
      .toDF("id", "g", "v")
    val z = Curation.modifiedZByGroup(d, "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("mz")).toMap
    // median 10, MAD 0 → all-zero group? No: MAD of 9×0 and 1×990 = 0 →
    // zero-MAD fallback gives 0 — use a group with real spread instead
    val d2 = (Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0),
      (6L, 100.0))).map { case (i, v) => (i, "b", v) }.toDF("id", "g", "v")
    val z2 = Curation.modifiedZByGroup(d2, "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("mz")).toMap
    // median 3.5, MAD = median(2.5,1.5,.5,.5,1.5,96.5) = 1.5
    assert(math.abs(z2(6L) - 0.6745 * 96.5 / 1.5) < 1e-9, z2.toString)
    assert(math.abs(z2(3L) - 0.6745 * -0.5 / 1.5) < 1e-9)
    assert(z2(6L) > 3.5 && math.abs(z2(3L)) < 3.5)
    // the degenerate >50%-identical group maps to 0, never Inf
    assert(z.values.forall(v => !v.isInfinite && !v.isNaN))
  }

  test("per-group stats ops keep null-group rows (null-safe join)") {
    val d = Seq((1L, Some("a"), 10.0), (2L, Some("a"), 20.0),
      (3L, Option.empty[String], 5.0), (4L, Option.empty[String], 6.0))
      .toDF("id", "g", "v")
    assert(Curation.filterTopFracByGroup(d, "g", "v", 1.0).count() == 4)
    assert(Curation.standardizeByGroup(d, "g", "v").count() == 4)
    assert(Curation.temperatureMixture(d, "g", "id", 0.5, 1000L, "s")
      .count() == 4, "budget >> corpus keeps everything incl. null group")
  }

  test("temperatureMixture upsamples small groups and caps rates at 1") {
    // 320 'big' rows vs 80 'small': alpha=0.5 targets shares ∝ sqrt(n),
    // so small keeps a HIGHER fraction of its rows than big
    val d = ((0L until 320L).map(i => (i, "big")) ++
      (320L until 400L).map(i => (i, "small"))).toDF("id", "g")
    val s = Curation.temperatureMixture(d, "g", "id",
      alpha = 0.5, budget = 200, seed = "t1")
    val per = s.groupBy("g").count().as[(String, Long)].collect().toMap
    val fracBig = per.getOrElse("big", 0L).toDouble / 320.0
    val fracSmall = per.getOrElse("small", 0L).toDouble / 80.0
    assert(fracSmall > fracBig,
      s"small should keep a larger fraction: $fracSmall vs $fracBig")
    // expected rates: sqrt(320)=17.89, sqrt(80)=8.94, sum=26.83
    // big: 200*(17.89/26.83)/320 = 0.417; small: 200*(8.94/26.83)/80 = 0.833
    assert(math.abs(fracBig - 0.417) < 0.15 &&
      math.abs(fracSmall - 0.833) < 0.15)
    // a huge budget caps every rate at 1 → everything kept
    val all = Curation.temperatureMixture(d, "g", "id", 0.5, 10000L, "t1")
    assert(all.count() == 400)
    // deterministic under repartition
    val again = Curation.temperatureMixture(
      d.repartition(7), "g", "id", 0.5, 200L, "t1")
    assert(s.except(again).isEmpty && again.except(s).isEmpty)
    // alpha=1 preserves natural proportions: rates equal across groups
    val nat = Curation.temperatureMixture(d, "g", "id", 1.0, 200L, "n1")
    val perN = nat.groupBy("g").count().as[(String, Long)].collect().toMap
    val fb = perN("big") / 320.0; val fs = perN("small") / 80.0
    assert(math.abs(fb - fs) < 0.15, s"alpha=1 skewed: $fb vs $fs")
  }

  test("curriculumBuckets bands by exact percentiles, null-safe") {
    val d = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+
      (101L, Option.empty[Double])).toDF("id", "score")
    val b = Curation.curriculumBuckets(d, "score", 4)
    val rows = b.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(r.fieldIndex("bucket"))) -1
       else r.getInt(r.fieldIndex("bucket")))).toMap
    // exact quartiles of 1..100: q25=25.75, q50=50.5, q75=75.25
    assert(rows(25) == 1 && rows(26) == 2)
    assert(rows(50) == 2 && rows(51) == 3)
    assert(rows(75) == 3 && rows(76) == 4 && rows(100) == 4)
    assert(rows(101) == -1, "null score must get null bucket")
    // ties collapse into one band: constant column → everything bucket 1
    val const = (1L to 50L).map((_, 7.0)).toDF("id", "score")
    val cb = Curation.curriculumBuckets(const, "score", 4)
    assert(cb.select("bucket").distinct().collect().map(_.getInt(0)).toSeq
      == Seq(1))
  }

  test("driftReport: zero drift for an identical copy, ordered planted drift") {
    // ref: uniform 0..99; same: identical distribution; shifted: +50;
    // far: disjoint support. KS/TVD must order same < shifted < far.
    val rows =
      (0L until 200L).map(i => ("ref", i % 100)) ++
        (0L until 200L).map(i => ("same", i % 100)) ++
        (0L until 200L).map(i => ("shifted", i % 100 + 50)) ++
        (0L until 200L).map(i => ("far", i % 100 + 1000))
    val df = rows.toDF("src", "v")
    val rep = Curation.driftReport(df, "src", "v", "ref", binWidth = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rep.keySet == Set("same", "shifted", "far"))
    assert(rep("same") == ((200L, 0.0, 0.0)))
    val (_, ksS, tvdS) = rep("shifted")
    val (_, ksF, tvdF) = rep("far")
    assert(ksS == 0.5 && tvdS == 0.5) // half the mass moved off-support
    assert(ksF == 1.0 && tvdF == 1.0) // disjoint support saturates both
    // null metric rows are excluded, not counted into n_rows
    val withNull = df.union(Seq(("shifted", null.asInstanceOf[java.lang.Long]))
      .toDF("src", "v").select(col("src"), col("v").cast("long")))
    val n2 = Curation.driftReport(withNull, "src", "v", "ref")
      .filter(col("src") === "shifted").select("n_rows").as[Long].head()
    assert(n2 == 200L)
  }

  test("bootstrapSample: deterministic, layout-invariant, per-draw independent") {
    import spark.implicits._
    val df = (1L to 400L).toDF("id")
    val a = Curation.bootstrapSample(df, "id", draws = 4, lambda = 0.5, "s")
      .select("id", "draw_idx", "copy_idx")
      .as[(Long, Int, Int)].collect().sorted.toSeq
    // deterministic across runs and across partition layouts
    val b = Curation.bootstrapSample(df.repartition(7), "id", 4, 0.5, "s")
      .select("id", "draw_idx", "copy_idx")
      .as[(Long, Int, Int)].collect().sorted.toSeq
    assert(a == b)
    // copy_idx distinguishes within-draw copies, so rows are unique keys
    assert(a.distinct.size == a.size)
    // genuine with-replacement: some (row, draw) has multiplicity >= 2
    val perDraw = a.groupBy(t => (t._1, t._2)).view.mapValues(_.size)
    assert(perDraw.values.exists(_ >= 2),
      "Poisson(0.5) over 1600 trials must produce a multiplicity >= 2")
    // ...and multiplicities follow the inverse-CDF: max is small
    assert(perDraw.values.max <= 8)
    // some row is never drawn in some draw (P[m=0] = e^-0.5 ~ 0.61)
    assert(perDraw.size < 1600)
    // expected volume 400*4*0.5 = 800, sd ~28 — wide 5-sd gate
    assert(math.abs(a.size - 800) < 150, s"got ${a.size}")
    // draws are independent trials: draw 0's kept set differs from draw 1's
    val d0 = a.collect { case (id, 0, _) => id }.toSet
    val d1 = a.collect { case (id, 1, _) => id }.toSet
    assert(d0 != d1)
    // per-(row,draw) multiplicity matches a driver-side Poisson inversion
    val cdfs = Curation.poissonCdfs(0.5)
    assert(cdfs.head > 0.60 && cdfs.head < 0.61 && cdfs.last > 1 - 1e-12)
  }
}
