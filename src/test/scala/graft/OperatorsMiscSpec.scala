package graft

import graft.functions.Udfs
import graft.operators.{Reshape, Salting}
import graft.streaming.StatefulOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsMiscSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ProductAgg and GeoMeanAgg via SQL udaf registration") {
    Udfs.register(spark)
    Seq(("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 5.0))
      .toDF("k", "v").createOrReplaceTempView("t")
    val got = spark.sql(
      "SELECT k, product_agg(v) AS p, geomean_agg(v) AS g FROM t GROUP BY k ORDER BY k")
      .collect()
    assert(got(0).getDouble(1) == 24.0)
    assert(math.abs(got(0).getDouble(2) - math.pow(24.0, 1.0 / 3)) < 1e-12)
    assert(got(1).getDouble(1) == 5.0)
  }

  test("saltedJoin matches plain join results") {
    val fact = Seq((1, "x1"), (1, "x2"), (1, "x3"), (2, "y")).toDF("k", "payload")
    val dim = Seq((1, "one"), (2, "two"), (3, "three")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(fact, dim, "k", n = 4)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("oneHot produces indicator columns") {
    val got = Reshape.oneHot(Seq("a", "b", "a").toDF("c"), "c", Seq("a", "b"))
      .agg(sum($"c_a"), sum($"c_b")).head()
    assert(got.getLong(0) == 2L && got.getLong(1) == 1L)
  }

  test("oneHot/crosstab refuse unbounded category domains loudly") {
    val df = Seq(("a", "x")).toDF("c", "d")
    val wide = (0 until Reshape.MaxReshapeWidth + 1).map(_.toString)
    val e1 = intercept[IllegalArgumentException](
      Reshape.oneHot(df, "c", wide))
    assert(e1.getMessage.contains("columns"))
    val e2 = intercept[IllegalArgumentException](
      Reshape.crosstab(df, "c", "d", wide))
    assert(e2.getMessage.contains("columns"))
    // explicit opt-in still works for genuinely bounded wide domains
    assert(Reshape.oneHot(df, "c", Seq("a", "b"), maxWidth = 2)
      .columns.length == 4)
  }

  test("transpose flips a bounded frame") {
    val df = Seq(("r1", 1.0, 2.0), ("r2", 3.0, 4.0)).toDF("id", "m1", "m2")
    val t = Reshape.transpose(df, "id").orderBy("metric").collect()
    assert(t.map(_.getString(0)).toSeq == Seq("m1", "m2"))
    assert(t(0).getDouble(1) == 1.0 && t(0).getDouble(2) == 3.0)
    assert(t(1).getDouble(1) == 2.0 && t(1).getDouble(2) == 4.0)
  }

  test("tfidf matches hand computation (log idf) on a tiny corpus") {
    import graft.operators.TextPipeline
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextPipeline.tfidf(docs, "doc_id", "text", logIdf = true)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // N=2; df(a)=2, df(b)=1, df(c)=1
    assert(got((1L, "a")) == ((2L, 2L, 2.0 * math.log(1.0))))
    assert(got((1L, "b")) == ((1L, 1L, 1.0 * math.log(2.0))))
    assert(got((2L, "c")) == ((1L, 1L, 1.0 * math.log(2.0))))
  }

  test("bm25 matches hand computation on a tiny corpus") {
    import graft.operators.TextPipeline
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    // N=2, dl=(3,2), avgdl=2.5; df(a)=2, df(b)=df(c)=1
    val k1 = 1.2; val b = 0.75
    def sat(tf: Long, dl: Int): Double =
      (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / 2.5)))
    def idfRat(dfT: Long): Double = (2.0 - dfT + 0.5) / (dfT + 0.5)
    val got = TextPipeline.bm25(docs, "doc_id", "text", logIdf = false)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        r.getAs[Double]("bm25")).toMap
    assert(math.abs(got((1L, "a")) - idfRat(2) * sat(2, 3)) < 1e-15)
    assert(math.abs(got((1L, "b")) - idfRat(1) * sat(1, 3)) < 1e-15)
    assert(math.abs(got((2L, "c")) - idfRat(1) * sat(1, 2)) < 1e-15)
    // log variant: ln(1 + rational idf)
    val lg = TextPipeline.bm25(docs, "doc_id", "text", logIdf = true)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        r.getAs[Double]("bm25")).toMap
    assert(math.abs(lg((1L, "b")) - math.log(idfRat(1) + 1.0) * sat(1, 3))
      < 1e-15)
    // rarer term outscores a common one at equal tf and dl
    assert(lg((1L, "b")) > lg((1L, "a")) / 2 && got((1L, "b")) > got((2L, "a")))
  }

  test("chunkDocuments covers every token with the right stride and overlap") {
    import graft.operators.TextPipeline
    val text = (1 to 11).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "x y")).toDF("doc_id", "text")
    val got = TextPipeline.chunkDocuments(docs, "doc_id", "text",
        chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val d1 = got.filter(_._1 == 1L).map(c => (c._3, c._4)).toSeq
    // stride 3: starts 1,4,7,10 → [t1..t4],[t4..t7],[t7..t10],[t10,t11]
    assert(d1 == Seq(("t1 t2 t3 t4", 4), ("t4 t5 t6 t7", 4),
      ("t7 t8 t9 t10", 4), ("t10 t11", 2)), d1.toString)
    // short doc → one chunk
    assert(got.filter(_._1 == 2L).map(_._3).toSeq == Seq("x y"))
    // every token appears in at least one chunk
    val covered = d1.flatMap(_._1.split(" ")).toSet
    assert(covered == (1 to 11).map(i => s"t$i").toSet)
  }

  test("redactPii scrubs emails, ips, and phone runs; leaves text intact") {
    import graft.operators.TextPipeline
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org today"),
      (2L, "server 192.168.001.12 rebooted"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "clean text with digits 42 and 2024 stays")).toDF("doc_id", "text")
    val got = TextPipeline.redactPii(docs, "text")
      .orderBy("doc_id").collect().map(_.getString(2))
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "server <IP> rebooted")
    assert(got(2) == "call <PHONE> now")
    assert(got(3) == "clean text with digits 42 and 2024 stays")
  }

  test("packSequences bins respect the budget with straddle accounting") {
    import graft.operators.TextPipeline
    // one pack group (groups=1), budget 5 tokens; docs of 3,3,3 tokens:
    // tokens_before 0,3,6 → bins 0,0,1 (doc 2 straddles into bin 0)
    val docs = Seq((0L, "a b c"), (1L, "d e f"), (2L, "g h i"))
      .toDF("doc_id", "text")
    val got = TextPipeline.packSequences(docs, "doc_id", "text",
        budgetTokens = 5, groups = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 0L, 0L), (1L, 0L, 3L), (2L, 1L, 6L)))
    // groups partition the corpus: same docs, 3 groups → each alone, bin 0
    val spread = TextPipeline.packSequences(docs, "doc_id", "text",
        budgetTokens = 5, groups = 3)
      .collect().map(r => r.getLong(2)).distinct
    assert(spread.toSeq == Seq(0L))
  }

  test("decodeFeaturesBatched is batch-size invariant and content-keyed") {
    import graft.operators.Multimodal
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val media = Multimodal.ingestFromText(docs, "doc_id", "text")
    def rows(batch: Int) = Multimodal.decodeFeaturesBatched(media, batch)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
      .sortBy(_._1)
    val b1 = rows(1)
    // batch size must not change results — that's the codec contract
    assert(b1.toSeq == rows(64).toSeq)
    assert(b1.forall(_._3.length == 8))
    // identical payloads => identical features; different => different
    assert(b1(0)._3 == b1(1)._3)
    assert(b1(0)._3 != b1(2)._3)
  }

  test("tile repeats the whole table count times") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val t3 = Reshape.tile(df, 3)
    assert(t3.count() == 6)
    assert(t3.groupBy("k").count().orderBy("k")
      .collect().map(_.getLong(1)).toSeq == Seq(3L, 3L))
    assert(Reshape.tile(df, 0).count() == 0)
  }

  test("bertEncode produces padded ids + attention mask per fixture") {
    import spark.implicits._
    val vocab = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "he", "##llo", "hi")
    val df = Seq((1L, "Hello hi zzz"), (2L, "")).toDF("doc_id", "text")
    val got = graft.operators.TextPipeline
      .bertEncode(df, "doc_id", "text", vocab, maxLen = 8)
      .orderBy("doc_id").collect()
    // "Hello hi zzz" → he ##llo hi [UNK] → [CLS] 4 5 6 1 [SEP] + 2×[PAD]
    assert(got(0).getSeq[Int](1) == Seq(2, 4, 5, 6, 1, 3, 0, 0))
    assert(got(0).getSeq[Int](2) == Seq(1, 1, 1, 1, 1, 1, 0, 0))
    // empty text → just [CLS] [SEP] + pads
    assert(got(1).getSeq[Int](1) == Seq(2, 3, 0, 0, 0, 0, 0, 0))
    assert(got(1).getSeq[Int](2) == Seq(1, 1, 0, 0, 0, 0, 0, 0))
    // truncation: body clipped to maxLen−2, mask all ones
    val tr = graft.operators.TextPipeline
      .bertEncode(df.filter($"doc_id" === 1), "doc_id", "text", vocab, 4)
      .head()
    assert(tr.getSeq[Int](1) == Seq(2, 4, 5, 3))
    assert(tr.getSeq[Int](2) == Seq(1, 1, 1, 1))
  }

  test("quotaPerKeyWindow keeps first k per key per window with a deterministic tiebreak") {
    import graft.operators.Throttle
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, t("2024-01-01 00:01:00"), 101L),
      (1L, t("2024-01-01 00:02:00"), 103L),
      (1L, t("2024-01-01 00:02:00"), 102L), // ts tie → event_id breaks it
      (1L, t("2024-01-01 00:03:00"), 104L),
      (1L, t("2024-01-01 01:05:00"), 105L), // next window: quota resets
      (2L, t("2024-01-01 00:30:00"), 201L)
    ).toDF("user_id", "ts", "event_id")
    val got = Throttle.quotaPerKeyWindow(df, "user_id", "ts", "1 hour",
        k = 2, tieBreakCol = "event_id")
      .select($"event_id", $"seq_in_window")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(101L -> 1, 102L -> 2, 105L -> 1, 201L -> 1), got)
  }

  test("quotaStream admits first k per (key, window) across micro-batches") {
    import graft.operators.Throttle
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val grouped = input.toDS()
      .map(r => Throttle.QuotaIn(r._1, r._2, r._3))
      .groupByKey(q => (q.key, q.winStart))
    val out = Throttle.quotaStream(grouped, k = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("quota_out").start()
    try {
      input.addData((1L, 0L, 1L), (1L, 0L, 2L), (1L, 0L, 3L))
      q.processAllAvailable()
      // state persists: a later batch can't refill window (1, 0)
      input.addData((1L, 0L, 4L), (1L, 60L, 5L), (2L, 0L, 6L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, winStart, eventId, seqInWindow FROM quota_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(rows == Set((1L, 0L, 1L, 1L), (1L, 0L, 2L, 2L),
        (1L, 60L, 5L, 1L), (2L, 0L, 6L, 1L)), rows)
    } finally q.stop()
  }

  test("quotaPerKeyHoppingWindow admits per overlapping window independently") {
    import graft.operators.Throttle
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // 1 h window sliding 30 min; events at :00, :10, :40, :50.
    // Window [−30,:30): sees :00,:10 → both admitted (k=2).
    // Window [:00,1:00): sees all four → :00,:10 admitted, :40,:50 cut.
    // Window [:30,1:30): sees :40,:50 → both admitted.
    val df = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L),
      (1L, t("2024-01-01 00:10:00"), 2L),
      (1L, t("2024-01-01 00:40:00"), 3L),
      (1L, t("2024-01-01 00:50:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val got = Throttle.quotaPerKeyHoppingWindow(df, "user_id", "ts",
        "1 hour", "30 minutes", k = 2, tieBreakCol = "event_id")
      .select($"win_start", $"event_id", $"seq_in_window")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val h = 3600000000L
    val base = df.select(unix_micros(min($"ts"))).head.getLong(0)
    assert(got == Set(
      (base - h / 2, 1L, 1), (base - h / 2, 2L, 2),
      (base, 1L, 1), (base, 2L, 2),
      (base + h / 2, 3L, 1), (base + h / 2, 4L, 2)), got)
  }

  test("quotaStream handles hopping windows via per-window feed expansion") {
    import graft.operators.Throttle
    implicit val sqlCtx = spark.sqlContext
    // event → one QuotaIn per containing window (D = 2·S): event e at
    // slide-bucket b feeds winStarts b and b−1
    val input = MemoryStream[(Long, Long, Long)]
    val grouped = input.toDS()
      .flatMap(r => Seq(Throttle.QuotaIn(r._1, r._2, r._3),
        Throttle.QuotaIn(r._1, r._2 - 1, r._3)))
      .groupByKey(q => (q.key, q.winStart))
    val out = Throttle.quotaStream(grouped, k = 1)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("quota_hop_out").start()
    try {
      input.addData((1L, 5L, 10L))
      q.processAllAvailable()
      input.addData((1L, 5L, 11L), (1L, 6L, 12L))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, winStart, eventId FROM quota_hop_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      // window 4: ev10 first; window 5: ev10 first (11,12 cut);
      // window 6: ev12 first
      assert(rows == Set((1L, 4L, 10L), (1L, 5L, 10L), (1L, 6L, 12L)),
        rows)
    } finally q.stop()
  }

  test("twap weights values by time-to-next within bucket") {
    import graft.operators.Resample
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // bucket 0 (same hour): 10.0 held 60 s, 20.0 held 120 s, 30.0 last
      (1L, t("2024-01-01 00:00:00"), 10.0, 1L),
      (1L, t("2024-01-01 00:01:00"), 20.0, 2L),
      (1L, t("2024-01-01 00:03:00"), 30.0, 3L),
      // next hour: single event → NULL twap
      (1L, t("2024-01-01 01:30:00"), 99.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val got = Resample.twap(ev, "user_id", "ts", "value", "event_id",
        bucketMicros = 3600000000L)
      .orderBy("bucket").collect()
    val twap0 = got(0).getAs[Double]("twap")
    assert(math.abs(twap0 - (10.0 * 60 + 20.0 * 120) / 180.0) < 1e-12)
    assert(got(1).isNullAt(got(1).fieldIndex("twap")))
    // a null-valued observation is excluded up front: its time window
    // attributes to the PREVIOUS value instead of diluting the average
    val withNull = ev.union(Seq(
      (1L, t("2024-01-01 00:02:00"), Option.empty[Double], 9L))
      .toDF("user_id", "ts", "value", "event_id"))
    val t0 = Resample.twap(withNull, "user_id", "ts", "value", "event_id",
        bucketMicros = 3600000000L)
      .orderBy("bucket").head.getAs[Double]("twap")
    assert(t0 == twap0, s"null observation changed twap: $t0 vs $twap0")
  }

  test("missingBuckets reports in-span days with no events") {
    import graft.operators.Resample
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 12:00:00")), (1L, t("2024-01-04 12:00:00")),
      (2L, t("2024-01-02 00:00:00"))
    ).toDF("user_id", "ts")
    val got = Resample.missingBuckets(ev, "user_id", "ts", 86400000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // user 1 active days 1 and 4 → days 2, 3 missing; user 2 spans one day
    val d0 = ev.selectExpr("unix_micros(ts) div 86400000000")
      .orderBy("ts").head.getLong(0)
    assert(got == Set((1L, d0 + 1), (1L, d0 + 2)), got)
  }

  test("ngramDiversity counts totals and distincts per group and order") {
    import graft.operators.TextPipeline
    val docs = Seq(("en", "a b a b"), ("en", "a b c")).toDF("lang", "text")
    val got = TextPipeline.ngramDiversity(docs, "lang", "text", maxN = 3)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    // n=1: a,b,a,b + a,b,c → 7 total, {a,b,c} distinct
    assert(got(1) == ((7L, 3L)))
    // n=2: {ab,ba,ab} + {ab,bc} → 5 total, {ab,ba,bc} distinct
    assert(got(2) == ((5L, 3L)))
    // n=3: {aba,bab} + {abc} → 3 total, all distinct
    assert(got(3) == ((3L, 3L)))
  }

  test("oovStats measures corpus-vocab coverage per doc") {
    import graft.operators.TextPipeline
    val docs = Seq((1L, "a a b"), (2L, "b c d")).toDF("doc_id", "text")
    // counts: a=2 b=2 c=1 d=1 → top-2 by (count desc, token) = {a, b}
    val got = TextPipeline.oovStats(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 0L, 0.0)))
    assert(got(2L) == ((3L, 2L, 2.0 / 3.0)))
  }

  test("stateful runningAgg accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val grouped = input.toDS().groupByKey(_._1)
    val out = StatefulOps.runningAgg(grouped)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("state_out").start()
    try {
      input.addData(("k1", 1.0), ("k1", 2.0), ("k2", 10.0))
      q.processAllAvailable()
      input.addData(("k1", 4.0))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT key, max(count) AS c, max(sum) AS s
          |FROM state_out GROUP BY key ORDER BY key""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("k1", 3L, 7.0), ("k2", 1L, 10.0)))
    } finally q.stop()
  }

  test("pageRank: analytic fixed points, mass conservation, determinism") {
    import spark.implicits._
    import graft.operators.LinkAnalysis
    // 2-cycle: uniform 0.5 is stationary at ANY damping — exact after
    // every iteration (up to the 2^-45 quantization)
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val rc = LinkAnalysis.pageRank(cyc, "s", "d", 0.85, iters = 3)
      .orderBy("id").collect().map(_.getDouble(1))
    assert(rc.forall(r => math.abs(r - 0.5) < 1e-12), rc.toSeq.toString)
    // A→B with B dangling: closed form rA = 0.075/0.21375, rB = 1-rA
    val dang = Seq((1L, 2L)).toDF("s", "d")
    val rd = LinkAnalysis.pageRank(dang, "s", "d", 0.85, iters = 40)
      .orderBy("id").collect().map(_.getDouble(1))
    val rA = 0.075 / 0.21375
    assert(math.abs(rd(0) - rA) < 2e-3 && math.abs(rd(1) - (1 - rA)) < 2e-3,
      rd.toSeq.toString)
    // mass conservation: sum of ranks stays 1 even with dangling nodes
    assert(math.abs(rd.sum - 1.0) < 1e-9)
    // determinism across physical partitionings (the fixed-point-sum
    // contract, exact mode): star + chain, 13-way repartition must be
    // bit-equal
    val g = ((1L to 30L).map(i => (i, 0L)) ++ Seq((0L, 31L), (31L, 32L)))
      .toDF("s", "d")
    val a = LinkAnalysis.pageRank(g, "s", "d", iters = 6, exact = true)
      .orderBy("id").collect().toSeq
    val b = LinkAnalysis.pageRank(g.repartition(13), "s", "d", iters = 6,
        exact = true)
      .orderBy("id").collect().toSeq
    assert(a == b)
    // production mode (plain double sums) agrees with exact mode to
    // well under any rank gap — the ordering-stability argument for
    // exact = false being the default
    val p = LinkAnalysis.pageRank(g, "s", "d", iters = 6)
      .orderBy("id").collect().toSeq
    assert(p.size == a.size)
    a.zip(p).foreach { case (x, y) =>
      assert(math.abs(x.getDouble(1) - y.getDouble(1)) < 1e-9)
    }
    // the hub (in-degree 30) must outrank every leaf
    val ranks = a.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(0L) > ranks(1L) * 10)
  }

  test("contingency: exact zero residuals iff independent") {
    import spark.implicits._
    import graft.operators.Stats
    // independent 2x2: margins (30, 10) x (20, 20) over n = 40
    val ind = (Seq.fill(15)(("x", "p")) ++ Seq.fill(15)(("x", "q")) ++
      Seq.fill(5)(("y", "p")) ++ Seq.fill(5)(("y", "q"))).toDF("a", "b")
    val ri = Stats.contingency(ind, "a", "b").collect()
    assert(ri.length == 4 && ri.forall(r =>
      r.getDecimal(7).longValueExact() == 0L))
    // dependent: diagonal-heavy
    val dep = (Seq.fill(20)(("x", "p")) ++ Seq.fill(20)(("y", "q")) ++
      Seq.fill(2)(("x", "q"))).toDF("a", "b")
    val rd = Stats.contingency(dep, "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDecimal(7).longValueExact()).toMap
    assert(rd(("x", "p")) > 0 && rd(("y", "q")) > 0 && rd(("x", "q")) < 0)
    // e_num = r*c and the table sums to n per margin
    val n = Stats.contingency(dep, "a", "b")
      .select(sum($"o")).as[Long].head()
    assert(n == 42L)
  }

  test("mannWhitney: hand-computed U, tie correction, z; invariant holds") {
    import spark.implicits._
    import graft.operators.Stats
    // A = {1,2,3}, B = {2,3,4}: U_A = 2, U_B = 7 (ties at 2 and 3
    // contribute a half each), tie term = 2*(2^3-2) = 12
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3),
      ("b", 4)).toDF("g", "v")
    val r = Stats.mannWhitney(df, "g", "v", "a", "b").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 14L) // doubled U
    assert(r.getLong(4) == 12L)
    // z from the exact integers: (4-9) / (2*sqrt(9*(7 - 12/30)/12))
    assert(math.abs(r.getDouble(5) - (-5.0 / (2.0 * math.sqrt(4.95)))) < 1e-12)
    // u2_a + u2_b = 2 * n_a * n_b on arbitrary data
    val big = (1 to 200).map(i => (if (i % 3 == 0) "a" else "b", i % 17))
      .toDF("g", "v")
    val rb = Stats.mannWhitney(big, "g", "v", "a", "b").collect().head
    assert(rb.getLong(2) + rb.getLong(3) == 2 * rb.getLong(0) * rb.getLong(1))
    // rows outside the two labels and null values are ignored
    val noisy = df.union(Seq(("c", 9), ("a", 100)).toDF("g", "v"))
      .union(Seq(("a", null.asInstanceOf[Integer])).toDF("g", "v"))
    val rn = Stats.mannWhitney(noisy, "g", "v", "a", "b").collect().head
    assert(rn.getLong(0) == 4L && rn.getLong(1) == 3L)
  }

  test("winsorize: type-1 cuts, clamping, pass-through inside the cuts") {
    import spark.implicits._
    import graft.operators.Stats
    // 20 values 1..20 in one group: p05 cut = smallest v with cum*20
    // >= tot (= 1), p95 cut = smallest v with cum*20 >= 19*tot (= 19)
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("k", "v")
    val w = Stats.winsorize(df, "k", "v", 1L, 20L, 19L, 20L)
    val rows = w.select($"v", $"lo_cut", $"hi_cut", $"v_w").collect()
    assert(rows.forall(r => r.getDouble(1) == 1.0 && r.getDouble(2) == 19.0))
    assert(rows.forall { r =>
      val (v, cl) = (r.getDouble(0), r.getDouble(3))
      cl == math.min(math.max(v, 1.0), 19.0)
    })
    // only the value above hi_cut is altered here
    assert(rows.count(r => r.getDouble(0) != r.getDouble(3)) == 1)
    // tighter cuts on a skewed two-group frame: cuts are PER GROUP and
    // every clamped value lies inside [lo_cut, hi_cut]
    val sk = ((1 to 99).map(i => ("a", 1.0)) ++ Seq(("a", 1000.0)) ++
      (1 to 50).map(i => ("b", i.toDouble))).toDF("k", "v")
    val ws = Stats.winsorize(sk, "k", "v", 1L, 4L, 3L, 4L)
      .select($"k", $"lo_cut", $"hi_cut", $"v_w").collect()
    assert(ws.forall(r =>
      r.getDouble(3) >= r.getDouble(1) && r.getDouble(3) <= r.getDouble(2)))
    val aCut = ws.filter(_.getString(0) == "a").head
    assert(aCut.getDouble(1) == 1.0 && aCut.getDouble(2) == 1.0)
    val bCut = ws.filter(_.getString(0) == "b").head
    assert(bCut.getDouble(1) == 13.0 && bCut.getDouble(2) == 38.0)
    // a NULL value stays NULL (least/greatest skip nulls; unguarded the
    // clamp would fabricate lo_cut for a missing datum) and does NOT
    // shift the cuts (cut selection already excludes NULLs)
    val wn = ((1 to 20).map(i => ("g", Some(i.toDouble))) :+
      ("g", Option.empty[Double])).toDF("k", "v")
    val nr = Stats.winsorize(wn, "k", "v", 1L, 20L, 19L, 20L)
      .select($"v", $"lo_cut", $"hi_cut", $"v_w").collect()
    val nullRow = nr.filter(_.isNullAt(0)).head
    assert(nullRow.isNullAt(3))
    assert(nullRow.getDouble(1) == 1.0 && nullRow.getDouble(2) == 19.0)
    assert(nr.filter(!_.isNullAt(0)).forall(r =>
      r.getDouble(3) == math.min(math.max(r.getDouble(0), 1.0), 19.0)))
  }

  test("mannWhitney matches the classical rank-sum formulation on random data") {
    import spark.implicits._
    import graft.operators.Stats
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val data = Seq.fill(120)(
        (if (rnd.nextBoolean()) "a" else "b", rnd.nextInt(12)))
      val df = data.toDF("g", "v")
      val r = Stats.mannWhitney(df, "g", "v", "a", "b").collect().head
      // brute force via mid-ranks: 2·rank(v) = 2·|{u < v}| + |{u = v}| + 1;
      // U_a = R_a − n_a(n_a+1)/2, doubled to stay integral under .5 ranks
      val all = data.map(_._2)
      def below(v: Int) = all.count(_ < v).toLong
      def eq(v: Int) = all.count(_ == v).toLong
      val as = data.filter(_._1 == "a").map(_._2)
      val na = as.size.toLong
      val twoRa = as.map(v => 2 * below(v) + eq(v) + 1).sum
      val u2a = twoRa - na * (na + 1)
      assert(r.getLong(0) == na)
      assert(r.getLong(2) == u2a, s"count-based U != rank-sum U")
    }
  }

  test("fixed-point HALF_EVEN rounding (bround) ties to the even digit") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // cudf round.hpp HALF_EVEN on DECIMAL: .5 ties round to even
    val rows = Seq("0.25", "0.35", "-0.25", "2.5", "3.5", "0.26")
      .toDF("s")
      .select(bround(col("s").cast(DecimalType(10, 2)), 1).cast("string")
        .as("r1"), bround(col("s").cast(DecimalType(10, 2)), 0)
        .cast("string").as("r0"))
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("0.2", "0.4", "-0.2", "2.5", "3.5", "0.3"))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("0", "0", "0", "2", "4", "0"))
  }

  test("bfsLevels: chain distances, cycle termination, maxLevels bound") {
    import spark.implicits._
    import graft.operators.LinkAnalysis
    // chain 0→1→2→3 plus a back-edge 3→0 (cycle) and an island 9→10
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (9L, 10L))
      .toDF("s", "d")
    val lv = LinkAnalysis.bfsLevels(g, "s", "d", 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L)) // island absent
    // maxLevels truncates the frontier expansion
    val lv2 = LinkAnalysis.bfsLevels(g, "s", "d", 0L, maxLevels = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv2 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    // shortest path wins when a longer route exists: 0→5 direct + 0→1→5
    val g2 = Seq((0L, 1L), (1L, 5L), (0L, 5L)).toDF("s", "d")
    val lv3 = LinkAnalysis.bfsLevels(g2, "s", "d", 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv3(5L) == 1L)
  }

  test("associationRules: exact support/confidence/lift on planted baskets") {
    import spark.implicits._
    import graft.operators.MarketBasket
    // 4 baskets; duplicate presence rows must not inflate counts
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y"))
    val df = rows.toDF("b", "item")
    val r = MarketBasket.associationRules(df, Seq("b"), "item")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r.keySet == Set(("x", "y"), ("x", "z")))
    val xy = r(("x", "y"))
    assert(xy.getLong(2) == 4 && xy.getLong(3) == 3 && xy.getLong(4) == 3 &&
      xy.getLong(5) == 2)
    assert(xy.getDouble(6) == 0.5 && xy.getDouble(7) == 2.0 / 3.0 &&
      xy.getDouble(8) == 2.0 / 3.0 && xy.getDouble(9) == 8.0 / 9.0)
    assert(r(("x", "z")).getDouble(9) == 4.0 / 3.0)
    // absolute-count threshold drops the singleton pair; null items ignored
    val r2 = MarketBasket.associationRules(
      df.union(Seq((5L, null.asInstanceOf[String])).toDF("b", "item")),
      Seq("b"), "item", minCount = 2)
      .collect()
    assert(r2.length == 1 && r2.head.getString(0) == "x" &&
      r2.head.getString(1) == "y" && r2.head.getLong(2) == 4)
  }

  test("triangleStats: analytic counts on K4, paths, and a closed star") {
    import spark.implicits._
    import graft.operators.LinkAnalysis
    def stats(edges: Seq[(Long, Long)]) =
      LinkAnalysis.triangleStats(edges.toDF("s", "d"), "s", "d")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    // K4: every node degree 3, in 3 triangles, clustering 1.0 —
    // duplicate/reversed/self-loop inputs must canonicalize away
    val k4 = for {
      i <- 0L to 3L; j <- 0L to 3L if i != j
    } yield (i, j)
    val s4 = stats(k4 ++ Seq((1L, 1L), (2L, 3L)))
    assert(s4.size == 4 && s4.values.forall(_ == ((3L, 3L, 1.0))))
    // path 0-1-2: no triangles; endpoints have degree 1 → NULL clustering
    val sp = stats(Seq((0L, 1L), (1L, 2L)))
    assert(sp(1L) == ((2L, 0L, 0.0)))
    assert(sp(0L)._2 == 0L && sp(0L)._3.isNaN)
    // star 0-{1..5} + one closing edge 1-2: exactly one triangle,
    // hub clustering = 2/(6*5), leaf 1 clustering = 2/(2*1) = 1
    val st = stats((1L to 5L).map(i => (0L, i)) ++ Seq((1L, 2L)))
    assert(st(0L) == ((5L, 1L, 2.0 / 20.0)))
    assert(st(1L) == ((2L, 1L, 1.0)) && st(3L)._2 == 0L)
    // orientation invariance: physical partitioning can't change counts
    val rep = LinkAnalysis.triangleStats(
      k4.toDF("s", "d").repartition(7), "s", "d")
      .orderBy("id").collect().toSeq
    assert(rep.map(_.getLong(2)).toSet == Set(3L))
  }

  test("bandJoin matches brute-force |l-r| < width incl. negatives, " +
    "bucket edges, and key preconditions") {
    import graft.operators.IntervalJoin
    val rnd = new scala.util.Random(31)
    // values straddle 0 and land ON bucket edges (multiples of width)
    val width = 2.5
    def vals(n: Int, seed: Int) = (0 until n).map { i =>
      val v = if (i % 5 == 0) (i % 7 - 3) * width // exact edge
              else rnd.nextDouble() * 40 - 20
      (i.toLong, i % 2, v)
    }
    val l = vals(60, 1)
    val r = vals(45, 2)
    val brute = (for {
      (li, lk, lv) <- l; (ri, rk, rv) <- r
      if lk == rk && rv > lv - width && rv < lv + width
    } yield (li, ri)).toSet
    val got = IntervalJoin.bandJoin(
        l.toDF("l_id", "k", "lv"), "lv",
        r.toDF("r_id", "k", "rv"), "rv", width, keyCols = Seq("k"))
      .select("l_id", "r_id").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == brute,
      s"missing=${(brute -- got.toSet).take(3)} extra=${(got.toSet -- brute).take(3)}")
    // keyless variant
    val bruteAll = (for {
      (li, _, lv) <- l; (ri, _, rv) <- r
      if rv > lv - width && rv < lv + width
    } yield (li, ri)).toSet
    val gotAll = IntervalJoin.bandJoin(
        l.toDF("l_id", "k1", "lv"), "lv",
        r.toDF("r_id", "k2", "rv"), "rv", width)
      .select("l_id", "r_id").as[(Long, Long)].collect()
    assert(gotAll.length == gotAll.toSet.size && gotAll.toSet == bruteAll)
  }
}
