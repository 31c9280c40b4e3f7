package graft

import graft.api.GFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GFrameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def orders = GFrame(Seq(
    (1L, "F", 100.0, 10L), (2L, "O", 250.0, 10L),
    (3L, "F", 50.0, 11L), (4L, "P", 300.0, 12L)
  ).toDF("key", "status", "price", "cust"))

  test("select / assign / rename / query / astype chain") {
    val got = orders
      .select("key", "status", "price")
      .assign("double_price", col("price") * 2)
      .rename("status" -> "st")
      .query(col("st") === "F")
      .astype("key", "int")
      .toDF.orderBy("key").collect()
    assert(got.length == 2)
    assert(got(0).getInt(0) == 1 && got(0).getDouble(3) == 200.0)
  }

  test("merge + groupby agg dict shape") {
    val cust = GFrame(Seq((10L, "alice"), (11L, "bob")).toDF("cust", "name"))
    val got = orders.merge(cust, Seq("cust"), "inner")
      .groupby("name").agg("price" -> "sum", "key" -> "count")
      .toDF.orderBy("name").collect()
    assert(got(0).getString(0) == "alice" && got(0).getDouble(1) == 350.0)
    assert(got(1).getString(0) == "bob" && got(1).getLong(2) == 1L)
  }

  test("nlargest / valueCounts / dropDuplicatesKeepFirst") {
    assert(orders.nlargest(1, "price").toDF.head().getLong(0) == 4L)
    val vc = orders.valueCounts("status").toDF.collect()
    assert(vc(0).getString(0) == "F" && vc(0).getLong(1) == 2L)
    val kept = orders.dropDuplicatesKeepFirst(Seq("cust"), "key")
      .toDF.select("key").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("melt / pivotTable round shapes") {
    val melted = orders.melt(Seq("key"), Seq("price")).toDF
    assert(melted.columns.toSeq == Seq("key", "variable", "value"))
    assert(melted.count() == 4)
    val pt = orders.pivotTable("cust", "status", "price").toDF
    assert(pt.columns.contains("F") && pt.columns.contains("O"))
  }

  test("fillna / dropna") {
    val withNull = GFrame(Seq((1L, Some(2.0)), (2L, None))
      .toDF("k", "v"))
    assert(withNull.fillna(0.0).toDF.na.drop().count() == 2)
    assert(withNull.dropna().toDF.count() == 1)
  }

  test("cumsum / diff / pctChange / clip window helpers") {
    val ts = GFrame(Seq((1L, 1, 10.0), (1L, 2, 30.0), (1L, 3, 15.0))
      .toDF("u", "i", "v"))
    val got = ts.cumsum("v", Seq("u"), "i")
      .diff("v", Seq("u"), "i")
      .pctChange("v", Seq("u"), "i")
      .toDF.orderBy("i").collect()
    assert(got.map(_.getDouble(3)).toSeq == Seq(10.0, 40.0, 55.0))
    assert(got(1).getDouble(4) == 20.0)              // diff
    assert(got(1).getDouble(5) == 2.0)               // pct_change
    assert(got(0).isNullAt(4) && got(0).isNullAt(5)) // first row has no prev
    val clipped = ts.clip("v", 12.0, 20.0).toDF
      .select("v").as[Double].collect().sorted
    assert(clipped.toSeq == Seq(12.0, 15.0, 20.0))
  }

  test("rolling trailing-frame mean/min/max") {
    val ts = GFrame(Seq((1L, 1, 10.0), (1L, 2, 30.0), (1L, 3, 20.0))
      .toDF("u", "i", "v"))
    val got = ts.rolling("v", 2, Seq("u"), "i").toDF.orderBy("i").collect()
    assert(got.map(_.getDouble(3)).toSeq == Seq(10.0, 20.0, 25.0)) // means
    assert(got(2).getDouble(4) == 20.0 && got(2).getDouble(5) == 30.0)
  }

  test("ewm appends the adjusted weighted mean per group") {
    val ts = GFrame(Seq((1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, 30.0))
      .toDF("u", "i", "v"))
    val got = ts.ewm("v", Seq("u"), "i", alpha = Some(0.5)).toDF
      .orderBy("i").select("v_ewm").as[Double].collect().toSeq
    assert(got(0) == 10.0)
    assert(got(1) == (20.0 + 0.5 * 10.0) / 1.5)
    // adjust=false arm matches the recursive EWMA
    val rec = ts.ewm("v", Seq("u"), "i", adjust = false, span = Some(3.0))
      .toDF.orderBy("i").select("v_ewm").as[Double].collect().toSeq
    assert(rec(0) == 10.0 && rec(1) == 0.5 * 20.0 + 0.5 * 10.0)
  }

  test("str and dt accessor namespaces") {
    import java.sql.Timestamp
    val gf = GFrame(Seq(("  Hello World  ", Timestamp.valueOf("1996-02-29 13:05:00")))
      .toDF("s", "t"))
    val out = gf.str("s").strip().str("s").lower().str("s").contains("World")
      .dt("t").year().dt("t").floor("month")
      .toDF.head()
    assert(out.getAs[String]("s_strip") == "Hello World")
    assert(out.getAs[String]("s_lower") == "  hello world  ")
    assert(out.getAs[Boolean]("s_contains"))
    assert(out.getAs[Int]("t_year") == 1996)
    assert(out.getAs[Timestamp]("t_floor_month") ==
      Timestamp.valueOf("1996-02-01 00:00:00"))
  }

  test("round-3 façade additions: iloc, dt ceil/round/calendar family") {
    import java.sql.Timestamp
    val gf = GFrame(Seq(
        (1L, Timestamp.valueOf("1996-02-29 13:05:40")),
        (2L, Timestamp.valueOf("1997-07-01 00:00:00")),
        (3L, Timestamp.valueOf("1997-07-15 23:59:59")))
      .toDF("id", "t"))
    val sliced = gf.sortValues("id").iloc(1, 3).toDF
      .collect().map(_.getAs[Long]("id"))
    assert(sliced.toSeq == Seq(2L, 3L))
    val out = gf.dt("t").ceil("hour").dt("t").round("hour")
      .dt("t").isLeapYear().dt("t").daysInMonth()
      .dt("t").quarter().dt("t").minute()
      .toDF.orderBy($"id").head()
    assert(out.getAs[Timestamp]("t_ceil_hour") ==
      Timestamp.valueOf("1996-02-29 14:00:00"))
    assert(out.getAs[Timestamp]("t_round_hour") ==
      Timestamp.valueOf("1996-02-29 13:00:00"))
    assert(out.getAs[Boolean]("t_is_leap"))
    assert(out.getAs[Int]("t_days_in_mo") == 29)
    assert(out.getAs[Int]("t_quarter") == 1)
    assert(out.getAs[Int]("t_minute") == 5)
    // exact-boundary ceil stays put
    val mid = gf.dt("t").ceil("hour").toDF.orderBy($"id")
      .collect()(1).getAs[Timestamp]("t_ceil_hour")
    assert(mid == Timestamp.valueOf("1997-07-01 00:00:00"))
    // sub-second rounding must compare in microseconds (a seconds cast
    // would floor 40.7s to 40 and never round up), and quarter needs
    // the 3-month interval translation
    val frac = GFrame(Seq((1L, Timestamp.valueOf("1996-02-29 13:05:40.7")))
      .toDF("id", "t"))
    assert(frac.dt("t").round("second").toDF.head()
      .getAs[Timestamp]("t_round_second") ==
      Timestamp.valueOf("1996-02-29 13:05:41"))
    assert(frac.dt("t").ceil("quarter").toDF.head()
      .getAs[Timestamp]("t_ceil_quarter") ==
      Timestamp.valueOf("1996-04-01 00:00:00"))
  }

  test("groupby transform broadcasts the group aggregate onto rows") {
    val gf = GFrame(Seq(("a", 1.0), ("a", 3.0), ("b", 10.0))
      .toDF("k", "v"))
    val out = gf.groupby("k").transform("v", "avg").toDF
      .orderBy($"k", $"v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("a", 1.0, 2.0), ("a", 3.0, 2.0), ("b", 10.0, 10.0)))
  }

  test("concat unions by name with missing columns") {
    val a = GFrame(Seq((1L, "x")).toDF("k", "s"))
    val b = GFrame(Seq((2L, 5.0)).toDF("k", "v"))
    val got = GFrame.concat(Seq(a, b)).toDF
    assert(got.count() == 2 && got.columns.toSet == Set("k", "s", "v"))
  }

  test("round-2 façade additions: normalizeText, tokenizeIds, tile, str extras") {
    val gf = GFrame(Seq((1L, "The  Quick fox"), (2L, "CAFÉ time"))
      .toDF("id", "text"))
    val norm = gf.normalizeText("text").toDF
      .orderBy("id").collect().map(_.getString(1))
    assert(norm.toSeq == Seq("the quick fox", "cafe time"))
    val ids = gf.normalizeText("text")
      .tokenizeIds("text", Seq("fox", "quick", "the")).toDF
      .orderBy("id").collect().map(_.getSeq[Int](2))
    assert(ids(0) == Seq(2, 1, 0) && ids(1) == Seq(-1, -1))
    assert(gf.tile(2).toDF.count() == 4)
    val s = GFrame(Seq(Tuple1("a-b c")).toDF("s"))
      .str("s").wrap(3)
      .str("s").partition("-")
      .str("s").rpartition("-")
      .str("s").isalpha()
      .toDF.head()
    assert(s.getAs[String]("s_wrap") == "a-b\nc")
    assert(s.getAs[org.apache.spark.sql.Row]("s_partition").getString(0) == "a")
    assert(s.getAs[org.apache.spark.sql.Row]("s_rpartition").getString(2) == "b c")
    assert(!s.getAs[Boolean]("s_isalpha"))
  }

  test("rank methods match pandas semantics on ties") {
    // values 10, 20, 20, 30 → pandas ranks:
    //   min: 1,2,2,4  max: 1,3,3,4  dense: 1,2,2,3  average: 1,2.5,2.5,4
    val gf = GFrame(Seq((1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0))
      .toDF("id", "v"))
    def ranks(m: String): Seq[Double] =
      gf.rank("v", method = m).toDF.orderBy("id").collect()
        .map(r => r.get(2) match {
          case i: Int => i.toDouble
          case l: Long => l.toDouble
          case d: Double => d
        }).toSeq
    assert(ranks("min") == Seq(1, 2, 2, 4))
    assert(ranks("max") == Seq(1, 3, 3, 4))
    assert(ranks("dense") == Seq(1, 2, 2, 3))
    assert(ranks("average") == Seq(1.0, 2.5, 2.5, 4.0))
    val pct = gf.rank("v", method = "average", pct = true).toDF
      .orderBy("id").collect().map(_.getDouble(2)).toSeq
    assert(pct == Seq(0.25, 0.625, 0.625, 1.0))
  }

  test("qcut assigns equal-frequency bins without a global sort") {
    val gf = GFrame((1 to 100).map(i => (i, i.toDouble)).toDF("id", "v"))
    val binned = gf.qcut("v", 4).toDF
    val sizes = binned.groupBy("v_qbin").count()
      .orderBy("v_qbin").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sizes.toSeq == Seq((1, 25L), (2, 25L), (3, 25L), (4, 25L)))
    // no Exchange from a single-partition ntile window: the only wide
    // node allowed is the broadcast of the 1-row cut aggregate
    val p = binned.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"qcut must not use a window:\n$p")
  }

  test("embedding and lm-score facades delegate to the operators") {
    val emb = GFrame(Seq((0L, Array(3.0f, 4.0f)), (1L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding"))
    val unit = emb.normalizeEmbedding("embedding").toDF
      .orderBy("vec_id").collect().map(_.getSeq[Double](2))
    assert(math.abs(unit(0).map(x => x * x).sum - 1.0) < 1e-12)
    val q = emb.quantizeEmbedding("embedding").toDF
    assert(Seq("lo", "scale", "q").forall(q.columns.contains))
    val proj = emb.projectEmbedding("embedding", inDim = 2, outDim = 3).toDF
    assert(proj.select("proj").head.getSeq[Double](0).size == 3)
    val docs = GFrame(Seq((1L, "a b"), (2L, "c d")).toDF("id", "text"))
    val scored = docs.lmScore("id", "text", docs, "text").toDF
    assert(scored.count() == 2 &&
      Seq("oov_rate", "lm_score", "n_bigrams").forall(scored.columns.contains))
  }

  test("round-5 façade additions: knn family, simhash pairs, clusters, " +
      "stem, langId") {
    val emb = GFrame(Seq(
        (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
        (2L, Array(0.0f, 1.0f)), (3L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding"))
    val q = GFrame(emb.toDF.filter($"vec_id" === 0L))
    val top = emb.knn(q, k = 2).toDF.orderBy("rank")
      .collect().map(_.getLong(2))
    assert(top.head == 1L, "nearest neighbor of e0 must be e1")
    assert(emb.knnLsh(q, k = 1, nBits = 2).toDF.columns
      .contains("sim"))
    assert(emb.knnIvf(q, k = 1, nCells = 2, nprobe = 2).toDF
      .count() >= 1)
    val docs = GFrame(Seq(
        (1L, "big fast scan"), (2L, "big fast scan"), (3L, "slow join"))
      .toDF("doc_id", "text"))
    val pairs = docs.simhashPairs("doc_id", "text")
    assert(pairs.toDF.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == Seq((1L, 2L)))
    val clusters = pairs.nearDupClusters().toDF.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.toSeq == Seq((1L, 1L), (2L, 1L)))
    val stems = GFrame(Seq(Tuple1("running")).toDF("w")).str("w").stem()
      .toDF.select("w_stem").head.getString(0)
    assert(stems == "run")
    val lang = GFrame(Seq(Tuple1("the cat and the hat")).toDF("text"))
      .langId("text").toDF.select("lang").head.getString(0)
    assert(lang == "en")
  }

  test("ingest screen facades drop dups and admit novel rows (batch form)") {
    val corpus = GFrame(Seq(
      (0L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"))
    val screen = corpus.nearDupScreen("doc_id", "text", threshold = 0.9)
    val batch = Seq((10L, "alpha beta gamma delta epsilon"),
      (11L, "six seven eight nine ten")).toDF("doc_id", "text")
    assert(screen(batch).select("doc_id").collect().map(_.getLong(0))
      .toSeq == Seq(11L))
    val embCorpus = GFrame(Seq(
        (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding"))
    val eScreen = embCorpus.semanticScreen("vec_id", "embedding",
      threshold = 0.95, nCells = 1)
    val eBatch = Seq((10L, Array(0.99, 0.05)), (11L, Array(-0.7, 0.7)))
      .toDF("vec_id", "embedding")
    assert(eScreen(eBatch).select("vec_id").collect().map(_.getLong(0))
      .toSeq == Seq(11L))
    eScreen.close(); screen.close()
    // an empty corpus has no model to collide with: identity screen
    val emptyScreen = GFrame(Seq.empty[(Long, Array[Double])]
        .toDF("vec_id", "embedding"))
      .semanticScreen("vec_id", "embedding", threshold = 0.9, nCells = 4)
    assert(emptyScreen(eBatch).count() == 2, "empty corpus admits all")
    emptyScreen.close()
    val baskets = GFrame(Seq(
        (1L, "o1"), (2L, "o1"), (2L, "o1"), (3L, "o2"))
      .toDF("item", "basket"))
    assert(baskets.coOccurrencePairs("item", "basket").toDF
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == Seq((1L, 2L)), "duplicate (item, basket) rows count once")
  }

  test("round-6 façade additions: removeBoilerplate, dedupLinesKeepFirst") {
    val docs = GFrame(Seq(
        (0L, "keep me\nsubscribe now"),
        (1L, "subscribe now\nreal content"),
        (2L, "subscribe now")).toDF("doc_id", "text"))
    val cleaned = docs.removeBoilerplate("doc_id", "text", minDocFrac = 0.9)
      .toDF.orderBy("doc_id").collect()
    assert(cleaned.map(_.getString(1)).toSeq ==
      Seq("keep me", "real content", ""))
    val firsts = docs.dedupLinesKeepFirst("doc_id", "text")
      .toDF.orderBy("doc_id").collect()
    assert(firsts.map(_.getString(1)).toSeq ==
      Seq("keep me\nsubscribe now", "real content", ""))
    val dict = GFrame(Seq(Tuple1("merge")).toDF("term"))
    val fixed = GFrame(Seq((1L, "mirge")).toDF("id", "w"))
      .spellCorrect("id", "w", dict, "term").toDF.head
    assert(fixed.getString(2) == "merge")
    val pairs = GFrame(Seq((1L, "scan")).toDF("id1", "w1"))
      .fuzzyJoin("id1", "w1",
        GFrame(Seq((2L, "scans")).toDF("id2", "w2")), "id2", "w2")
      .toDF.count()
    assert(pairs == 1L)
  }

  test("round-7 façade additions: linkage, phonetics, entropy, bloom, bpe") {
    import org.apache.spark.sql.functions.substring
    val names = GFrame(Seq("martha", "marhta", "dwayne").toDF("nm"))
    val linked = names
      .linkRecords("nm", names, "nm", n => substring(n, 1, 1), 0.9)
      .toDF.orderBy("nm").collect()
    assert(linked.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("marhta", "martha"), ("martha", "marhta")))
    val keys = GFrame(Seq(Tuple1("knight")).toDF("term"))
      .phoneticKeys("term").toDF.head
    assert(keys.getString(1) == "K523" && keys.getString(2) == "NT")
    val ent = GFrame(Seq((1L, "abcd")).toDF("id", "text"))
      .charEntropy("id", "text").toDF.head
    assert(math.abs(ent.getDouble(3) - math.log(4)) < 1e-15)
    val corpus = GFrame(Seq("a", "b").toDF("k"))
    val screen = corpus.bloomScreen("k", expectedItems = 100)
    try assert(screen(Seq("a", "z").toDF("k")).count() == 1L)
    finally screen.close()
    val merges = GFrame(Seq((1L, "low low")).toDF("id", "text"))
      .learnBpeMerges("text", 1)
    assert(merges == Seq(("l", "o", 2L)))
  }

  test("round-7 façade additions: dq, cdc, winnow, leak-free split") {
    val snap = GFrame(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))
    val rules = snap.checkRules("v_pos" -> (col("v") > 0)).toDF.head
    assert(rules.getString(0) == "v_pos" && rules.getLong(1) == 0L)
    val prof = snap.profile(Seq("k"), exact = true).toDF.head
    assert(prof.getLong(3) == 2L)
    val orphan = snap.orphanKeys("k",
      GFrame(Seq(Tuple1(1L)).toDF("pk")), "pk").toDF.count()
    assert(orphan == 1L)
    val merged = snap.mergeChanges(
        GFrame(Seq((2L, 21.0, "U"), (3L, 30.0, "I")).toDF("k", "v", "op")),
        "k", "op")
      .toDF.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(merged.toSeq == Seq((1L, 10.0), (2L, 21.0), (3L, 30.0)))
    val fps = GFrame(Seq((1L, "a b c d e f g")).toDF("id", "text"))
      .winnow("id", "text").toDF.count()
    assert(fps > 0)
    val split = GFrame(Seq((1L, "same"), (2L, "same")).toDF("id", "text"))
      .trainTestSplitLeakFree("id", "text", "s",
        Seq("train" -> 0.5, "test" -> 1.0))
      .toDF.select("split").distinct().count()
    assert(split == 1L, "identical docs must share a split")
  }

  test("round-8 façade additions: sketch algebra, containment, resample") {
    // sketch pipeline: per-source sketches -> set ops -> rollup
    val rows = ((1 to 60).map(i => ("a", i)) ++ (41 to 100).map(i => ("b", i)))
      .toDF("src", "v")
    val g = GFrame(rows)
    val est = g.nuniqueApprox("v").toDF.head.getDouble(0)
    assert(est == 100.0, s"below saturation the estimate is exact: $est")
    val sk = g.distinctSketch("v", Seq("src"))
    val ops = GFrame(sk.toDF.groupBy().pivot("src")
        .agg(org.apache.spark.sql.functions.first("v_sketch")))
      .sketchSetOps("a", "b").toDF.head
    assert(ops.getDouble(2) == 100.0 && ops.getDouble(3) == 20.0,
      "union=100, intersect=20 exactly in exact mode")
    val rolled = sk.mergeDistinctSketches("v_sketch", Seq())
    assert(rolled.toDF.head.getDouble(0) == 100.0)
    // containment: doc 1 fully inside doc 2
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val cont = GFrame(docs).containmentPairs("doc_id", "text", 0.99)
      .toDF.head
    assert(cont.getDouble(2) == 1.0 && cont.getDouble(3) == 0.5)
    // resample: hour gap between two points gets forward-filled
    val ts = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 5.0, 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:20:00"), 7.0, 2L))
      .toDF("k", "ts", "v", "tie")
    val rs = GFrame(ts).resampleFfill("k", "ts", "v", "tie", 3600000000L)
      .toDF.orderBy("win_id").collect()
    assert(rs.length == 3, "three hourly buckets spanned")
    assert(rs.map(_.getDouble(3)).toSeq == Seq(5.0, 5.0, 7.0),
      "middle bucket forward-fills")
    assert(rs.map(_.getBoolean(2)).toSeq == Seq(true, false, true))
  }

  test("round-8 façade additions: mannWhitney, bootstrapSample, resizeImages") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3),
      ("b", 4)).toDF("g", "v")
    val r = GFrame(df).mannWhitney("g", "v", "a", "b").toDF.head
    assert(r.getLong(2) == 4L && r.getLong(3) == 14L,
      "doubled U values via the facade match the operator")
    val bs = GFrame((1L to 50L).toDF("id"))
      .bootstrapSample("id", draws = 3, lambda = 0.5, seed = "s").toDF
    assert(bs.columns.contains("draw_idx") && bs.count() > 0)
    val img = Seq((1L,
      graft.operators.MediaCodec.bmpEncode(2, 2, Array.fill(12)(7.toByte)),
      "image/bmp")).toDF("media_id", "payload", "mime")
    val rz = GFrame(img).resizeImages(1, 1).toDF.head
    val (w, h, _) = graft.operators.MediaCodec.bmpDecode(
      rz.getAs[Array[Byte]]("payload"))
    assert(w == 1 && h == 1)
  }

  test("r7 facades: repeatRows, byteCast, token replace/filter, hashVariants") {
    val df = Seq((1L, "the fast cat ran"), (2L, "a dog")).toDF("id", "text")
    val rep = GFrame(df).repeatRows("id").toDF.collect()
    assert(rep.length == 3, "id=1 once, id=2 twice")
    val bc = GFrame(Seq(0x01020304).toDF("v")).byteCast("v").toDF.head
    assert(bc.getAs[Array[Byte]]("v_bytes").toSeq == Seq[Byte](1, 2, 3, 4))
    val repl = GFrame(df)
      .replaceTokens("text", Map("the" -> "a", "fast" -> "quick"))
      .toDF.orderBy("id").collect().map(_.getString(1))
    assert(repl.toSeq == Seq("a quick cat ran", "a dog"))
    val filt = GFrame(df).filterTokens("text", 4).toDF
      .orderBy("id").collect().map(_.getString(1))
    assert(filt.toSeq == Seq("fast", ""))
    val hv = GFrame(Seq("AI").toDF("s")).hashVariants("s").toDF.head
    // reference vectors: xxhash_32("AI", seed 0) and the struct shape
    assert(hv.schema.fieldNames.contains("s_mm128") &&
      hv.schema.fieldNames.contains("s_xx32"))
    assert(hv.getAs[org.apache.spark.sql.Row]("s_mm128").length == 2)
  }

  test("r7 facades: bm25, stripHtml, diversity, oov, diff, quota, curation gates") {
    val docs = Seq((1L, "en", "<p>alpha beta</p> alpha", 20L),
      (2L, "en", "gamma delta", 11L),
      (3L, "fr", "epsilon zeta eta", 16L)).toDF("doc_id", "lang", "text", "n_chars")
    val g = GFrame(docs)
    assert(g.stripHtml("text").toDF.filter($"doc_id" === 1).head
      .getAs[String]("text") == "alpha beta alpha")
    assert(g.bm25("doc_id", "text").toDF.columns.contains("bm25"))
    val div = g.ngramDiversity("lang", "text", 2).toDF
    assert(div.count() == 4) // 2 langs x 2 orders
    val oov = g.oovStats("doc_id", "text", 3).toDF
    assert(oov.count() == 3 && oov.columns.contains("oov_rate"))
    val newer = GFrame(docs.withColumn("text",
      when($"doc_id" === 2, lit("changed!")).otherwise($"text")))
    val diff = g.corpusDiff(newer, "doc_id", "text").toDF.collect()
    assert(diff.map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(2L -> "changed"))
    assert(g.temperatureMixture("lang", "doc_id", 0.5, 100L, "s")
      .toDF.count() == 3) // budget >> corpus: everything kept
    assert(g.curriculumBuckets("n_chars", 2).toDF
      .select("bucket").distinct().count() == 2)
    assert(g.filterTopFracByGroup("lang", "n_chars", 0.5).toDF
      .count() >= 2)
    val z = g.standardizeByGroup("lang", "n_chars").toDF
    assert(z.filter($"doc_id" === 3).head.getAs[Double]("z") == 0.0)
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 2L))
      .toDF("user_id", "ts", "event_id")
    assert(GFrame(ev).quotaPerKeyWindow("user_id", "ts", "1 hour", 1,
      "event_id").toDF.count() == 1)
  }

  test("r14 facades: duplicatedGrams and contaminationGrams") {
    val a = Seq((0L, "xxSHARED-RUN-HERExx padding text aa"),
      (1L, "yySHARED-RUN-HEREyy other words bb")).toDF("doc_id", "text")
    val b = Seq((0L, "zzSHARED-RUN-HEREzz eval side cc")).toDF("doc_id", "text")
    val dup = GFrame(a).duplicatedGrams("doc_id", "text", minWidth = 14)
      .toDF.as[(String, Long)].collect().toMap
    assert(dup.get("SHARED-RUN-HERE".take(14)).contains(2L))
    val cont = GFrame(a).contaminationGrams(GFrame(b), "doc_id", "text",
        minWidth = 14)
      .toDF.as[(String, Long, Long)].collect()
      .map { case (g, x, y) => g -> (x, y) }.toMap
    assert(cont.get("SHARED-RUN-HERE".take(14)).contains((2L, 1L)))
    // single-source-only duplication must NOT appear in contamination
    assert(!cont.keySet.exists(_.contains("padding")))
  }

  test("r7 facades: weighted sampling and weighted percentiles") {
    val d = (0L until 100L).map(i => (i, s"g${i % 2}", i + 1.0)).toDF("id", "g", "w")
    assert(GFrame(d).sampleWeighted("id", "w", 10, "s").toDF.count() == 10)
    val per = GFrame(d).sampleWeightedByGroup("g", "id", "w", 3, "s")
      .toDF.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(per.values.forall(_ == 3) && per.size == 2)
    val wp = GFrame(d).weightedPercentiles("g", "w", "w",
      Seq(("p100", 1L, 1L))).toDF.orderBy("g").collect()
    assert(wp.map(_.getDouble(1)).toSeq == Seq(99.0, 100.0)) // max per group
  }
}
