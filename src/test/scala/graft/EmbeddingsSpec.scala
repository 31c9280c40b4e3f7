package graft

import graft.operators.{Embeddings, Similarity, TextPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(3.0f, 4.0f, 0.0f)),
    (1L, Array(0.0f, 0.0f, 0.0f)),     // zero vector
    (2L, Array(-1.0f, 2.0f, -2.0f)),
    (3L, Array(5.0f, 5.0f, 5.0f))      // constant vector
  ).toDF("vec_id", "embedding")

  test("l2Normalize yields unit vectors; zero vector passes through") {
    val got = vecs
      .select($"vec_id", Embeddings.l2Normalize($"embedding").as("u"))
      .withColumn("n", Similarity.l2norm($"u"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getDouble(2)))
      .toMap
    assert(math.abs(got(0L)._2 - 1.0) < 1e-12)
    // x * (1/norm), not x / norm — one ulp apart on some elements
    got(0L)._1.zip(Seq(0.6, 0.8, 0.0)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-15)
    }
    assert(got(1L)._1 == Seq(0.0, 0.0, 0.0)) // not NaN
    assert(math.abs(got(2L)._2 - 1.0) < 1e-12)
  }

  test("quantizeU8 codes are 0..255; dequantize error <= scale/2; constant vec -> zeros") {
    val q = Embeddings.quantizeU8(vecs, "embedding")
      .withColumn("back", Embeddings.dequantizeU8($"q", $"lo", $"scale"))
    val rows = q.select($"vec_id", $"embedding", $"q", $"back", $"scale")
      .collect()
    rows.foreach { r =>
      val orig = r.getSeq[Float](1).map(_.toDouble)
      val codes = r.getSeq[Int](2)
      val back = r.getSeq[Double](3)
      val scale = r.getDouble(4)
      assert(codes.forall(c => c >= 0 && c <= 255))
      orig.zip(back).foreach { case (x, y) =>
        assert(math.abs(x - y) <= scale / 2 + 1e-12,
          s"vec ${r.getLong(0)}: $x vs $y at scale $scale")
      }
    }
    val const = rows.find(_.getLong(0) == 3L).get
    assert(const.getSeq[Int](2).forall(_ == 0))
    assert(const.getDouble(4) == 0.0)
  }

  test("quantizeU8 maps min->0 and max->255") {
    val r = Embeddings.quantizeU8(
        Seq((0L, Array(1.0f, 3.0f, 2.0f))).toDF("vec_id", "embedding"),
        "embedding")
      .select($"q").head.getSeq[Int](0)
    assert(r == Seq(0, 255, 127))
  }

  test("randomProject is deterministic, seed-sensitive, and linear") {
    val a = Array.tabulate(8)(i => (i + 1).toFloat)
    val df = Seq((0L, a), (1L, a.map(_ * 2))).toDF("vec_id", "embedding")
    val p = df.select($"vec_id",
        Embeddings.randomProject($"embedding", 8, 4, "s1").as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // same input, same seed -> identical on re-evaluation
    val p2 = df.filter($"vec_id" === 0)
      .select(Embeddings.randomProject($"embedding", 8, 4, "s1"))
      .head.getSeq[Double](0)
    assert(p(0L) == p2)
    // projection is linear: P(2v) = 2 P(v) exactly (doubling is exact in fp)
    assert(p(1L) == p(0L).map(_ * 2))
    // a different seed gives a different matrix
    val other = df.filter($"vec_id" === 0)
      .select(Embeddings.randomProject($"embedding", 8, 4, "s2"))
      .head.getSeq[Double](0)
    assert(other != p(0L))
    // sign matrix is ±1 only, correct shape
    val m = Embeddings.signMatrix(8, 4, "s1")
    assert(m.size == 4 && m.forall(_.size == 8))
    assert(m.flatten.forall(v => v == 1.0 || v == -1.0))
  }

  test("semanticDedupPairs finds planted near-dups with exact precision") {
    val rng = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(rng.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    val base = (0 until 40).map(i => (i.toLong, unit()))
    // plant 5 near-dups: tiny perturbations of existing vectors
    val dups = (0 until 5).map { i =>
      val src = base(i)._2
      (100L + i, src.map(x => x + (rng.nextGaussian() * 0.01).toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val exact = Similarity
      .cosineNearDupPairsExact(df, "vec_id", "embedding", threshold = 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val sem = Similarity
      .semanticDedupPairs(df, "vec_id", "embedding", threshold = 0.95,
        nCells = 4, iters = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 5)
    // precision 1.0 by construction (exact verify)
    assert(sem.subsetOf(exact))
    // near-identical vectors land in the same k-means cell: full recall here
    assert(sem == exact)
  }

  test("semanticExemplars picks the max-sim member per cell with the cell size") {
    // single cell: centroid = (fixed-point) mean of all three vectors,
    // direction ~(1,1) — c is the member most aligned with it
    val df = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)),
      (3L, Array(0.7, 0.7))).toDF("vec_id", "embedding")
    val one = Similarity
      .semanticExemplars(df, "vec_id", "embedding", nCells = 1)
      .select($"exemplar_id", $"n_members").as[(Long, Long)].collect()
    assert(one.toSeq == Seq((3L, 3L)))
    // population conservation at nCells > 1 on a bigger frame
    val rng = new scala.util.Random(11)
    val big = (0 until 50).map { i =>
      (i.toLong, Array.fill(8)(rng.nextGaussian()))
    }.toDF("vec_id", "embedding")
    val ex = Similarity
      .semanticExemplars(big, "vec_id", "embedding", nCells = 4)
      .select($"cell_id", $"n_members").as[(Long, Long)].collect()
    assert(ex.map(_._2).sum == 50L, "every row must land in exactly one cell")
    assert(ex.map(_._1).distinct.length == ex.length, "one row per cell")
    // a zero-norm vector's cosine is NaN; it must neither win the
    // exemplar race (NaN-greatest sort) nor count as a member
    val withZero = Seq((1L, Array(0.0, 0.0)), (2L, Array(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val z = Similarity
      .semanticExemplars(withZero, "vec_id", "embedding", nCells = 1)
      .select($"exemplar_id", $"n_members").as[(Long, Long)].collect()
    assert(z.toSeq == Seq((2L, 1L)),
      s"zero vector must be excluded, got ${z.toSeq}")
  }

  test("autoLshBits / autoCells: integer thresholds, floors, caps") {
    import graft.operators.Similarity.{autoCells, autoLshBits}
    // floor: tiny corpora stay at minBits
    assert(autoLshBits(0) == 4 && autoLshBits(200) == 4)
    // exact boundary is INCLUSIVE (n <= 125*2^b): 2000 stays at 4,
    // 2001 moves to 5 — no float-rounding ambiguity possible
    assert(autoLshBits(2000) == 4 && autoLshBits(2001) == 5)
    assert(autoLshBits(4000) == 5 && autoLshBits(4001) == 6)
    // the 25x envelope corpus (50k) lands at 9: 125*2^9 = 64000
    assert(autoLshBits(50000) == 9)
    // cap: never exceeds maxBits regardless of n
    assert(autoLshBits(Long.MaxValue / 4) == 12)
    // occupancy invariant across four decades: n / 2^bits <= 125
    for (n <- Seq(1000L, 10000L, 100000L, 1000000L, 100000000L)) {
      val b = autoLshBits(n)
      assert(b == 12 || n <= (125L << b), s"occupancy broken at n=$n")
    }
    // cells: floor 8, ~250 per cell, cap 65536
    assert(autoCells(0) == 8 && autoCells(2000) == 8)
    assert(autoCells(2001) == 9 && autoCells(50000) == 200)
    assert(autoCells(Long.MaxValue / 4) == 65536)
    // SQL-twin parity spot check: DuckDB-side formula is
    // least(65536, greatest(8, (n + 249) // 250)) — same integers
    for (n <- Seq(1L, 250L, 251L, 2000L, 2001L, 49999L, 50000L)) {
      val sqlTwin = math.min(65536L, math.max(8L, (n + 249) / 250)).toInt
      assert(autoCells(n) == sqlTwin)
    }
  }

  test("assignCellsHierarchical: exact at full probe width, high boundary " +
    "agreement at superProbes=2, duplicates co-located, deterministic") {
    val rnd = new scala.util.Random(42)
    // 12 well-separated cluster directions in R^8, 40 points each with
    // small noise — the regime SemDeDup assignment actually runs in
    val dirs = Array.fill(12)(Array.fill(8)(rnd.nextGaussian()))
    val pts = for (c <- dirs.indices; j <- 0 until 40) yield {
      val v = dirs(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      (c * 1000L + j, v)
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(df, nCells = 12, iters = 3)
    val flat = Similarity.assignCells(df, "embedding", cents)
      .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toMap
    // probing every super-cell scores every child -> identical argmax
    val full = Similarity.assignCellsHierarchical(df, "embedding", cents,
        superProbes = 1000)
      .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toMap
    assert(full == flat, "superProbes >= S must recover the flat argmax")
    // narrow probing: agreement stays high (boundary effect only)
    val hier = Similarity.assignCellsHierarchical(df, "embedding", cents,
        superProbes = 2)
      .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toMap
    assert(hier.keySet == flat.keySet, "every row must be assigned")
    val agree = hier.count { case (id, c) => flat(id) == c }
    assert(agree >= (hier.size * 0.9).toInt,
      s"agreement ${agree}/${hier.size} below bound")
    // identical vectors score identically at every level -> same cell,
    // so near-dup recall survives hierarchical assignment
    val dup = Seq((900001L, pts.head._2), (900002L, pts.head._2))
      .toDF("vec_id", "embedding")
    val dupCells = Similarity.assignCellsHierarchical(
        df.unionByName(dup), "embedding", cents, superProbes = 2)
      .filter($"vec_id" >= 900000L)
      .select($"cell_id").as[Int].collect().toSet
    assert(dupCells.size == 1, "planted duplicates split across cells")
    // determinism under physical reshuffle
    val re = Similarity.assignCellsHierarchical(
        df.repartition(7), "embedding", cents, superProbes = 2)
      .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toMap
    assert(re == hier, "assignment must be partition-invariant")
    // superProbes=1 must still assign EVERY row — empty super-cells
    // (Lloyd strands them with stale vectors) are excluded from probe
    // selection, never silently dropping the row
    val one = Similarity.assignCellsHierarchical(df, "embedding", cents,
        superProbes = 1)
      .select($"vec_id").as[Long].collect().toSet
    assert(one == flat.keySet, "superProbes=1 dropped rows")
    // a NaN-element vector ranks NaN-greatest everywhere; at full probe
    // width the hierarchical tie rule must land on the same (smallest)
    // cell id the flat scan picks
    val nanRow = Seq((777777L, Array(Float.NaN, 1f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val both = df.unionByName(nanRow)
    val fNan = Similarity.assignCells(both, "embedding", cents)
      .filter($"vec_id" === 777777L).select($"cell_id").as[Int].head()
    val hNan = Similarity.assignCellsHierarchical(both, "embedding", cents,
        superProbes = 1000)
      .filter($"vec_id" === 777777L).select($"cell_id").as[Int].head()
    assert(hNan == fNan, s"NaN-tie divergence: hier $hNan vs flat $fNan")
  }

  test("semanticDedupPairs auto-switches to hierarchical assignment at " +
    "HierKThreshold with planted-duplicate recall intact") {
    val rnd = new scala.util.Random(7)
    val dirs = Array.fill(10)(Array.fill(8)(rnd.nextGaussian()))
    val base = for (c <- dirs.indices; j <- 0 until 30) yield {
      val v = dirs(c).map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
      (c * 1000L + j, v)
    }
    // plant 15 EXACT duplicate pairs spread across the clusters:
    // identical vectors score identically at every descent level, so
    // they must co-locate and pair regardless of assignment path
    val planted = base.take(15).map { case (id, v) => (id + 500000L, v) }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    // superProbes = 2 opts into the hierarchical production regime
    // explicitly (an explicit nCells now KEEPS flat semantics — the
    // auto-switch keys only on the adaptive nCells<=0 path); the tiny
    // corpus keeps the spec fast
    assert(Similarity.HierKThreshold == 4096)
    val pairs = Similarity.semanticDedupPairs(df, "vec_id", "embedding",
        threshold = 0.999, nCells = Similarity.HierKThreshold,
        superProbes = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // and the explicit-nCells default stays on the exact flat path
    // (no silent approximation): planted dups all recovered there too
    val flatPairs = Similarity.semanticDedupPairs(df, "vec_id",
        "embedding", threshold = 0.999,
        nCells = Similarity.HierKThreshold)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    base.take(15).foreach { case (id, _) =>
      assert(flatPairs.contains((id, id + 500000L)),
        s"planted duplicate ($id, ${id + 500000L}) lost by flat path")
    }
    base.take(15).foreach { case (id, _) =>
      assert(pairs.contains((id, id + 500000L)),
        s"planted duplicate ($id, ${id + 500000L}) lost by the switch")
    }
    // precision stays 1.0 by construction: every emitted pair really
    // clears the cosine threshold — no same-cell fabrications
    val vecs = df.as[(Long, Array[Float])].collect().toMap
    pairs.foreach { case (a, b) =>
      val (va, vb) = (vecs(a).map(_.toDouble), vecs(b).map(_.toDouble))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val sim = dot / (math.sqrt(va.map(x => x * x).sum) *
        math.sqrt(vb.map(x => x * x).sum))
      assert(sim >= 0.999, s"pair ($a,$b) below threshold: $sim")
    }
  }

  test("hierarchical regime at K = 4096: planted recall 100%, " +
    "near-dup recall vs flat measured >= 0.9") {
    // the production regime semanticDedupPairs auto-switches to at
    // ~1M vectors, shrunk: n = 4160 >= K = 4096 so every cell seeds.
    // 260 Gaussian bases x 16 perturbed copies; copies of one base are
    // near-dups (the structure recall is measured on), 20 EXACT dups
    // planted under negative ids (recall must be 100% by purity).
    val rnd = new scala.util.Random(23)
    val bases = Array.fill(260)(Array.fill(8)(rnd.nextGaussian().toFloat))
    val inflated = for (b <- bases.indices; c <- 0 until 16) yield {
      val v = bases(b).zipWithIndex.map { case (x, j) =>
        x + c * 0.01f * ((j * 7 + c) % 5 - 2) }
      (b.toLong * 16 + c, v)
    }
    // copy-0 perturbation is the identity, so this IS an exact dup of
    // inflated id b*16
    val planted = (0 until 260 by 13).map(b =>
      (b.toLong * -16 - 1, bases(b)))
    val df = (inflated ++ planted).toDF("id", "emb")
    def pairsOf(probes: Int) = Similarity
      .semanticDedupPairs(df, "id", "emb", threshold = 0.995,
        nCells = 4096, superProbes = probes)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val hier = pairsOf(2)
    val flat = pairsOf(-1) // forced exact flat at the same K
    (0 until 260 by 13).foreach { b =>
      assert(hier.contains((b.toLong * -16 - 1, b.toLong * 16)),
        s"planted exact dup for base $b lost by the lossy regime")
    }
    // near-dup recall: of the pairs the exact flat path emits, how
    // many survive the superProbes=2 descent (precision is 1.0 on
    // both sides — every emitted pair is cosine-verified)
    val recall = (hier & flat).size.toDouble / flat.size
    info(f"hier-vs-flat near-dup recall at K=4096: $recall%.4f " +
      s"(flat ${flat.size} pairs, hier ${hier.size})")
    assert(recall >= 0.9, f"near-dup recall $recall%.3f below 0.9")
    // (hier may also emit pairs flat's blocking split — both sides are
    // cosine-verified, so precision vs ground truth is 1.0 regardless)
  }

  test("ngramLmScore matches hand-computed smoothed bigram means") {
    val ref = Seq((0L, "a b a"), (1L, "b a")).toDF("id", "text")
    val docs = Seq((10L, "a b c"), (11L, "a"), (12L, "")).toDF("id", "text")
    // model: uni c(a)=3, c(b)=2; V=2
    // bigrams: (a,b)=1, (b,a)=2
    val got = TextPipeline.ngramLmScore(docs, "id", "text", ref, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    // doc 10 "a b c": tokens 3, oov 1 (c); bigrams (a,b) p=(1+1)/(3+2)=0.4
    // and (b,c) p=(0+1)/(2+2)=0.25 -> mean 0.325
    val (nt10, noov10, oov10, nb10, s10) = got(10L)
    assert(nt10 == 3 && noov10 == 1 && nb10 == 2)
    assert(math.abs(oov10 - 1.0 / 3) < 1e-12)
    assert(s10.exists(v => math.abs(v - 0.325) < 1e-9))
    // doc 11 "a": one token, no bigrams -> null score
    val (nt11, noov11, _, nb11, s11) = got(11L)
    assert(nt11 == 1 && noov11 == 0 && nb11 == 0 && s11.isEmpty)
    // doc 12 "": tokens("") is [""], an OOV token
    val (nt12, noov12, _, _, _) = got(12L)
    assert(nt12 == 1 && noov12 == 1)
  }

  test("ngramLmScore logProb mode returns mean ln p") {
    val ref = Seq((0L, "a b a"), (1L, "b a")).toDF("id", "text")
    val docs = Seq((10L, "a b c")).toDF("id", "text")
    val s = TextPipeline
      .ngramLmScore(docs, "id", "text", ref, "text", logProb = true)
      .select($"lm_score").head.getDouble(0)
    val expected = (math.log(0.4) + math.log(0.25)) / 2
    assert(math.abs(s - expected) < 1e-6)
  }
}
