package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox"),
    (1L, "the quick brown fox"),          // exact dup of 0
    (2L, "fox brown quick the"),          // same token set as 0
    (3L, "entirely unrelated words only"),
    (4L, "the quick brown fox jumps")     // near-dup of 0
  ).toDF("doc_id", "text")

  test("exactGroups collapses byte-identical docs") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(g.length == 4)
    assert(g(0).getAs[Long]("keep_id") == 0L && g(0).getAs[Long]("n_dups") == 2L)
  }

  test("fingerprintGroups collapses same-token-set docs") {
    val g = Dedup.fingerprintGroups(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(g.length == 3)
    assert(g(0).getAs[Long]("n_docs") == 3L) // 0, 1, 2
  }

  test("exactSurvivors keeps the minimum id per digest") {
    val ids = Dedup.exactSurvivors(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(0L, 2L, 3L, 4L))
  }

  test("jaccardPairsExact finds pairs above threshold with exact values") {
    val pairs = Dedup.jaccardPairsExact(docs, "doc_id", "text", 0.79)
      .orderBy("id_a", "id_b").collect()
    val asMap = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // {the,quick,brown,fox} vs itself = 1.0; vs +jumps = 4/5
    assert(asMap((0L, 1L)) == 1.0)
    assert(asMap((0L, 2L)) == 1.0)
    assert(asMap((0L, 4L)) == 0.8)
    assert(!asMap.contains((0L, 3L)))
  }

  test("minhashPairs finds the identical and permuted pairs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 32, bands = 8, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((1L, 2L)))
  }

  test("simhashPairs reports hamming distance 0 for identical docs") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs((0L, 2L)) == 0)
  }
}
