package graft

import graft.operators.SegmentDedup
import org.scalatest.funsuite.AnyFunSuite

/** Segment-granularity (line-level) corpus dedup — the CCNet/RefinedWeb
  * boilerplate pass the gate queries exercise at token granularity
  * (doc_df_prune / doc_seg_dedup); here with real newline segments. */
class SegmentDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // "subscribe to our newsletter" is boilerplate (3 of 4 docs);
  // "all rights reserved" appears in 2 of 4.
  val docs = Seq(
    (0L, "unique opening line\nsubscribe to our newsletter\nall rights reserved"),
    (1L, "subscribe to our newsletter\nsome actual content here"),
    (2L, "all rights reserved\nsubscribe to our newsletter"),
    (3L, "completely original document")
  ).toDF("doc_id", "text")

  test("segmentDocFreq counts distinct docs per segment") {
    val f = SegmentDedup.segmentDocFreq(docs, "doc_id", "text", "\n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f("subscribe to our newsletter") == 3L)
    assert(f("all rights reserved") == 2L)
    assert(f("unique opening line") == 1L)
    // salt width is a pure spreading knob: any bucket count sums to the
    // same exact distincts (the adaptive default must change nothing)
    for (b <- Seq(1, 3, 64)) {
      val fb = SegmentDedup.segmentDocFreq(docs, "doc_id", "text", "\n", b)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fb == f, s"saltBuckets=$b changed results")
    }
  }

  test("removeFrequentSegments drops boilerplate, keeps order, keeps empty docs") {
    // 3/4 = 0.75 >= 0.7 drops only the newsletter line
    val out = SegmentDedup.removeFrequentSegments(docs, "doc_id", "text",
        minDocFrac = 0.7).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((0L, "unique opening line\nall rights reserved", 3L, 1L)))
    assert(out(1) == ((1L, "some actual content here", 2L, 1L)))
    assert(out(2) == ((2L, "all rights reserved", 2L, 1L)))
    assert(out(3) == ((3L, "completely original document", 1L, 0L)))
  }

  test("removeFrequentSegments at a lower threshold can empty a doc entirely") {
    // 2/4 = 0.5 also drops "all rights reserved" → doc 2 loses everything
    val out = SegmentDedup.removeFrequentSegments(docs, "doc_id", "text",
        minDocFrac = 0.5).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out(2) == ((2L, "", 2L)))           // row survives, text empty
    assert(out(0) == ((0L, "unique opening line", 2L)))
  }

  test("dedupSegmentsKeepFirst keeps only the globally first occurrence") {
    val out = SegmentDedup.dedupSegmentsKeepFirst(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // doc 0 is first for all three of its lines; later docs lose repeats
    assert(out(0) == ((0L,
      "unique opening line\nsubscribe to our newsletter\nall rights reserved", 0L)))
    assert(out(1) == ((1L, "some actual content here", 1L)))
    assert(out(2) == ((2L, "", 2L)))
    assert(out(3) == ((3L, "completely original document", 0L)))
  }

  test("segmentScreenBatch scrubs batch rows against the corpus line set") {
    val screen = SegmentDedup.segmentScreenBatch(docs, "doc_id", "text")
    try {
      val batch = Seq(
        (10L, "subscribe to our newsletter\nbrand new line"),
        (11L, "all rights reserved"),
        (12L, "nothing in common")).toDF("doc_id", "text")
      val out = screen(batch).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
      assert(out(0) == ((10L, "brand new line", 1L)))
      assert(out(1) == ((11L, "", 1L)), "fully-known doc survives empty")
      assert(out(2) == ((12L, "nothing in common", 0L)))
      // second application reuses the same persisted index
      assert(screen(batch).count() == 3)
    } finally screen.close()
  }

  test("reassembly preserves within-doc segment order, not arrival order") {
    // two docs with disjoint segments: nothing reaches df 2/2, so both
    // survive intact — any arrival-order leak in collect_list would
    // scramble the 51-segment reassembly
    val wide = Seq(
      (9L, (0 to 50).map(i => s"seg$i").mkString("\n")),
      (10L, "other document entirely")
    ).toDF("doc_id", "text")
    val out = SegmentDedup.removeFrequentSegments(wide, "doc_id", "text",
      minDocFrac = 0.99).orderBy("doc_id").collect().head
    assert(out.getString(1) == (0 to 50).map(i => s"seg$i").mkString("\n"))
  }
}
