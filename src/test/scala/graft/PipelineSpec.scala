package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end drive of examples.TrainingPipeline on sf0.001 — the
  * "switch from the reference" integration check: every curation stage
  * chained through the library surface, with the invariants a real
  * pipeline owner would assert on each run.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("training pipeline runs end-to-end with sane stage invariants") {
    assume(TestData.available("0.001"),
      s"testdata absent at ${TestData.sf("0.001")}")
    val (stages, packed) = graft.examples.TrainingPipeline.run(
      spark, TestData.sf("0.001"))
    val s = stages.toMap
    assert(s("raw") == 500)
    // map-only stages never change cardinality
    assert(s("normalized") == s("raw"))
    // filters only shrink
    assert(s("quality_gated") <= s("normalized"))
    assert(s("top_frac_per_lang") <= s("quality_gated"))
    assert(s("dedup_exact") <= s("top_frac_per_lang"))
    // boilerplate is row-preserving (it edits text, not membership)
    assert(s("boilerplate_pruned") == s("dedup_exact"))
    assert(s("temperature_mixed") <= s("boilerplate_pruned"))
    // split partitions the mixture output; train is the ~90% side
    assert(s("train_split") < s("temperature_mixed"))
    assert(s("train_split") > s("temperature_mixed") / 2)
    // every train doc yields at least one chunk
    assert(s("chunked") >= s("train_split"))
    // packing produced multiple real bins
    assert(s("packed_bins") > 1)
    // packed output: no bin exceeds its token budget by more than one
    // sequence (first-fit contract: a bin closes when the next sequence
    // would overflow), and every chunk is packed exactly once
    val over = packed.groupBy("pack_group", "bin")
      .agg(sum("n_tokens").as("toks"))
      .filter(col("toks") > 256 + 64).count()
    assert(over == 0, "a bin exceeded budget + one max-length sequence")
    assert(packed.select("chunk_id").distinct().count() == s("chunked"))
  }
}
