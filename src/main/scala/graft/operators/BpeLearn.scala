package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-rule LEARNING (vocabulary induction) — the training-side
  * twin of [[graft.plans.BpeEncode]]: the reference APPLIES a learned
  * merge table (cpp/include/nvtext/byte_pair_encoding.hpp:72 loads one
  * built elsewhere); learning that table from the corpus is the
  * tokenizer-training step of an LLM data pipeline. Algorithm: Sennrich,
  * Haddow & Birch 2016 (ACL, "Neural Machine Translation of Rare Words
  * with Subword Units") — iteratively merge the most frequent adjacent
  * symbol pair; ties broken (count desc, pair lexicographic asc) for
  * determinism.
  *
  * Scale shape (100 TB): the corpus-sized work — token frequency
  * counting — happens ONCE ([[learnFromCorpus]]'s groupBy); every merge
  * iteration then runs over the compacted (distinct-word, weight)
  * vocabulary frame, which is bounded by vocabulary size (~10⁷ rows for
  * web corpora), not corpus size. Each iteration is one pair-count
  * aggregation plus a single-row top-1 collect (argmax only — never the
  * vocabulary itself). The re-segmented vocabulary is re-materialized
  * per iteration and the previous one released; every
  * `checkpointEvery`-th iteration cuts lineage via [[Checkpoints.cut]]
  * (localCheckpoint by default, reliable checkpoint() under the
  * spark.graft.checkpointDir knob — an hours-long vocab learn on a
  * cluster survives executor loss) so plan depth stays bounded over
  * thousands of merges.
  */
object BpeLearn {

  /** One merge rule applied to a symbol array: greedy left-to-right,
    * non-overlapping — a left fold that either merges the new symbol
    * into the accumulator's tail (when tail==a and next==b) or appends.
    * Equivalent to the published scan ("aaa" + (a,a) → [aa, a]: a
    * merged symbol never re-merges with the next in the same pass). */
  private[graft] def applyMerge(syms: Column, a: String,
      b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Learn `numMerges` merge rules from a (word, weight) vocabulary
    * frame. Returns (a, b, pairCount) ranked by learning order; stops
    * early when no adjacent pair remains. */
  def learnMerges(vocab: DataFrame, wordCol: String, weightCol: String,
      numMerges: Int, checkpointEvery: Int = 16): Seq[(String, String, Long)] = {
    val reliable = vocab.sparkSession.conf
      .getOption(Checkpoints.DirKey).exists(_.nonEmpty)
    // Local regime: LAZY lineage cut EVERY iteration — the top-1
    // collect's own job materializes the re-segmented vocabulary, so
    // each iteration is still exactly one job but the plan handed to
    // the analyzer stays a flat LogicalRDD. Letting the applyMerge
    // lambda chain grow between cuts was measured 45% slower at the
    // 10-merge gate (3.2 s at checkpointEvery=16 vs 2.2 s cutting every
    // round, same-JVM interleave: per-iteration ANALYSIS of the growing
    // HOF tree dominates the tiny vocabulary compute).
    // Reliable regime: the persist-and-cut cadence is unchanged —
    // checkpointEvery there is a DFS-write budget (one recovery point
    // per k merges), not a plan-depth knob, and an hours-long learn
    // must not write DFS every merge.
    def pin(df: DataFrame, mergesDone: Int): DataFrame =
      if (!reliable) Checkpoints.lazyCut(df)
      else if (mergesDone % checkpointEvery == 0) Checkpoints.cut(df)
      else df.persist()
    var words = pin(vocab
      .select(split(col(wordCol), "").as("syms"),
        col(weightCol).cast("long").as("w"))
      .filter(size(col("syms")) > 0), 0)
    // the parent stays pinned until the CHILD's first action has
    // materialized the child (lazy cuts truncate lineage only once
    // computed — freeing the parent earlier would orphan them)
    var parent: Option[DataFrame] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("w"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
             i -> struct(element_at(syms, i) AS a,
                         element_at(syms, i + 1) AS b))""")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("w")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      // `words` is now materialized; its parent can go. free() as well
      // as unpersist(): if the parent was a checkpoint frame, unpersist
      // alone is a no-op on its blocks and one orphaned vocabulary
      // frame would leak per iteration.
      parent.foreach { p =>
        p.unpersist()
        org.apache.spark.sql.graftshim.CheckpointUtil.free(p)
      }
      parent = None
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        out += ((a, b, c))
        parent = Some(words)
        words = pin(words
          .select(applyMerge(col("syms"), a, b).as("syms"), col("w")), i + 1)
        i += 1
      }
    }
    parent.foreach { p =>
      p.unpersist()
      org.apache.spark.sql.graftshim.CheckpointUtil.free(p)
    }
    words.unpersist()
    org.apache.spark.sql.graftshim.CheckpointUtil.free(words)
    out.toSeq
  }

  /** Corpus-frequency-weighted learning over `textCol` tokens — the
    * production mode: pair counts weight each word by its corpus
    * frequency, so merges reflect usage, not the dictionary. */
  def learnFromCorpus(df: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String, Long)] =
    learnMerges(
      df.select(explode(
          graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("w")),
      "tok", "w", numMerges)

  /** Unweighted (distinct-vocabulary) learning — every word counts
    * once. Deterministic for a fixed token SET regardless of corpus
    * scale, which is what the cross-engine gate pins down. */
  def learnFromVocabulary(df: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String, Long)] =
    learnMerges(
      df.select(explode(
          graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
        .distinct().withColumn("w", lit(1L)),
      "tok", "w", numMerges)
}
