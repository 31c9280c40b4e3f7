package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftshim.CheckpointUtil

/** Lineage-cut policy for graft's iterative operators (pointer-jumping
  * connected components, PageRank/BFS fixpoints, the global suffix
  * ranking's prefix-doubling rounds, BPE merge learning).
  *
  * Each round of those loops must cut lineage or the plan grows without
  * bound. Two regimes:
  *
  *  - Default (`spark.graft.checkpointDir` unset): `localCheckpoint()` —
  *    executor-local MEMORY_AND_DISK blocks, no DFS round-trip. Right for
  *    local mode and for clusters that accept "executor loss fails the
  *    job" on these operators.
  *  - `spark.graft.checkpointDir=<dfs path>`: reliable `checkpoint()` to
  *    that directory. On a 1000-executor cluster running hours-long
  *    fixpoints, an executor loss then recovers from DFS instead of
  *    failing the query — the 100 TB fault-tolerance knob, no source
  *    edit needed. Enable `spark.cleaner.referenceTracking.cleanCheckpoints`
  *    to reap superseded round files.
  *
  * Both regimes are eager (computed once, lineage cut, result pinned);
  * outputs are bit-identical — the knob changes WHERE the cut frame
  * lives, never WHAT it holds.
  */
object Checkpoints {
  val DirKey = "spark.graft.checkpointDir"

  /** Cut lineage on `df` per the session's checkpoint policy. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        // setCheckpointDir is idempotent for the same path; set lazily so
        // sessions that never opt in pay nothing.
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }

  /** Release the executor storage behind a consumed `cut` frame (no-op
    * for reliable checkpoints, whose blocks live on DFS; essential for
    * local ones, which `unpersist()` never touches). Only call once every
    * consumer is materialized — a cut frame has no lineage to recompute.
    */
  def free(df: DataFrame): Unit = CheckpointUtil.free(df)
}
