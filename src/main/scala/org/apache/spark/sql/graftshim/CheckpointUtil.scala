package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the storage behind a `localCheckpoint()`ed DataFrame.
  *
  * `Dataset.unpersist()` only uncaches plans registered with the
  * CacheManager; a local checkpoint persists the underlying
  * `RDD[InternalRow]` directly (MEMORY_AND_DISK), which unpersist never
  * touches — without this, every iteration of a checkpointed loop
  * (pointer-jumping connected components, BPE merge learning) leaks one
  * full frame of executor storage until a driver GC lets ContextCleaner
  * reclaim it. This walks the analyzed plan's `LogicalRDD` leaves —
  * exactly what a local checkpoint compiles to — and unpersists their
  * RDDs non-blockingly. A no-op on frames that were never checkpointed.
  *
  * Only free a frame whose consumers are fully materialized: a local
  * checkpoint has no lineage, so a freed block cannot be recomputed.
  * (localCheckpoint already trades executor-loss fault tolerance for
  * speed — Spark fails the query on lost checkpoint blocks either way —
  * so freeing consumed rounds does not weaken the existing contract.)
  */
object CheckpointUtil {
  def free(df: DataFrame): Unit =
    try {
      df.queryExecution.analyzed.collectLeaves().foreach {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } catch { case _: Throwable => () } // best effort: never fail the job
}
