package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** is_sorted (cpp/include/cudf/sorting.hpp is_sorted): does the frame's
  * current row order satisfy the given key order?
  *
  * Distributed formulation — no global sort, no single-partition window:
  * each partition reports (index, locally-sorted, first-key, last-key)
  * from one mapPartitions pass, and the driver folds the per-partition
  * summaries (numPartitions rows, not data rows) checking local
  * sortedness plus boundary order between consecutive partitions. This
  * is the same split the reference's multi-block GPU scan performs.
  */
object SortCheck {

  /** True iff `keyCol` (cast to double for comparison) is non-decreasing
    * in the DataFrame's CURRENT row/partition order. */
  def isSorted(df: DataFrame, keyCol: String): Boolean = {
    val summaries = df.select(col(keyCol).cast("double"))
      .rdd.mapPartitionsWithIndex { (idx, it) =>
        var first = 0.0
        var last = 0.0
        var seen = false
        var ok = true
        it.foreach { r =>
          if (r.isNullAt(0)) {
            // nulls-first ordering: a null after any value breaks order
            if (seen) ok = false
          } else {
            val v = r.getDouble(0)
            if (seen && last > v) ok = false
            if (!seen) { first = v; seen = true }
            last = v
          }
        }
        Iterator.single((idx, ok,
          if (seen) Some(first) else None, if (seen) Some(last) else None))
      }.collect().sortBy(_._1)
    summaries.forall(_._2) &&
      summaries.sliding(2).forall {
        case Array((_, _, _, Some(prevLast)), (_, _, Some(nextFirst), _)) =>
          prevLast <= nextFirst
        case _ => true
      }
  }
}
