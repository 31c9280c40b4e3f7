package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** is_sorted (cpp/include/cudf/sorting.hpp is_sorted): does the frame's
  * current row order satisfy the given key order?
  *
  * Distributed formulation — no global sort, no single-partition window:
  * each partition reports (index, locally-sorted, bounds, null presence)
  * from one mapPartitions pass, and the driver folds the per-partition
  * summaries (numPartitions rows, not data rows) checking local
  * sortedness, boundary order across NON-EMPTY partitions, and global
  * nulls-first placement. This is the same split the reference's
  * multi-block GPU scan performs.
  */
object SortCheck {

  /** Comparator in the key's NATIVE type: casting longs/decimals to
    * double would collapse adjacent distinct values above 2^53 (an
    * unsorted frame could report sorted), and `last > v` on doubles is
    * false for NaN (frames with NaN would always pass). Floats/doubles
    * use java.lang.{Float,Double}.compare, which orders NaN greater
    * than every value — Spark's own ordering. */
  private def comparator(dt: DataType): (Any, Any) => Int = dt match {
    case FloatType =>
      (a, b) => java.lang.Float.compare(
        a.asInstanceOf[Float], b.asInstanceOf[Float])
    case DoubleType =>
      (a, b) => java.lang.Double.compare(
        a.asInstanceOf[Double], b.asInstanceOf[Double])
    case _: DecimalType =>
      (a, b) => a.asInstanceOf[java.math.BigDecimal]
        .compareTo(b.asInstanceOf[java.math.BigDecimal])
    case _ => // byte / short / int / long: exact in a long
      (a, b) => java.lang.Long.compare(
        a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
  }

  /** True iff `keyCol` is non-decreasing (nulls first, NaN last) in the
    * DataFrame's CURRENT row/partition order. Numeric keys only —
    * matching RangeJoin, non-numeric columns are rejected up front
    * rather than silently casting to null. */
  def isSorted(df: DataFrame, keyCol: String): Boolean = {
    val field = df.schema(keyCol)
    require(field.dataType.isInstanceOf[NumericType],
      s"isSorted key $keyCol must be numeric, got ${field.dataType}")
    val cmp = comparator(field.dataType)
    val summaries = df.select(col(keyCol))
      .rdd.mapPartitionsWithIndex { (idx, it) =>
        var first: Any = null
        var last: Any = null
        var seen = false
        var hasNull = false
        var ok = true
        it.foreach { r =>
          if (r.isNullAt(0)) {
            hasNull = true
            // nulls-first ordering: a null after any value breaks order
            if (seen) ok = false
          } else {
            val v = r.get(0)
            if (seen && cmp(last, v) > 0) ok = false
            if (!seen) { first = v; seen = true }
            last = v
          }
        }
        Iterator.single((idx, ok, seen, first, last, hasNull))
      }.collect().sortBy(_._1)
    if (!summaries.forall(_._2)) return false
    // nulls-first across partitions: no null may appear after any value
    var valueSeen = false
    summaries.foreach { case (_, _, seen, _, _, hasNull) =>
      if (hasNull && valueSeen) return false
      if (seen) valueSeen = true
    }
    // boundary order over NON-EMPTY partitions only (empty or all-null
    // partitions must not break the comparison chain)
    var prevLast: Option[Any] = None
    summaries.foreach { case (_, _, seen, first, last, _) =>
      if (seen) {
        if (prevLast.exists(cmp(_, first) > 0)) return false
        prevLast = Some(last)
      }
    }
    true
  }
}
