package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear interpolation of nulls (cudf Series/DataFrame.interpolate,
  * python/cudf/cudf/core/indexed_frame.py interpolate; pandas
  * method='index'): each null takes the straight-line value between its
  * nearest non-null neighbors along a numeric axis column. Leading
  * nulls stay null and trailing nulls forward-fill, matching pandas.
  *
  * One window shuffle (the partition keys); the four neighbor lookups
  * share the same two one-sided frames the ffill/bfill operators use,
  * so Spark evaluates them in a single Window node pair. For pandas
  * method='linear' (equally-spaced) semantics, pass a row_number as the
  * axis.
  *
  * The axis must be UNIQUE within each partition: a null row sharing
  * its axis value with its neighbors divides by zero (NULL out, and
  * engine-divergent vs the oracle), and ties make the frame order
  * nondeterministic — same precondition as pandas' monotonic index.
  */
object Interpolate {

  def linear(df: DataFrame, valueCol: String, axisCol: String,
      partitionCols: Seq[String],
      outCol: String = "interp"): DataFrame = {
    val parts = partitionCols.map(col)
    val back = Window.partitionBy(parts: _*).orderBy(col(axisCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(parts: _*).orderBy(col(axisCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    // The axis stays in its NATIVE type until the differences: casting
    // long axis values to double first would collapse distinct values
    // above 2^53 to equal doubles and null the output via 0/0 (same
    // 2^53 hazard SortCheck documents). Differences between NEIGHBORING
    // axis values are small, so the post-subtraction double cast is
    // exact where the pre-cast was not.
    val x = df.schema(axisCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => col(axisCol)
      // timestamps interpolate on exact epoch micros (longs), not on a
      // double cast of the timestamp
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(axisCol))
      case other => throw new IllegalArgumentException(
        s"interpolate axis must be numeric or timestamp, got $other")
    }
    df
      .withColumn("__pv", last(v, ignoreNulls = true).over(back).cast("double"))
      .withColumn("__px",
        last(when(v.isNotNull, x), ignoreNulls = true).over(back))
      .withColumn("__nv", first(v, ignoreNulls = true).over(fwd).cast("double"))
      .withColumn("__nx",
        first(when(v.isNotNull, x), ignoreNulls = true).over(fwd))
      .withColumn(outCol,
        when(v.isNotNull, v.cast("double"))
          .when(col("__pv").isNull, lit(null).cast("double")) // leading
          .when(col("__nv").isNull, col("__pv"))              // trailing
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (x - col("__px")).cast("double") /
            (col("__nx") - col("__px")).cast("double")))
      .drop("__pv", "__px", "__nv", "__nx")
  }
}
