package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the batch analog of
  * Structured Streaming's session_window (SURVEY.md §2.10: the reference
  * has no event-time semantics; this is superset capability).
  *
  * One shuffle on the user key; session ids are a running sum of
  * new-session flags over the per-user time order — the standard
  * gaps-and-islands formulation, linear per partition.
  */
object Sessionize {

  /** Adds `session_idx` (0-based per user) given an inactivity gap. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val run = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__gap_us",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__new",
        when(col("__gap_us").isNull || col("__gap_us") > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("__new")).over(run) - 1)
      .drop("__gap_us", "__new")
  }

  /** Per-session rollup: bounds, duration, event count, value sum.
    * `valueScale` is the decimal scale of the order-exact sum (values
    * quantize to that many decimal places; magnitudes must stay under
    * 10^(18−scale) or the cast nulls and the row drops from the sum) —
    * pick it for the value column's range, same contract as
    * QueryPack.dsum. */
  def summarize(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gapSeconds: Long, valueScale: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    assign(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol))))
          .as("duration_us"),
        sum(col(valueCol).cast(DecimalType(18, valueScale))).cast("double")
          .as("sum_value"))
  }
}
