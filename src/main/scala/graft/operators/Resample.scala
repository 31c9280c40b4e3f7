package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling (the reference follows pandas'
  * resampler surface, python/cudf/cudf/core/resample.py — downsample to
  * a fixed step, then fill).
  *
  * 100 TB shape — ONE scan, ONE shuffle, NO join: the raw stream
  * collapses to per-(key, bucket) LAST values (a map-side-combinable
  * max(struct) aggregation — the only pass over full data), then each
  * observation EXPLODES into its gap-run [bucket, next_bucket − 1]
  * (sequence+explode after a lead window that reuses the aggregation's
  * partitioning) — the forward fill IS the run generation, so the
  * obvious grid⟕observations join (which plans the source subtree
  * twice — Spark plans are trees, not DAGs) never exists. Bucket ids
  * are exact integer division of epoch micros, so engines agree
  * bit-for-bit.
  */
object Resample {

  /** SQL text for FLOOR division of `x` by positive literal `n` —
    * shared by the time-grid operators (here and IntervalJoin). Spark's
    * `div` truncates toward zero, which for negative coordinates makes
    * bucket 0 twice every other bucket's width; `%` follows the
    * dividend's sign, so a negative remainder means truncation rounded
    * toward zero and we step one bucket down. Public: the query packs
    * share it so their day-bucket ids stay floor-aligned with the
    * DuckDB `//` oracles and with `window()` partitioning even for
    * pre-1970 timestamps. */
  def floorDivExpr(x: String, n: Long): String =
    s"(($x) div ${n}L) - (case when ($x) % ${n}L < 0 then 1 else 0 end)"

  /** Downsample `df` to `stepMicros` buckets per `keyCol`, carrying the
    * latest (`tsCol`, `tieCol`)-ordered `valueCol` per bucket, then
    * forward-fill across the dense per-key grid [min bucket, max
    * bucket]. Output: keyCol, win_id, has_obs, v_ffill. */
  /** Time-weighted average per (key, bucket): Σ v·Δt / Σ Δt where Δt is
    * the micros to the NEXT observation in the same bucket (the last
    * observation of a bucket carries no weight — standard
    * between-observations TWAP; single-observation buckets yield NULL).
    * The value quantizes to its native fixed-point scale first, so
    * v·Δt is an EXACT decimal (the ds_regression lesson: a double
    * product rounds, and the two engines then disagree at the decimal
    * boundary) — num/den convert to double once, one IEEE division.
    * One window + one aggregation, both on the same (key, bucket)
    * partitioning. Tie timestamps order by `tieBreakCol` so the
    * value↔gap pairing is deterministic. */
  def twap(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieBreakCol: String, bucketMicros: Long,
      valueScale: Int = 2): DataFrame = {
    val tus = expr(s"unix_micros($tsCol)")
    val bucket = expr(floorDivExpr(s"unix_micros($tsCol)", bucketMicros))
    val w = Window.partitionBy(col(keyCol), col("_bucket"))
      .orderBy(col("_tus"), col(tieBreakCol))
    val dec = org.apache.spark.sql.types.DecimalType(18, valueScale)
    // null-valued observations are excluded UP FRONT: kept in the lead
    // chain they would contribute their Δt to the denominator while
    // adding nothing to the numerator, silently dragging the average
    // toward zero; excluded, their time attributes to the previous
    // observation (the standard unknown-sample treatment).
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tieBreakCol), tus.as("_tus"),
        bucket.as("_bucket"), col(valueCol).cast(dec).as("_v"))
      .withColumn("_dt", lead(col("_tus"), 1).over(w) - col("_tus"))
      .groupBy(col(keyCol), col("_bucket"))
      .agg(sum(col("_v") * col("_dt")).cast("double").as("_num"),
        sum(col("_dt")).as("_den"))
      .withColumn("twap",
        when(col("_den") > 0, col("_num") / col("_den").cast("double")))
      .withColumnRenamed("_bucket", "bucket")
      .drop("_num", "_den")
  }

  /** Missing buckets per key: grid positions between each key's first
    * and last active bucket with NO observation — the coverage-gap
    * report of a feed monitor. Per-key (min, max) is one aggregate;
    * the expected grid explodes from it (sequence — bounded by span,
    * not corpus) and anti-joins the observed buckets. */
  def missingBuckets(df: DataFrame, keyCol: String, tsCol: String,
      bucketMicros: Long): DataFrame = {
    val bucket = expr(floorDivExpr(s"unix_micros($tsCol)", bucketMicros))
    val observed = df.select(col(keyCol), bucket.as("bucket")).distinct()
    val spans = observed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("_lo"), max(col("bucket")).as("_hi"))
    spans.select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"))).as("bucket"))
      .join(observed, Seq(keyCol, "bucket"), "left_anti")
  }

  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, stepMicros: Long): DataFrame = {
    val us = s"unix_micros($tsCol)"
    val obs = df
      .groupBy(col(keyCol), expr(Resample.floorDivExpr(us, stepMicros)).as("win_id"))
      .agg(max(struct(unix_micros(col(tsCol)).as("us"), col(tieCol),
        col(valueCol).as("value"))).as("m"))
      .select(col(keyCol), col("win_id"), col("m.value").as("v_obs"))
    val nxt = lead(col("win_id"), 1)
      .over(Window.partitionBy(col(keyCol)).orderBy(col("win_id")))
    obs
      .withColumn("until", coalesce(nxt - 1L, col("win_id")))
      .withColumn("obs_win", col("win_id"))
      .select(col(keyCol), col("v_obs"), col("obs_win"),
        explode(sequence(col("obs_win"), col("until"))).as("win_id"))
      .select(col(keyCol), col("win_id"),
        (col("win_id") === col("obs_win")).as("has_obs"),
        col("v_obs").as("v_ffill"))
  }
}
