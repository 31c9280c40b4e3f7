package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders,
  KeyValueGroupedDataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Per-key rate quotas (north star: ingestion throttling — cap what any
  * one user / crawler / source can contribute per time window before it
  * skews the corpus; the reference has no rate machinery, cudf ships
  * only unbounded `sample`, cpp/include/cudf/copying.hpp).
  *
  * Batch formulation: first-k-per-(key, event-time window) via a
  * row_number ≤ k predicate — Spark's WindowGroupLimit rewrite turns
  * that into a PARTIAL per-partition top-k before the shuffle, so the
  * exchange moves at most k·partitions rows per (key, window) no matter
  * how hard a key floods (the flood is exactly what gets cut). One
  * (key, window) shuffle, nothing driver-side, deterministic tiebreak.
  */
object Throttle {

  /** Keep the first `k` events per key per tumbling event-time window.
    * Ordering inside a window is (ts, tieBreakCol) — the tiebreak makes
    * survivor selection deterministic under equal timestamps, which is
    * what lets the result be oracle-checked and re-run stable. Returns
    * the surviving rows plus their 1-based `seq_in_window`. */
  def quotaPerKeyWindow(df: DataFrame, keyCol: String, tsCol: String,
      windowDuration: String, k: Int, tieBreakCol: String): DataFrame = {
    require(k > 0, "need k > 0")
    val win = window(col(tsCol), windowDuration)
    val w = Window.partitionBy(col(keyCol), col("_win.start"))
      .orderBy(col(tsCol), col(tieBreakCol))
    df.withColumn("_win", win)
      .withColumn("seq_in_window", row_number().over(w))
      .filter(col("seq_in_window") <= k)
      .drop("_win")
  }

  /** Keep the first `k` events per key per HOPPING (sliding) event-time
    * window: duration `windowDuration`, advancing every
    * `slideDuration`. Each event belongs to duration/slide overlapping
    * windows — Spark's `window(ts, D, S)` expands the row into its
    * containing windows (an `Expand`, partition-local, no shuffle),
    * and the same row_number ≤ k predicate then rewrites to a
    * WindowGroupLimit partial top-k per (key, window start) BEFORE the
    * shuffle, so a flooding key is cut to k·partitions rows per window
    * on the map side exactly like the tumbling variant. Because
    * windows overlap, the window identity is part of the output:
    * returns (input columns, win_start epoch-micros, seq_in_window) —
    * one row per (event, containing window) that survives the quota.
    *
    * The streaming twin is [[quotaStream]] unchanged: its state key
    * already is (key, winStart), so hopping admission is the same
    * operator fed one QuotaIn per containing window (the
    * `window()`-expand done by the feed). */
  def quotaPerKeyHoppingWindow(df: DataFrame, keyCol: String,
      tsCol: String, windowDuration: String, slideDuration: String,
      k: Int, tieBreakCol: String): DataFrame = {
    require(k > 0, "need k > 0")
    val win = window(col(tsCol), windowDuration, slideDuration)
    val w = Window.partitionBy(col(keyCol), col("_win.start"))
      .orderBy(col(tsCol), col(tieBreakCol))
    df.withColumn("_win", win)
      .withColumn("win_start", unix_micros(col("_win.start")))
      .withColumn("seq_in_window", row_number().over(w))
      .filter(col("seq_in_window") <= k)
      .drop("_win")
  }

  /** One stream event for [[quotaStream]]. `winStart` is the tumbling
    * window bucket (floor(ts / window)·window in epoch micros) — keyed
    * jointly with the entity key, so state is one Long per active
    * (key, window). */
  case class QuotaIn(key: Long, winStart: Long, eventId: Long)
  case class QuotaOut(key: Long, winStart: Long, eventId: Long,
    seqInWindow: Long)

  implicit private val quotaOutEnc: Encoder[QuotaOut] =
    Encoders.product[QuotaOut]
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Streaming twin of [[quotaPerKeyWindow]]: admit the first `k`
    * events per (key, window bucket) across micro-batches. State per
    * group is a single counter; a processing-time TTL evicts closed
    * windows so state stays bounded by ACTIVE (key, window) pairs, not
    * stream history. Within a micro-batch, rows arrive in the feed
    * order — upstream watermark + sort provide event-time order, same
    * contract as the as-of stream. Admission is first-come like every
    * rate limiter: a late event that would have out-ranked an admitted
    * one does not retro-evict it (the batch operator is the exact
    * formulation — the documented append-mode tradeoff). */
  def quotaStream(grouped: KeyValueGroupedDataset[(Long, Long), QuotaIn],
      k: Int, ttlMillis: Long = 0L): Dataset[QuotaOut] = {
    require(k > 0, "need k > 0")
    val timeout = if (ttlMillis > 0) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    grouped.flatMapGroupsWithState[Long, QuotaOut](
      OutputMode.Append(), timeout) {
      case ((key, winStart), rows, state: GroupState[Long]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          var admitted = state.getOption.getOrElse(0L)
          val out = rows.flatMap { r =>
            if (admitted < k) {
              admitted += 1
              Some(QuotaOut(key, winStart, r.eventId, admitted))
            } else None
          }.toVector // drain before state.update
          state.update(admitted)
          if (ttlMillis > 0) state.setTimeoutDuration(ttlMillis)
          out.iterator
        }
    }
  }
}
