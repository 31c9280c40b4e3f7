package graft.operators

import org.apache.spark.sql.DataFrame

/** A corpus-indexed ingest screen: apply it to each micro-batch (it IS
  * a `DataFrame => DataFrame`, so it wires straight into
  * `writeStream.foreachBatch` helpers), and call [[close]] when the
  * screen is rebuilt over a refreshed corpus — the corpus-side index
  * (persisted frames, broadcast models) lives until then, and a
  * long-lived driver that rebuilds screens without closing the old one
  * would otherwise accumulate orphaned cached partitions for the
  * lifetime of the SparkContext. */
final class IngestScreen(screen: DataFrame => DataFrame,
    release: () => Unit) extends (DataFrame => DataFrame) {
  def apply(batch: DataFrame): DataFrame = screen(batch)
  /** Release the persisted corpus index and any broadcast model. The
    * screen must not be applied after close. */
  def close(): Unit = release()
}
