package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance: apply an upsert/delete change set to
  * a snapshot (MERGE INTO semantics, table-format-free — the engine-side
  * half of what Delta/Iceberg writers do; the reference's copying/
  * scatter+boolean-mask update path, cpp/include/cudf/copying.hpp:223,
  * only covers aligned-row updates).
  *
  * Scale shape: [[merge]] is a UNION + one keyed aggregation — a single
  * shuffle on the key, no join, no driver state; [[compactLog]] is the
  * same shape over the raw change log (latest-wins by sequence). Both
  * are max_by argmax aggregations, so they partial-aggregate map-side
  * and survive hot keys (a key updated a million times combines before
  * the shuffle — a window over the log would sort the hot key in one
  * task).
  */
object Cdc {

  /** Latest change per key from an append-only change log: highest
    * `seqCol` wins; same-sequence ties break by op string descending
    * (lexicographic: U > I > D) for determinism — give deletes a later
    * sequence if they must win ties. */
  def compactLog(log: DataFrame, keyCol: String, seqCol: String,
      opCol: String): DataFrame = {
    val payload = log.columns.filter(c => c != keyCol)
    log.groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col): _*),
        struct(col(seqCol), col(opCol))).as("__r"))
      .select(col(keyCol) +: payload.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** MERGE the (pre-compacted: unique key per row) `changes` into
    * `snapshot`: op 'U'/'I' replaces-or-adds the row, 'D' removes it,
    * untouched snapshot rows pass through. `changes` must carry the
    * snapshot's payload columns plus `opCol`. */
  def merge(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String): DataFrame = {
    val payload = snapshot.columns.filter(_ != keyCol)
    val s = snapshot
      .withColumn("__op", lit(null).cast("string"))
      .withColumn("__pri", lit(0))
    val c = changes
      .select((keyCol +: payload).map(col) :+ col(opCol).as("__op"): _*)
      .withColumn("__pri", lit(1))
    s.unionByName(c)
      .groupBy(col(keyCol))
      .agg(max_by(struct((payload :+ "__op").map(col): _*), col("__pri"))
        .as("__r"))
      .filter(col("__r.__op").isNull || col("__r.__op") =!= "D")
      .select(col(keyCol) +: payload.map(p => col(s"__r.$p").as(p)): _*)
  }
}
