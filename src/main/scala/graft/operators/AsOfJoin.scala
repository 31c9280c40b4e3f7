package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — absent in the reference (SURVEY.md
  * §2.3 notes pandas merge_asof is unimplemented there), provided as a
  * superset operator because event pipelines need it.
  *
  * Implementation is the union+window pattern, NOT a join: tag right
  * rows, union both inputs, sort within each key partition by
  * (time, side) and carry the last non-null right payload forward. This
  * costs exactly ONE shuffle on the key — at 100 TB it beats the
  * join+groupBy-max formulation (two shuffles + a potentially huge
  * intermediate) and never materializes candidate pairs.
  */
object AsOfJoin {

  /** For each left row, attach the payload of the latest right row with
    * the same key and rightTime <= leftTime.
    *
    * @param payload right-side columns to carry; they appear on the
    *                output prefixed with `asof_`.
    */
  def asofPrev(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame =
    asofPrev(left, right, key, leftTime, rightTime, payload, toleranceMicros = 0L)

  /** As [[asofPrev]], with an optional tolerance: matches farther back
    * than `toleranceMicros` are nulled out (pandas merge_asof tolerance
    * semantics). 0 = unbounded. The matched right timestamp is always
    * carried as `asof___t` for gap computations. */
  def asofPrev(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      toleranceMicros: Long): DataFrame = {
    // The whole right row rides in ONE struct, carried atomically: a
    // per-column last(ignoreNulls) would mix values from DIFFERENT
    // right rows whenever the matched row has a null field (and let a
    // stale row's field leak past the tolerance check). The struct is
    // non-null for every right row even when all its fields are null,
    // so null payload fields survive as nulls of the matched row.
    // Ties between right rows at the same (key, time) are resolved by
    // partition order — give rightTime a unique tiebreak upstream if
    // that matters.
    // JOIN null semantics: a right row with a null key or null time can
    // never be a reference (its __p is null, so last(ignoreNulls) skips
    // it) — without the guard, Window.partitionBy would group null keys
    // together and the nulls-first sort would carry a null-time row as
    // the "earliest" match for everything.
    val r = right.select(col(key), col(rightTime).as("__t"),
      lit(0).as("__side"),
      when(col(key).isNotNull && col(rightTime).isNotNull,
        struct((unix_micros(col(rightTime)).as("__rt") +:
          payload.map(c => col(c).as(s"asof_$c"))): _*)).as("__p"))
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal times → inclusive <=.
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val stale =
      if (toleranceMicros <= 0) lit(false)
      else unix_micros(col("__t")) - col("__p.__rt") > toleranceMicros
    val unpacked = ("asof___t" -> col("__p.__rt")) +:
      payload.map(c => s"asof_$c" -> col(s"__p.asof_$c"))
    unpacked.foldLeft(carried) { case (df, (name, c)) =>
        df.withColumn(name, when(stale, lit(null)).otherwise(c))
      }
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__p")
  }

  /** Forward as-of: earliest right row with rightTime >= leftTime
    * (merge_asof direction='forward') — same single-shuffle pattern with
    * a following-frame `first`. */
  def asofNext(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    // same atomic-struct carry as asofPrev (per-column first() would
    // mix fields across right rows on null payload fields)
    // same null-key/null-time guard as asofPrev
    val r = right.select(col(key), col(rightTime).as("__t"),
      lit(1).as("__side"),
      when(col(key).isNotNull && col(rightTime).isNotNull,
        struct(payload.map(c => col(c).as(s"asof_$c")): _*)).as("__p"))
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Left rows sort before right rows at equal times → inclusive >=.
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned
      .withColumn("__p", first(col("__p"), ignoreNulls = true).over(w))
    payload.foldLeft(carried) { (df, c) =>
        df.withColumn(s"asof_$c", col(s"__p.asof_$c"))
      }
      .filter(col("__side") === 0)
      .drop("__t", "__side", "__p")
  }
}
