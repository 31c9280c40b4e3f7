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
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val r = right.select(
      (col(key) +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        payload.map(c => col(c).as(s"asof_$c"))): _*)
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal times → inclusive <=.
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__t", "__side")
  }
}
