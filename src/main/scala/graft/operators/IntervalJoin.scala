package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketized interval join — the BIG-BIG scale path for
  * point-in-interval and interval-overlap predicates.
  *
  * Spark plans a pure non-equi join condition as
  * BroadcastNestedLoopJoin (fine only while one side broadcasts) or a
  * cartesian product; the reference's conditional join
  * (cpp/include/cudf/join/conditional_join.hpp) is likewise a device
  * nested loop. When BOTH sides are large the scalable reformulation
  * is the classic fixed-grid blocking: intervals explode onto the grid
  * cells they cover (sequence+explode — replication factor is
  * span/cell + 1, chosen by the caller to match interval widths),
  * points land in exactly ONE cell, and the join becomes a hash
  * equi-join on (keys…, cell) with the exact predicate as a residual
  * filter. Because a point owns a single cell, each qualifying pair
  * appears exactly once — no post-join dedup pass.
  */
object IntervalJoin {

  /** Join `points` (micros column `pCol`) to `intervals`
    * ([`loCol`, `hiCol`) half-open, micros) sharing `keyCols`, via
    * `cellMicros`-wide grid cells. Empty intervals (hi ≤ lo) match
    * nothing. Output: all columns of both inputs for qualifying pairs. */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      keyCols: Seq[String], cellMicros: Long): DataFrame = {
    require(cellMicros > 0, "cellMicros must be positive")
    // Floor division (shared helper — see Resample.floorDivExpr):
    // truncation toward zero would double cell 0's width for negative
    // coordinates and with it that cell's candidate fan-out.
    def fdiv(x: String): String = Resample.floorDivExpr(x, cellMicros)
    val p = points.withColumn("__cell", expr(fdiv(pCol)))
    val iv = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__cell", explode(expr(
        s"sequence(${fdiv(loCol)}, ${fdiv(s"$hiCol - 1")})")))
    p.join(iv, keyCols :+ "__cell")
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__cell")
  }

  /** Band join — all (left, right) pairs with |left.`lCol` −
    * right.`rCol`| < `width` (strict, conditional_join.hpp's
    * inequality-pair use-case) as a SCALE-SAFE bucketed equi-join:
    * both sides bucket by floor(value/width); a qualifying pair's
    * buckets differ by at most 1, so the left side replicates into
    * its bucket ±1 (fixed 3× fan-out regardless of data), the right
    * keeps its single bucket, and the join hashes on
    * (keys…, bucket) with the exact band predicate as a residual
    * filter — shuffle-hash/sort-merge, never a nested loop, with
    * both sides free to be arbitrarily large. Each qualifying pair
    * appears exactly once (the right row owns one bucket; the left's
    * three are distinct).
    *
    * Boundary caveat: buckets come from floating-point division, so a
    * value within 1 ulp of a bucket edge can land one bucket off its
    * exact position. A missed pair would need BOTH rows to round
    * across edges in opposite directions simultaneously; integer
    * inputs or power-of-two widths are fully exact. */
  def bandJoin(left: DataFrame, lCol: String, right: DataFrame,
      rCol: String, width: Double, keyCols: Seq[String] = Nil): DataFrame = {
    require(width > 0, "width must be positive")
    val lb = floor(col(lCol) / width).cast("long")
    val l = left.withColumn("__band",
      explode(array(lb - 1, lb, lb + 1)))
    val r = right.withColumn("__band",
      floor(col(rCol) / width).cast("long"))
    l.join(r, (keyCols :+ "__band").toSeq)
      .filter(col(rCol) > col(lCol) - width &&
        col(rCol) < col(lCol) + width)
      .drop("__band")
  }
}
