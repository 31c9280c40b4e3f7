package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Point-in-interval range join as a FULL custom-operator stack
  * (SURVEY.md §7 preference (c): LogicalPlan + SparkStrategy + SparkPlan,
  * registered via extraStrategies / SparkSessionExtensions).
  *
  * Semantics: left row joins every right row with lo <= value < hi.
  * Spark's built-in planning for this predicate shape is a nested-loop
  * join (O(|L|·|R|) comparisons); this operator broadcasts the interval
  * table sorted by lo and probes with a per-row binary search —
  * O(|L|·log|R| + matches) with the right side dimension-sized, the same
  * regime the reference's conditional join targets
  * (cpp/include/cudf/join/conditional_join.hpp:72).
  *
  * Production note: candidate pruning is by lo only (scan up to the
  * upper bound); an interval tree would prune by hi too. The point here
  * is the end-to-end extension stack, kept readable.
  */
case class RangeJoin(left: LogicalPlan, right: LogicalPlan,
    value: Expression, lo: Expression, hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): RangeJoin = copy(left = l, right = r)
}

case class RangeJoinExec(left: SparkPlan, right: SparkPlan,
    value: Expression, lo: Expression, hi: Expression) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    // Build side: collect + sort by lo, broadcast (dimension-sized).
    // Rows with a null bound can never satisfy lo <= v < hi (SQL
    // comparisons with null are false), so drop them at build.
    val intervals = right.executeCollect().flatMap { r =>
      val lo0 = loB.eval(r)
      val hi0 = hiB.eval(r)
      if (lo0 == null || hi0 == null) None
      else Some((RangeJoinExec.toDouble(lo0), RangeJoinExec.toDouble(hi0),
        r.copy()))
    }.sortBy(_._1)
    val bc = sparkContext.broadcast(intervals)
    val out = output
    val leftOut = left.output
    val valueExpr = value
    left.execute().mapPartitions { iter =>
      val vB = BindReferences.bindReference(valueExpr, leftOut)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(out, out)
      val ivs = bc.value
      iter.flatMap { lrow =>
        val v0 = vB.eval(lrow)
        if (v0 == null) Iterator.empty
        else {
          val v = RangeJoinExec.toDouble(v0)
          // binary search: first index with lo > v
          var a = 0; var b = ivs.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (ivs(m)._1 <= v) a = m + 1 else b = m
          }
          val upper = a
          (0 until upper).iterator
            // Spark SQL comparison semantics, not Java: NaN compares
            // GREATER than every double, so a NaN hi bound admits all
            // values (v < NaN is true in SQL, false in Java)
            .filter(i => ivs(i)._2 > v || (ivs(i)._2.isNaN && !v.isNaN))
            .map(i => proj(joined(lrow, ivs(i)._3)))
        }
      }
    }
  }
}

object RangeJoinExec {
  /** Numeric-to-double for the comparison space. Decimal is NOT a
    * java.lang.Number in Spark, so a bare Number cast would crash on
    * DECIMAL columns (TPC-H money). Caveat (documented): comparisons
    * run in double space, so integral keys beyond 2^53 can land on the
    * wrong side of a bound — keep range keys within double precision
    * (timestamps-as-micros at current epochs are fine: ~2^51). */
  def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
  }
}

object RangeJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, v, lo, hi) =>
      RangeJoinExec(planLater(l), planLater(r), v, lo, hi) :: Nil
    case _ => Nil
  }
}

object RangeJoin {
  /** Column-name API: left's `valueCol` probed against right's
    * [loCol, hiCol) intervals. Installs the strategy on first use. */
  def rangeJoin(left: DataFrame, right: DataFrame,
      valueCol: String, loCol: String, hiCol: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Self-join / shared-lineage guard: duplicate exprIds across the two
    // sides would make output carry each attribute twice, and binding
    // the projection would resolve BOTH copies to the left ordinal —
    // silently repeating left values in the right-half columns. Spark's
    // analyzer dedups built-in Joins; this custom node must do it itself.
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rPlan0.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
          rPlan0)
      else rPlan0
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output}"))
    def numeric(a: Attribute): Attribute = {
      if (!a.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
        throw new IllegalArgumentException(
          s"rangeJoin column ${a.name} must be numeric, got ${a.dataType}")
      a
    }
    ColumnBridge.ofRows(spark,
      RangeJoin(lPlan, rPlan, numeric(attr(lPlan, valueCol)),
        numeric(attr(rPlan, loCol)), numeric(attr(rPlan, hiCol))))
  }
}
