package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric search / binning helpers (SURVEY.md §2.8 — search.hpp:62,104
  * lower_bound/upper_bound, labeling/label_bins.hpp:61).
  */
object NumericFunctions {

  /** upper_bound (search.hpp:104): number of boundaries <= v, with the
    * sorted boundary list inlined as an array literal — a codegen'd
    * per-row scan, no join. For boundary lists too large to inline,
    * broadcast-join against a boundaries table instead. */
  def searchSorted(v: Column, boundaries: Seq[Double]): Column =
    // null v: every b <= null is null -> filtered -> position 0, the
    // same on both engines (DuckDB list_filter drops null predicates
    // identically); labelBins adds the null->null guard on top
    size(filter(array(boundaries.map(lit): _*), b => b <= v))

  /** Equal-frequency quantile binning (pandas/cudf qcut): bin i is
    * (q_{i-1}, q_i] with interpolated cut points from the data itself.
    * Distributed two-phase form — ONE aggregate computes the k−1 cut
    * points (exact interpolated percentile, a few doubles), which
    * broadcast to a per-row codegen'd scan; no global sort, no ntile
    * single-partition window. Value-equal rows always share a bin
    * (unlike rank-based ntile), matching the reference's label
    * semantics. */
  def qcutBin(v: Column, cuts: Column): Column =
    // null values stay null (pandas/cudf qcut propagates NaN/null);
    // without the guard, `c < null` is null -> otherwise(0) and every
    // null row would silently land in bin 1
    when(v.isNull, lit(null).cast("int"))
      .otherwise(lit(1) + aggregate(cuts, lit(0),
        (acc, c) => acc + when(c < v, 1).otherwise(0)))

  /** label_bins with explicit edges: bin i covers [edge_i, edge_i+1),
    * -1 outside (reference returns null label outside bins). */
  /** Quantile of a SORTED array column under one of the reference's
    * five interpolation strategies (cudf/quantiles.hpp interpolation:
    * LOWER / HIGHER / NEAREST / MIDPOINT / LINEAR). pos = q·(n−1);
    * NEAREST uses floor(pos+0.5) so both engines round identically.
    * All index math is exact doubles over exact element values, so the
    * same formula text in DuckDB hash-matches. */
  def quantileSorted(sorted: Column, q: Double, mode: String): Column = {
    val n = size(sorted)
    val pos = lit(q) * (n.cast("double") - 1)
    val lo = element_at(sorted, (floor(pos) + 1).cast("int"))
    val hi = element_at(sorted, (ceil(pos) + 1).cast("int"))
    val res = mode match {
      case "lower" => lo
      case "higher" => hi
      case "nearest" => element_at(sorted, (floor(pos + 0.5) + 1).cast("int"))
      case "midpoint" => (lo + hi) / 2
      case "linear" => lo + (pos - floor(pos)) * (hi - lo)
      case other => throw new IllegalArgumentException(
        s"unknown interpolation $other")
    }
    // empty array (all-null group): index 0 would THROW in Spark while
    // the SQL mirror returns NULL — make both sides NULL explicitly
    when(n === 0, lit(null)).otherwise(res)
  }

  /** DuckDB SQL mirror of [[quantileSorted]] over a sorted-list column
    * expression — identical formula text, identical arithmetic. */
  def quantileSortedSql(sortedExpr: String, q: Double, mode: String): String = {
    val pos = s"($q * (CAST(len($sortedExpr) AS DOUBLE) - 1))"
    val lo = s"$sortedExpr[CAST(floor($pos) + 1 AS INT)]"
    val hi = s"$sortedExpr[CAST(ceil($pos) + 1 AS INT)]"
    val res = mode match {
      case "lower" => lo
      case "higher" => hi
      case "nearest" => s"$sortedExpr[CAST(floor($pos + 0.5) + 1 AS INT)]"
      case "midpoint" => s"(($lo + $hi) / 2)"
      case "linear" => s"($lo + ($pos - floor($pos)) * ($hi - $lo))"
      case other => throw new IllegalArgumentException(
        s"unknown interpolation $other")
    }
    s"(CASE WHEN len($sortedExpr) = 0 THEN NULL ELSE $res END)"
  }

  def labelBins(v: Column, edges: Seq[Double]): Column = {
    val idx = searchSorted(v, edges) - 1
    // null input -> null label (cudf label_bins), NOT -1: conflating a
    // missing measurement with a genuinely out-of-range one corrupts
    // every downstream group-by on the bin label
    when(v.isNull, lit(null).cast("int"))
      .otherwise(when(idx < 0 || idx >= edges.length - 1, lit(-1))
        .otherwise(idx))
  }
}
