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
    size(filter(array(boundaries.map(lit): _*), b => b <= v))

  /** label_bins with explicit edges: bin i covers [edge_i, edge_i+1),
    * -1 outside (reference returns null label outside bins). */
  def labelBins(v: Column, edges: Seq[Double]): Column = {
    val idx = searchSorted(v, edges) - 1
    when(idx < 0 || idx >= edges.length - 1, lit(-1)).otherwise(idx)
  }
}
