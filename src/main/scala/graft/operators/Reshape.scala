package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reshape façades (SURVEY.md §2.9 — reshape.py melt/pivot/crosstab/
  * get_dummies, transpose.hpp:39).
  */
object Reshape {

  /** get_dummies / one_hot_encode (reshape.py:784, transform.hpp:384):
    * one indicator column per category value. Values must be enumerated
    * (or discovered first) — at scale pass them explicitly to avoid a
    * discovery pass. */
  /** Plan-width guard for the column-exploding reshapes ([[oneHot]],
    * [[crosstab]]): each listed value becomes a PHYSICAL COLUMN, so the
    * category domain must be schema-bounded (get_dummies' contract in
    * the reference too — a 1M-category column is a join against a code
    * table, not a reshape). Past ~4k columns Spark's codegen and
    * optimizer walk the schema superlinearly; fail loudly instead. */
  val MaxReshapeWidth = 4096

  def oneHot(df: DataFrame, col0: String, values: Seq[String],
      maxWidth: Int = MaxReshapeWidth): DataFrame = {
    require(values.size <= maxWidth,
      s"oneHot would add ${values.size} columns (> $maxWidth): a domain " +
        "this wide should be encoded (joined against a code table), not " +
        "widened into the schema; raise maxWidth only for bounded domains")
    values.foldLeft(df) { (d, v) =>
      d.withColumn(s"${col0}_$v", when(col(col0) === v, 1).otherwise(0))
    }
  }

  /** crosstab (reshape.py:1543) — counts of a × b with the b-values
    * enumerated explicitly, like [[oneHot]]. `stat.crosstab` was rejected
    * here: it materializes the distinct-value matrix on the driver, a
    * driver-OOM at 100 TB with high-cardinality columns. With explicit
    * values this is one hash-shuffled groupBy + a codegen'd pivot —
    * fully distributed, column count fixed up front. */
  def crosstab(df: DataFrame, a: String, b: String,
      bValues: Seq[String], maxWidth: Int = MaxReshapeWidth): DataFrame = {
    require(bValues.size <= maxWidth,
      s"crosstab would pivot ${bValues.size} columns (> $maxWidth): " +
        "keep the b-domain schema-bounded (group by (a, b) and keep it " +
        "long otherwise); raise maxWidth only for bounded domains")
    df.groupBy(col(a).cast("string").as(s"${a}_$b"))
      .pivot(b, bValues)
      .count()
      .na.fill(0L, bValues)
  }

  /** interleave_columns (cudf/reshape.hpp:51): columns a,b,… become one
    * column with values alternating row-wise (a₀,b₀,a₁,b₁,…). The
    * explicit (row id, position) keys keep the interleaving order
    * deterministic under any partitioning. */
  def interleave(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame =
    df.select(col(idCol),
        posexplode(array(cols.map(col): _*)).as(Seq("pos", "value")))

  /** tile (cudf/reshape.hpp:77): repeat the whole table `count` times.
    * Cross join with a range — distributed, no data movement beyond the
    * broadcasted tiny range side. */
  def tile(df: DataFrame, count: Int): DataFrame = {
    require(count >= 0, "tile count must be >= 0")
    df.crossJoin(broadcast(
      df.sparkSession.range(count.toLong).select(col("id").as("__tile"))))
      .drop("__tile")
  }

  /** repeat with a per-row count column (cudf/filling.hpp:90): each row
    * appears `countCol` times with a 0-based `rep` index; rows with
    * count <= 0 are dropped (the reference errors on negatives — here
    * they behave as 0, documented). Pure map-side explode, no shuffle.
    * Guarded: Spark's sequence(0, -1) DESCENDS, hence the explicit
    * empty-array branch. */
  def repeatRows(df: DataFrame, countCol: org.apache.spark.sql.Column,
      repCol: String = "rep"): DataFrame =
    // LONG sequence: an int cast would silently wrap counts past
    // Int.MaxValue (2147483653 -> 5) or descend on negatives; with
    // longs the guard sees the true value and Spark's own sequence
    // length check fails loudly on absurd counts.
    df.withColumn(repCol, explode(
      when(countCol.cast("long") >= 1L,
        sequence(lit(0L), countCol.cast("long") - 1))
        .otherwise(array().cast("array<bigint>"))))

  /** transpose (transpose.hpp:39) — rows↔columns for a BOUNDED frame
    * (the reference's transpose is also a full-materialization op; at
    * scale this only makes sense on small aggregated outputs).
    * Implemented as unpivot → pivot on the given id column. */
  def transpose(df: DataFrame, idCol: String): DataFrame = {
    val valueCols = df.columns.filterNot(_ == idCol)
    // numeric-only contract: the unpivot casts to double, which would
    // silently null every value of a string column; fail loudly instead.
    // idCol values must also be unique — pivot keeps first(val) per cell.
    valueCols.foreach { c =>
      require(df.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"transpose needs numeric value columns, got $c: " +
          df.schema(c).dataType)
    }
    val long = df.unpivot(Array(col(idCol)),
      valueCols.map(c => col(c).cast("double")), "metric", "val")
    long.groupBy(col("metric")).pivot(idCol).agg(first(col("val")))
  }
}
