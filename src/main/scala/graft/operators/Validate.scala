package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audit — the constraint-checking stage a production
  * ingest pipeline runs BEFORE anything downstream trusts a table
  * (Deequ/Great-Expectations shape, re-expressed as plain aggregates so
  * Catalyst fuses every metric into ONE pass over the data).
  *
  * Scale design: [[profile]] computes all per-column metrics in a
  * single Aggregate (one scan, no per-metric jobs; approx distinct via
  * HLL so no per-column shuffle of value universes), and
  * [[orphanKeys]] is a broadcast-capable left-anti join. Both emit
  * METRICS frames, not pass/fail booleans — thresholds belong to the
  * caller; [[checkRows]] turns rule columns into a per-rule violation
  * count the same single-pass way.
  */
object Validate {

  /** One row per audited column: nulls, distinct count, min/max (as
    * strings, so heterogeneous column types stack in one frame).
    * `exact = false` (the 100 TB default) estimates distincts with HLL
    * — every metric then fuses into one shuffle-free scan; `exact =
    * true` uses true COUNT(DISTINCT) (Spark plans an Expand: one scan,
    * k-fold row multiplication — fine for a bounded audit column set,
    * and what the cross-engine gate pins). */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = false): DataFrame = {
    val metrics = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(metrics.head, metrics.tail: _*)
    // unpivot driver-side over the SINGLE collected metrics row — the
    // scan stays distributed; only the k-column summary crosses
    val r = one.head()
    val rows = cols.map { c =>
      (c, r.getAs[Long]("__rows"), r.getAs[Long](s"__nulls_$c"),
        r.getAs[Long](s"__dist_$c"),
        Option(r.getAs[String](s"__min_$c")).orNull,
        Option(r.getAs[String](s"__max_$c")).orNull)
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("col_name", "n_rows", "n_nulls", "n_distinct",
        "min_str", "max_str")
  }

  /** Join-key skew profile — the pre-join diagnosis that decides
    * between a plain shuffle join, broadcast, and salting
    * ([[Salting]]): distribution of per-key group sizes (count
    * quantiles + max) plus the top heavy keys. One key-keyed count
    * (map-side partial), then a tiny aggregate over group sizes and a
    * partial top-k — the raw table is scanned once; nothing
    * driver-side but the k-row report. A `p99 ≪ max` gap is the skew
    * signature: one salted key, not a uniformly heavy distribution. */
  def joinKeyProfile(df: DataFrame, keyCol: String,
      topK: Int = 5): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val dist = counts.agg(
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile(cnt, 0.5)").as("p50"),
      expr("percentile(cnt, 0.99)").as("p99"))
    val heavy = counts
      .orderBy(col("cnt").desc, col(keyCol).cast("string"))
      .limit(topK)
      .select(col(keyCol).cast("string").as("heavy_key"), col("cnt"))
    heavy.crossJoin(broadcast(dist))
      .select(col("heavy_key"), col("cnt").as("heavy_cnt"),
        col("n_keys"), col("max_cnt"), col("p50"), col("p99"))
  }

  /** Per-rule violation counts, all rules in one pass: each rule is a
    * boolean Column that should hold for every row. */
  def checkRows(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, pred) =>
      count(when(!coalesce(pred, lit(false)), 1)).as(name)
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    df.sparkSession
      .createDataFrame(rules.zipWithIndex.map { case ((name, _), i) =>
        (name, r.getLong(i))
      })
      .toDF("rule", "violations")
  }

  /** Referential integrity: child keys with no parent — rows of `child`
    * whose `childKey` finds no `parentKey`. Null child keys are NOT
    * orphans (SQL FK semantics); count them via [[profile]] instead. */
  def orphanKeys(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
}
