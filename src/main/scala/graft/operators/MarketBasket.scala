package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Market-basket co-occurrence mining: pairwise association rules
  * (support / confidence / lift) over item sets grouped by a basket
  * key — the classic retail-affinity and event-co-occurrence analysis
  * (extends the reference's aggregation surface; libcudf ships groupby
  * but no rule mining).
  *
  * Scale shape: presence is established by ONE distinct over
  * (basket, item) — map-side combined, the only pass over raw rows.
  * Pair candidates come from a self-equi-join on the basket key, so
  * per-basket work is |items|², bounded by basket width (itemsets in
  * practice are tens of items), never by corpus size; a hot basket is
  * a data-quality signal, not a plan hazard ([[Validate.joinKeyProfile]]
  * diagnoses it). All three metrics are exact integer-numerator
  * rationals: counts multiply inside DECIMAL(38,0) and cross to double
  * once (correctly-rounded in both engines), then a single IEEE
  * division — no order-dependent float sum anywhere, so results are
  * bit-reproducible and DuckDB-replayable.
  */
object MarketBasket {

  /** Pairwise rules over distinct items per basket. Output one row per
    * unordered item pair (a < b): `item_a, item_b, n_baskets, c_a, c_b,
    * c_ab, support, conf_a_b, conf_b_a, lift`. `minCount` filters pairs
    * by absolute co-occurrence count (an exact integer threshold — the
    * fractional-support cut is minCount = ceil(minSupport · n), kept
    * integral so both engines cut identically). */
  def associationRules(df: DataFrame, basketCols: Seq[String],
      itemCol: String, minCount: Long = 1L): DataFrame = {
    require(basketCols.nonEmpty, "need at least one basket key column")
    require(minCount >= 1, "minCount must be >= 1")
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val keys = basketCols.map(col)
    val baskets = df
      .filter(col(itemCol).isNotNull &&
        basketCols.map(col(_).isNotNull).reduce(_ && _))
      .select((keys :+ col(itemCol).as("item")): _*)
      .distinct()
    val nBaskets = baskets.select(keys: _*).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = baskets.groupBy(col("item"))
      .agg(count(lit(1)).as("c_item"))
    val left = baskets.toDF(basketCols :+ "item_a": _*)
    val right = baskets.toDF(basketCols :+ "item_b": _*)
    val pairCounts = left.join(right, basketCols)
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    pairCounts
      .join(broadcast(itemCounts.select(col("item").as("item_a"),
        col("c_item").as("c_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("item").as("item_b"),
        col("c_item").as("c_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_baskets"),
        col("c_a"), col("c_b"), col("c_ab"),
        (col("c_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("c_ab").cast("double") / col("c_a").cast("double"))
          .as("conf_a_b"),
        (col("c_ab").cast("double") / col("c_b").cast("double"))
          .as("conf_b_a"),
        ((dec(col("c_ab")) * dec(col("n_baskets"))).cast("double") /
          (dec(col("c_a")) * dec(col("c_b"))).cast("double")).as("lift"))
  }
}
