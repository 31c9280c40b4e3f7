package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** UDF / UDAF surface (SURVEY.md §2.12 — transform.hpp:121 PTX/CUDA
  * elementwise UDFs, aggregation.hpp:107-109 HOST_UDF agg kinds,
  * host_udf.hpp). The Spark-native equivalents: `udf()` for elementwise
  * (used sparingly — built-ins are codegen'd, UDFs are not) and
  * `Aggregator[IN, BUF, OUT]` for custom aggregation kinds with partial
  * merge (the same chunkwise-partial → merge → final decomposition the
  * reference's streaming groupby uses).
  */
object Udfs {

  /** PRODUCT aggregation kind (aggregation.hpp:80) — Spark has no
    * product aggregate; mergeable Aggregator with a multiplicative
    * monoid buffer. */
  object ProductAgg extends Aggregator[Double, Double, Double] {
    override def zero: Double = 1.0
    override def reduce(b: Double, a: Double): Double = b * a
    override def merge(b1: Double, b2: Double): Double = b1 * b2
    override def finish(b: Double): Double = b
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Geometric mean via (count, sum-of-logs) buffer — the canonical
    * two-field partial-aggregation shape. */
  object GeoMeanAgg extends Aggregator[Double, (Long, Double), Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: Double): (Long, Double) =
      (b._1 + 1, b._2 + math.log(a))
    override def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Double)): Double =
      if (b._1 == 0) Double.NaN else math.exp(b._2 / b._1)
    override def bufferEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Registers the UDAFs for SQL use (spark.udf surface). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("product_agg", udaf(ProductAgg))
    spark.udf.register("geomean_agg", udaf(GeoMeanAgg))
  }
}
