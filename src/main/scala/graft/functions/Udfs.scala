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
    * monoid buffer. Input is boxed so NULL rows are SKIPPED like every
    * built-in SQL aggregate (a primitive Double input would either
    * fail deserialization on null or poison the product with 0.0). */
  object ProductAgg extends Aggregator[java.lang.Double, Double, Double] {
    override def zero: Double = 1.0
    override def reduce(b: Double, a: java.lang.Double): Double =
      if (a == null) b else b * a.doubleValue()
    override def merge(b1: Double, b2: Double): Double = b1 * b2
    override def finish(b: Double): Double = b
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Geometric mean via (count, sum-of-logs) buffer — the canonical
    * two-field partial-aggregation shape. */
  object GeoMeanAgg extends Aggregator[java.lang.Double, (Long, Double), Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), a: java.lang.Double): (Long, Double) =
      if (a == null) b else (b._1 + 1, b._2 + math.log(a.doubleValue()))
    override def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Double)): Double =
      if (b._1 == 0) Double.NaN else math.exp(b._2 / b._1)
    override def bufferEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Element-wise mean of equal-length double vectors — the centroid
    * update of k-means (Similarity.kmeansCentroids) — with an EXACT,
    * order-independent accumulator: each element is quantized to
    * fixed-point (floor(x·2^40), exact: a power-of-two scale is an
    * exponent shift and floor is exact) and summed in Long, so the
    * trained model is bit-identical on every run, any partitioning,
    * and any engine — a SQL oracle replays the same integer
    * arithmetic. The mean is (sum.toDouble / 2^40) / count:
    * Long→Double and the count division are correctly rounded
    * identically everywhere, the 2^40 division is exact. Partial
    * buffers stay one (sum-vector, count) per group per partition —
    * k×dim longs, never the corpus. Math.addExact fails loudly if a
    * cell's accumulated magnitude reaches 2^63 (≈ 8M unit-scale
    * members per cell); train coarse quantizers on a sample beyond
    * that, as reference IVF trainers do. */
  object VectorMeanFixedAgg
      extends Aggregator[Seq[Double], (Array[Long], Long), Seq[Double]] {
    final val ScaleBits = 40
    final val Scale: Long = 1L << ScaleBits
    override def zero: (Array[Long], Long) = (Array.empty, 0L)
    override def reduce(b: (Array[Long], Long),
        a: Seq[Double]): (Array[Long], Long) = {
      val s = if (b._1.isEmpty) new Array[Long](a.length) else b._1
      var i = 0
      while (i < a.length) {
        s(i) = Math.addExact(s(i), math.floor(a(i) * Scale).toLong)
        i += 1
      }
      (s, b._2 + 1)
    }
    override def merge(a: (Array[Long], Long),
        b: (Array[Long], Long)): (Array[Long], Long) = {
      if (a._1.isEmpty) b
      else if (b._1.isEmpty) a
      else {
        var i = 0
        while (i < a._1.length) {
          a._1(i) = Math.addExact(a._1(i), b._1(i)); i += 1
        }
        (a._1, a._2 + b._2)
      }
    }
    override def finish(b: (Array[Long], Long)): Seq[Double] =
      if (b._2 == 0) Seq.empty
      else b._1.map(x => x.toDouble / Scale / b._2).toSeq
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    override def bufferEncoder: Encoder[(Array[Long], Long)] =
      ExpressionEncoder[(Array[Long], Long)]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Registers the UDAFs for SQL use (spark.udf surface). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("product_agg", udaf(ProductAgg))
    spark.udf.register("geomean_agg", udaf(GeoMeanAgg))
  }
}
