package graft.examples

import graft.operators.Salting
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-join evidence harness (SCALING.md joins section): builds a
  * power-law keyed fact (99% of rows on one key), joins it to a
  * dimension with (a) AQE disabled plain shuffle join, (b) AQE skew
  * split, (c) explicit salting — and prints the timings. Run:
  *   sbt "runMain graft.examples.SkewDemo [rows]"
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // 99% of the fact hits key 0; dimension has 100 keys.
    val fact = spark.range(n)
      .withColumn("key", when(rand(42) < 0.99, 0L).otherwise(pmod(col("id"), lit(100L))))
      .withColumn("payload", col("id") * 2)
    val dim = spark.range(100).select(col("id").as("key"),
      concat(lit("dim_"), col("id")).as("name"))
    fact.cache().count(); dim.cache().count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($rows rows)")
    }

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("plain shuffle join (no AQE)") {
      fact.join(dim, "key").count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    time("AQE skew-split join") {
      fact.join(dim, "key").count()
    }
    time("salted join (n=8)") {
      Salting.saltedJoin(fact, dim, "key", n = 8).count()
    }
    spark.stop()
  }
}
