package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.plans.GraftExpressions.fastDecimal

/** Same-JVM interleaved A/B for the exact-decimal quantization kernel
  * (round-17 item #1): `sum(cast(x as decimal))` (the round-16 dsum)
  * vs `sum(fast_decimal(x))` on the three shapes VERDICT named — q1
  * (8 exact aggregates, group-by), q6 (filter + 1 aggregate), and the
  * corr-matrix moment shape (k(k+1)/2 + k product sums at (38,6)).
  * Arms alternate in both orders; min-over-runs is the plan cost.
  * Timed action is the noop sink (guide §1.4). Runs against the 10x
  * TPC-H copy when present (arg 1), else sf0.1.
  */
object DecimalAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_tpch10x_sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    // warm the column chunks
    li.agg(li.columns.map(c => count(col(c)).as(c)).head,
      li.columns.map(c => count(col(c)).as(c)).tail: _*).collect()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def dsumOld(c: org.apache.spark.sql.Column, s: Int) =
      sum(c.cast(DecimalType(18, s))).cast("double")
    def dsumNew(c: org.apache.spark.sql.Column, s: Int) =
      sum(fastDecimal(c, 18, s)).cast("double")
    def msumOld(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 6))).cast("double")
    def msumNew(c: org.apache.spark.sql.Column) =
      sum(fastDecimal(c, 38, 6)).cast("double")

    def q1(ds: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column) =
      li.filter($"l_shipdate" <= lit("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(ds($"l_quantity", 2).as("sum_qty"),
          ds($"l_extendedprice", 2).as("sum_base_price"),
          ds($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("sum_disc_price"),
          ds($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6)
            .as("sum_charge"),
          (ds($"l_quantity", 2) / count(lit(1))).as("avg_qty"),
          (ds($"l_extendedprice", 2) / count(lit(1))).as("avg_price"),
          (ds($"l_discount", 6) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))

    def q6(ds: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column) =
      li.filter($"l_shipdate" >= lit("1994-01-01") && $"l_shipdate" < lit("1995-01-01")
          && $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(ds($"l_extendedprice" * $"l_discount", 6).as("revenue"))

    def corrShape(ms: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val cs = Seq($"l_quantity", $"l_extendedprice", $"l_discount")
      val sums = cs.zipWithIndex.map { case (c, i) => ms(c.cast("double")).as(s"s$i") }
      val prods = for { i <- cs.indices; j <- i until cs.size }
        yield ms(cs(i).cast("double") * cs(j).cast("double")).as(s"p${i}_$j")
      li.agg(count(lit(1)).as("n"), (sums ++ prods): _*)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmups
    noop(q1(dsumOld)); noop(q1(dsumNew))
    val buf = collection.mutable.Map[String,
      collection.mutable.ArrayBuffer[Double]]().withDefault(_ =>
      collection.mutable.ArrayBuffer.empty[Double])
    def rec(k: String, v: Double): Unit = {
      val b = buf(k); b += v; buf(k) = b
    }
    for (r <- 1 to rounds) {
      val arms: Seq[(String, () => Unit)] = Seq(
        "q1_old" -> (() => rec("q1_old", time(noop(q1(dsumOld))))),
        "q1_new" -> (() => rec("q1_new", time(noop(q1(dsumNew))))),
        "q6_old" -> (() => rec("q6_old", time(noop(q6(dsumOld))))),
        "q6_new" -> (() => rec("q6_new", time(noop(q6(dsumNew))))),
        "corr_old" -> (() => rec("corr_old", time(noop(corrShape(msumOld))))),
        "corr_new" -> (() => rec("corr_new", time(noop(corrShape(msumNew))))))
      val order = if (r % 2 == 0) arms.grouped(2).flatMap(_.reverse).toSeq else arms
      order.foreach(_._2())
    }
    // result equality spot check (bitwise)
    val a = q1(dsumOld).orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    val b = q1(dsumNew).orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    println(s"q1 results identical: ${a == b}")
    buf.toSeq.sortBy(_._1).foreach { case (k, vs) =>
      println(f"$k%-9s ${vs.map(v => f"$v%.3f").mkString(", ")} | min ${vs.min}%.3f")
    }
    spark.stop()
  }
}
