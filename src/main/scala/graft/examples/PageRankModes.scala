package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures pageRank exact (dyadic fixed-point, oracle-replayable)
  * vs production (plain double) summation on the purchase graph —
  * the evidence behind `exact: Boolean = false` being the default
  * (SCALING.md): the decimal casts cost per EDGE per ITERATION, while
  * the consumable output (rank ordering) is insensitive to sub-ulp
  * summation drift. Usage:
  *   runMain graft.examples.PageRankModes <sfDir> [iters]
  * Prints per-mode wall time, per-iteration delta, and the max
  * |rank_exact − rank_prod| / top-rank-gap ratio (how far drift is
  * from ever flipping an ordering).
  */
object PageRankModes {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir), $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
    def time(exact: Boolean): (Double, Array[(Long, Double)]) = {
      val t0 = System.nanoTime()
      val r = graft.operators.LinkAnalysis
        .pageRank(edges, "src", "dst", 0.85, iters, exact)
        .orderBy($"id").collect().map(x => (x.getLong(0), x.getDouble(1)))
      ((System.nanoTime() - t0) / 1e9, r)
    }
    time(exact = true) // warm up JVM/codegen on the heavier path
    val (tExact, rExact) = time(exact = true)
    val (tProd, rProd) = time(exact = false)
    val drift = rExact.zip(rProd).map { case ((_, a), (_, b)) =>
      math.abs(a - b) }.max
    val sorted = rExact.map(_._2).sorted(Ordering[Double].reverse)
    val topGap = sorted.sliding(2).map(p => p(0) - p(1))
      .filter(_ > 0).min
    println(f"[pagerank-modes] dir=$dir iters=$iters nodes=${rExact.length}")
    println(f"[pagerank-modes] exact=${tExact}%.2fs prod=${tProd}%.2fs " +
      f"saving=${(tExact - tProd) / iters}%.3fs/iter " +
      f"(${100 * (tExact - tProd) / tExact}%.1f%%)")
    println(f"[pagerank-modes] max|drift|=$drift%.3e min-positive-rank-gap=" +
      f"$topGap%.3e ratio=${drift / topGap}%.2e")
    spark.stop()
  }
}
