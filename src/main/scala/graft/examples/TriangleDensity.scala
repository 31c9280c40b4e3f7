package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies how triangle counting scales with graph DENSITY — the
  * evidence behind graph_triangles gating on a sparse co-supply slice
  * (SCALING.md): wedge work is Σ_v C(outdeg⁺(v), 2) under the degree
  * orientation, so a near-complete graph (every supplier pair shares
  * SOME part in TPC-H-like data) is inherently ~n³/ engine-independent
  * — the 5× DuckDB replay of the unfiltered graph exhausted an 80 GB
  * spill budget while the sparse slice verifies in seconds. Usage:
  *   runMain graft.examples.TriangleDensity <sfDir>
  * Prints, per quantity-threshold slice: nodes, edges, density,
  * oriented wedge count (the exact join work), triangles, wall time.
  */
object TriangleDensity {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (qmax <- Seq(2.0, 3.0, 6.0, 12.0, 51.0)) {
      val ps = graft.Tables.lineitem(spark, dir)
        .filter($"l_quantity" < qmax)
        .select($"l_partkey".as("pk"), $"l_suppkey".as("sk")).distinct()
      val other = ps.select($"pk".as("pk2"), $"sk".as("sk2"))
      val edges = ps.join(other, $"pk" === $"pk2" && $"sk" < $"sk2")
        .select($"sk".as("src"), $"sk2".as("dst")).distinct()
        .localCheckpoint()
      val e = edges.count()
      val n = edges.select(explode(array($"src", $"dst")).as("id"))
        .distinct().count()
      // oriented out-degrees -> exact wedge-join work
      val und = edges.select(least($"src", $"dst").as("u"),
        greatest($"src", $"dst").as("v"))
      val deg = und.select($"u".as("id")).union(und.select($"v".as("id")))
        .groupBy($"id").agg(count(lit(1)).as("d"))
      val du = deg.select($"id".as("u"), $"d".as("du"))
      val dv = deg.select($"id".as("v"), $"d".as("dv"))
      val wedges = und.join(du, "u").join(dv, "v")
        .select(when($"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v"),
          $"u").otherwise($"v").as("lo"))
        .groupBy($"lo").agg(count(lit(1)).as("od"))
        .agg(sum(($"od" * ($"od" - 1)) / 2).as("w"))
        .as[Double].head().toLong
      val t0 = System.nanoTime()
      val tri = graft.operators.LinkAnalysis
        .triangleStats(edges, "src", "dst")
        .agg(sum($"triangles")).as[Long].head() / 3
      val secs = (System.nanoTime() - t0) / 1e9
      val density = 2.0 * e / (n.toDouble * (n - 1))
      println(f"[tri-density] q<$qmax%.0f: nodes=$n%d edges=$e%d " +
        f"density=$density%.3f wedges=$wedges%d triangles=$tri%d " +
        f"time=$secs%.1fs")
    }
    spark.stop()
  }
}
