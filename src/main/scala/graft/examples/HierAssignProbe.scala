package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures flat vs hierarchical cell assignment at a SemDeDup-realistic
  * cell count (the SCALING.md "Known scale caveats" remedy): builds a
  * synthetic clustered corpus, trains NO model (centroids are exact
  * cluster directions — assignment cost is what's probed, not Lloyd),
  * then times `Similarity.assignCells` (O(n·K) dots) against
  * `Similarity.assignCellsHierarchical` (O(n·(√K + p·√K)) dots) over
  * the same frame, and prints the agreement fraction between the two.
  *
  * Usage: runMain graft.examples.HierAssignProbe [nVecs] [dim] [k] [superProbes]
  * Defaults: 200000 vectors, dim 16, K 4096, superProbes 2. The printed
  * wall times and agreement are the SCALING.md hierarchical-assignment
  * evidence.
  */
object HierAssignProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val dim = if (args.length > 1) args(1).toInt else 16
    val k = if (args.length > 2) args(2).toInt else 4096
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("hier-assign-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // deterministic clustered corpus: K unit-ish directions, n points
    val rnd = new scala.util.Random(7)
    val dirs = Array.fill(k)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val cents = dirs.zipWithIndex
      .map { case (v, i) => (i, v.map(_.toDouble)) }.toSeq
      .toDF("cell_id", "c_vec")
    val pts = spark.range(n.toLong).select($"id".as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => (pmod(hash($"id", d), lit(1000)) - 500).cast("float") / 100f +
            element_at(
              // home cluster = id mod k; its direction enters as a
              // plan literal array lookup (getItem below is 0-based)
              typedLit(dirs.map(_.toSeq).toSeq), ($"id" % k).cast("int") + 1)
              (d.cast("int")) * 10f)
          .as("embedding"))
      .cache()
    pts.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val superProbes = if (args.length > 3) args(3).toInt else 2
    val flat = time(s"flat assignment (n=$n, K=$k)") {
      graft.operators.Similarity.assignCells(pts, "embedding", cents)
        .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toMap
    }
    val hier = time(s"hierarchical assignment (superProbes=$superProbes)") {
      graft.operators.Similarity
        .assignCellsHierarchical(pts, "embedding", cents,
          superProbes = superProbes)
        .select($"vec_id", $"cell_id").as[(Long, Int)].collect().toMap
    }
    val agree = hier.count { case (id, c) => flat.get(id).contains(c) }
    println(f"agreement: $agree/${hier.size} " +
      f"(${agree.toDouble / hier.size}%.4f)")
    spark.stop()
  }
}
