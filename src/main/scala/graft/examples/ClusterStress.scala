package graft.examples

import org.apache.spark.sql.SparkSession

/** Adversarial stress for `Dedup.nearDupClusters` backing SCALING.md's
  * O(log d) claim: one 10^6-edge STAR (diameter 2 — the hot-hub shape a
  * boilerplate segment produces) unioned with one LONG CHAIN (diameter
  * 4096 — the worst case for label propagation, where plain min-label
  * flooding would need d rounds and pointer jumping needs ~log2 d).
  * Prints measured rounds + wall time; run:
  *
  *   sbt "runMain graft.examples.ClusterStress"
  */
object ClusterStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val starEdges = 1000000L
    val chainLen = 4096L
    // star: hub 0 — spokes 1..10^6; chain: 2e6+i — 2e6+i+1
    val star = spark.range(1, starEdges + 1)
      .select(org.apache.spark.sql.functions.lit(0L).as("id_a"),
        $"id".as("id_b"))
    val chain = spark.range(0, chainLen)
      .select(($"id" + 2000000L).as("id_a"), ($"id" + 2000001L).as("id_b"))
    val pairs = star.union(chain)

    val t0 = System.nanoTime()
    val (labels, converged, rounds) =
      graft.operators.Dedup.nearDupClustersWithStatus(pairs, maxIter = 20)
    val clusters = labels.groupBy("cluster").count().collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val starSize = clusters.find(_.getLong(0) == 0L).map(_.getLong(1))
    val chainSize = clusters.find(_.getLong(0) == 2000000L).map(_.getLong(1))
    println(f"[cluster-stress] edges=${starEdges + chainLen} " +
      f"converged=$converged rounds=$rounds time=$secs%.1fs " +
      s"clusters=${clusters.length} star=$starSize chain=$chainSize")
    assert(converged, "did not converge")
    assert(clusters.length == 2, s"expected 2 components, got ${clusters.length}")
    assert(starSize.contains(starEdges + 1))
    assert(chainSize.contains(chainLen + 1))
    spark.stop()
  }
}
