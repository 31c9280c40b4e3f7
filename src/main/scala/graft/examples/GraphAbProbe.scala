package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Checkpoints

/** Same-JVM interleaved A/B between the ROUND-15 graph loops (inlined
  * verbatim below) and the round-16 operators in LinkAnalysis/Dedup —
  * the measurement harness behind OPTIMIZATION_r16.md's graph rows.
  * Arms alternate in both orders so warmup and co-tenant noise hit
  * both equally; min-over-runs is the plan cost (the bench's rule).
  */
object GraphAbProbe {
  private val Two45 = 35184372088832.0
  private def psum(c: org.apache.spark.sql.Column) =
    sum(floor(c * lit(Two45)).cast(DecimalType(38, 0)))
      .cast("double") / lit(Two45)

  /** round-15 pageRank, verbatim: persisted dangling frame + per-
    * iteration semi-join, separate nodes frame joined per iteration,
    * explicit repartition(src) on the annotated edges. */
  def prOld(edges: DataFrame, damping: Double, iters: Int): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist()
    val n = nodes.count()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val danglingNodes = nodes
      .join(outdeg, nodes("id") === outdeg("src"), "left_anti")
      .persist()
    val ed = e.join(outdeg, "src").repartition(col("src")).persist()
    ed.count()
    danglingNodes.count()
    e.unpersist()
    val base = (1.0 - damping) / n
    var ranks = nodes.withColumn("r", lit(1.0 / n))
    var lastCkpt: DataFrame = null
    for (_ <- 1 to iters) {
      val dangling = ranks
        .join(danglingNodes, Seq("id"), "left_semi")
        .agg(coalesce(psum(col("r")), lit(0.0)).as("mass"))
      val contribs = ed
        .join(ranks, ed("src") === ranks("id"))
        .select(col("dst"), (col("r") / col("deg")).as("c"))
        .groupBy(col("dst")).agg(psum(col("c")).as("contrib"))
      ranks = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(nodes("id"),
          (lit(base) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) +
              col("mass") / lit(n.toDouble))).as("r"))
        .transform(Checkpoints.cut)
      if (lastCkpt != null)
        org.apache.spark.sql.graftshim.CheckpointUtil.free(lastCkpt)
      lastCkpt = ranks
    }
    nodes.unpersist(); danglingNodes.unpersist(); ed.unpersist()
    ranks
  }

  /** round-15 components, verbatim: unpartitioned edge frame, no join
    * hints, convergence via a join back against the round-start
    * labels. */
  def ccOld(pairs: DataFrame, maxIter: Int): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .transform(Checkpoints.cut)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .transform(Checkpoints.cut)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("cluster")).as("nbr_min"))
      val propagated = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster")))
            .as("cluster"))
        .transform(Checkpoints.cut)
      val jumped = propagated.as("x")
        .join(propagated.select(col("id").as("jid"), col("cluster").as("jc")),
          col("x.cluster") === col("jid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("jc"), col("x.cluster")).as("cluster"))
        .transform(Checkpoints.cut)
      converged = jumped.as("u").join(labels.as("l"), "id")
        .filter(col("u.cluster") =!= col("l.cluster")).isEmpty
      org.apache.spark.sql.graftshim.CheckpointUtil.free(labels)
      org.apache.spark.sql.graftshim.CheckpointUtil.free(propagated)
      labels = jumped
      i += 1
    }
    org.apache.spark.sql.graftshim.CheckpointUtil.free(edges)
    labels
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def prEdges() = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
    def ccPairs() = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .filter($"l_quantity" < 1.5)
      .select(($"o_custkey" * 2).as("id_a"), ($"l_suppkey" * 2 + 1).as("id_b"))
      .distinct()
    // warmups (both paths, short)
    graft.operators.LinkAnalysis.pageRank(prEdges(), "src", "dst", 0.85, 2,
      exact = true).count()
    prOld(prEdges(), 0.85, 2).count()
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val (prO, prN) = (collection.mutable.ArrayBuffer.empty[Double],
      collection.mutable.ArrayBuffer.empty[Double])
    val (ccO, ccN) = (collection.mutable.ArrayBuffer.empty[Double],
      collection.mutable.ArrayBuffer.empty[Double])
    for (r <- 1 to rounds) {
      val flip = r % 2 == 0
      val arms: Seq[() => Unit] = Seq(
        () => prO += time(prOld(prEdges(), 0.85, 5).count()),
        () => prN += time(graft.operators.LinkAnalysis
          .pageRank(prEdges(), "src", "dst", 0.85, 5, exact = true).count()),
        () => ccO += time(ccOld(ccPairs(), 10).count()),
        () => ccN += time(graft.operators.Dedup
          .nearDupClusters(ccPairs(), 10).count()))
      val order = if (flip) Seq(1, 0, 3, 2) else Seq(0, 1, 2, 3)
      order.foreach(i => arms(i)())
    }
    def fmt(xs: Seq[Double]) =
      xs.map(x => f"$x%.2f").mkString(", ") + f" | min ${xs.min}%.2f"
    println(s"PR r15: ${fmt(prO.toSeq)}")
    println(s"PR r16: ${fmt(prN.toSeq)}")
    println(s"CC r15: ${fmt(ccO.toSeq)}")
    println(s"CC r16: ${fmt(ccN.toSeq)}")
    spark.stop()
  }
}
