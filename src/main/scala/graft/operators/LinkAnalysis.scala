package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Link-analysis centrality for corpus curation — the web-graph
  * quality prior (harmonic/PageRank-style scores over a hyperlink or
  * citation graph) that large-scale pretraining pipelines attach to
  * crawled documents. Extends the reference's surface (rapidsai/cudf
  * has no graph operators; cuGraph is a separate library) with the one
  * graph primitive a curation pipeline actually needs, expressed as
  * plain Spark joins + aggregations.
  *
  * Determinism contract: per-iteration inflow sums run in DYADIC
  * fixed point — each term is quantized as floor(x·2^45) and summed as
  * BIGINT, then the total is divided back by 2^45 — and every other
  * step is a single IEEE double operation, so the rank vector after
  * any fixed number of iterations is bit-identical across runs,
  * partitionings, and engines: the whole power iteration replays in
  * DuckDB as an unrolled CTE chain (see MiscPack.pageRankSql).
  * The decimal-cast dsum pattern is deliberately NOT used here: rank
  * values are dyadic-structured (r0 = 1/n for every node), which
  * reliably trips DuckDB's double→DECIMAL .5-boundary mis-rounding
  * (the events_decayed_sum finding) — measured: ~600-ulp drift after
  * 8 iterations. Power-of-two scaling has no such boundary: the
  * multiply, floor, BIGINT sum, and divide are all exact or correctly
  * rounded identically on both engines. Quantization: ≤2^-45 per term
  * (~3e-14), bounded and deterministic.
  */
object LinkAnalysis {

  /** 2^45: terms are < 1, so each scaled term is an integer < 2^45. */
  private val Two45 = 35184372088832.0

  /** Dyadic fixed-point sum: floor(term·2^45) summed EXACTLY as
    * DECIMAL(38,0) integers (DuckDB's BIGINT sum is HUGEINT — also
    * exact — so neither engine can wrap at any in-degree), total
    * divided back by 2^45. Integer→decimal casts have no rounding,
    * and the final decimal→double crossing uses the established
    * Spark-cast ≡ DuckDB-VARCHAR-route equivalence. */
  private def psum(c: org.apache.spark.sql.Column) =
    sum(floor(c * lit(Two45)).cast(DecimalType(38, 0)))
      .cast("double") / lit(Two45)

  /** PageRank by power iteration with dangling-mass redistribution:
    *
    *   r'(v) = (1−d)/n + d · ( Σ_{(u,v)∈E} r(u)/outdeg(u) + D/n )
    *
    * where D = Σ r(u) over dangling nodes (no out-edges) — the
    * standard stochastic-matrix completion, so Σ r stays 1 (up to the
    * 2^-45 per-term quantization of the fixed-point sums).
    *
    * Scale shape (the 100 TB contract): edges are deduplicated,
    * degree-annotated, REPARTITIONED BY src, and persisted ONCE — each
    * iteration's contribution join then shuffles only the rank vector
    * (|V| rows, two columns), never the edge set (|E| ≫ |V|). Per
    * iteration: one rank-side shuffle into the contribution join, one
    * dst-keyed aggregation, one broadcast of the 1-row dangling mass.
    * Lineage is cut with localCheckpoint every `checkpointEvery`
    * iterations (the nearDupClusters pattern) so plan depth stays
    * bounded; the driver holds only n and per-iteration 1-row masses.
    *
    * Returns (id, r) for every node. Fixed iteration count rather than
    * a convergence test keeps the result a pure function of the input
    * (and spares a driver-side delta aggregation per iteration);
    * PageRank at d = 0.85 contracts error by ~0.85^k, so 20-30
    * iterations reach ~1e-2..1e-3 relative accuracy — curation ranks
    * care about ordering, which stabilizes much earlier. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iters: Int = 10,
      checkpointEvery: Int = 4): DataFrame = {
    require(damping > 0 && damping < 1, "damping must be in (0,1)")
    require(iters >= 1 && checkpointEvery >= 1, "need iters/ckpt >= 1")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist()
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("r", lit(0.0))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // degree-annotated edges, partitioned by the join key ONCE: every
    // iteration's contribution join reuses this layout and shuffles
    // only the rank vector
    val ed = e.join(outdeg, "src").repartition(col("src")).persist()
    ed.count() // materialize before the loop so iterations share it
    val base = (1.0 - damping) / n
    var ranks = nodes.withColumn("r", lit(1.0 / n))
    var lastCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val dangling = ranks
        .join(outdeg, ranks("id") === outdeg("src"), "left_anti")
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
      if (i % checkpointEvery == 0 || i == iters) {
        // eager checkpoint cuts lineage; free the superseded one —
        // Dataset.unpersist is a no-op for localCheckpoint storage
        // (the nearDupClusters lesson), so blocks must be freed
        // explicitly or every cut leaks a full rank frame
        ranks = ranks.localCheckpoint()
        if (lastCkpt != null)
          org.apache.spark.sql.graftshim.CheckpointUtil.free(lastCkpt)
        lastCkpt = ranks
      }
    }
    // the final frame is checkpointed (i == iters above), so the
    // operator's working set can be released before returning
    nodes.unpersist()
    ed.unpersist()
    ranks
  }
}
