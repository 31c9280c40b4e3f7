package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Measures the runtime semi-join prefilter's row cut (the evidence
  * behind the opt_runtime_filter gate): runs
  * MiscPack.runtimeFilterPlan at a given SF dir with the bloom
  * runtime-filter confs OFF and ON, and prints how many probe-side
  * rows reached the join exchange in each case, from the executed
  * plan's own metrics (numOutputRows of the might_contain Filter vs
  * the lineitem scan).
  *
  * Usage: runMain graft.examples.RuntimeFilterProbe [sfDir]
  * The printed per-mode rows are the SCALING.md scan-reduction
  * evidence at the 10x copy.
  */
object RuntimeFilterProbe {

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    // AQE stage / exchange-reuse wrappers expose their subtree via
    // .plan / .child, NOT via children (which is Nil) — unwrap or the
    // walk sees an empty tree.
    case q: QueryStageExec => finalPlan(q.plan)
    case r: ReusedExchangeExec => finalPlan(r.child)
    case other => other
  }

  private def metricSum(p: SparkPlan, pred: SparkPlan => Boolean): Long = {
    var total = 0L
    // ReusedExchangeExec resolves to the SAME subtree instance as the
    // original exchange — an identity-visited set keeps each physical
    // node's metric counted once, or reuse would double the evidence.
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(n: SparkPlan): Unit = {
      val resolved = finalPlan(n)
      if (seen.add(resolved)) {
        if (pred(resolved)) total += resolved.metrics.get("numOutputRows")
          .map(_.value).getOrElse(0L)
        resolved.children.foreach(walk)
        resolved.subqueries.foreach(walk)
      }
    }
    walk(p)
    total
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def probeRows(bloomOn: Boolean): (Long, Long) = {
      val confs = graft.queries.MiscPack.runtimeFilterConfs
      val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      if (!bloomOn)
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
          "false")
      try {
        val df = graft.queries.MiscPack.runtimeFilterPlan(spark, sfDir)
        df.collect()
        val plan = finalPlan(df.queryExecution.executedPlan)
        val scanned = metricSum(plan, p =>
          p.nodeName.contains("Scan") && p.toString.contains("l_orderkey"))
        val afterBloom = metricSum(plan, p =>
          p.nodeName == "Filter" && p.toString.contains("might_contain"))
        (scanned, afterBloom)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val (scanOff, _) = probeRows(bloomOn = false)
    val (scanOn, kept) = probeRows(bloomOn = true)
    println(f"bloom OFF: probe rows into join exchange = $scanOff%,d")
    println(f"bloom ON : lineitem rows scanned = $scanOn%,d, " +
      f"rows past might_contain = $kept%,d " +
      f"(cut ${100.0 * (scanOn - kept) / math.max(1, scanOn)}%.1f%%)")
    spark.stop()
  }
}
