package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profile of one named SparkEntry query: runs it (warm,
  * after one untimed pass), then prints every stage's executor-run
  * time, shuffle read/write bytes and record counts, sorted by run
  * time — the "where do the seconds go" view the guide's UI loop gives
  * interactively, usable headless. Usage:
  *   sbt "runMain graft.examples.StageProfile <query> [sfDir] [runs]"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProfile <queryName> [sfDir] [runs]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_CONF="k=v;k=v" injects extra session confs for A/Bs
    val extra = sys.env.getOrElse("SPARK_GRAFT_CONF", "").split(";")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // mirror Bench's session so profiles reflect bench plans
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "64k"))
      .config("spark.graft.spread",
        sys.env.getOrElse("SPARK_GRAFT_SPREAD", "true"))
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm pass (tables + codegen)
    case class St(id: Int, nm: String, runMs: Long, cpuMs: Long,
      srMB: Double, swMB: Double, inMB: Double, rows: Long, tasks: Int)
    val stages = collection.mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(80),
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.recordsRead, i.numTasks)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    for (_ <- 1 to runs) fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let the listener bus drain
    println(f"== $name: wall ${wall}%.2f s over $runs run(s), " +
      f"${stages.size} stages ==")
    println(f"${"stage"}%6s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"sh_rd_MB"}%9s " +
      f"${"sh_wr_MB"}%9s ${"in_MB"}%8s ${"sh_rows"}%10s ${"tasks"}%6s  name")
    stages.sortBy(-_.runMs).take(25).foreach { s =>
      println(f"${s.id}%6d ${s.runMs}%8d ${s.cpuMs}%8d ${s.srMB}%9.1f " +
        f"${s.swMB}%9.1f ${s.inMB}%8.1f ${s.rows}%10d ${s.tasks}%6d  ${s.nm}")
    }
    println(f"TOTAL run_ms=${stages.map(_.runMs).sum} " +
      f"cpu_ms=${stages.map(_.cpuMs).sum} stages=${stages.size} " +
      f"tasks=${stages.map(_.tasks).sum}")
    spark.stop()
  }
}
