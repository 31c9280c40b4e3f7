package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // See Bench: un-collapse CPU-dense/byte-light shuffle stages that
      // AQE's 1 MB coalescing floor would serialize onto one core.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // See Bench: keep ContextCleaner alive on large heaps across a
      // ~190-query run (driver GC may otherwise never fire).
      .config("spark.cleaner.periodicGC.interval", "2min")
      // Long full-GC pauses on a 25x stress dir (or CPU contention from
      // a concurrent build) can starve the local executor's heartbeat
      // past the 120 s default; in local mode the dropped executor is
      // unrecoverable and every later query fails with
      // RpcEndpointNotFoundException. A stress-verify run is batch work,
      // not latency-sensitive — wait out pauses instead of declaring
      // the (in-process!) executor dead.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=<regex>: dump/compare just the matching queries
    // (local iteration aid; the driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.pattern.matcher(n).matches())
    }
    var failed = List.empty[String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    println(s"[verify] ${selected.size - failed.size} dumped, " +
      s"${failed.size} failed${if (failed.nonEmpty) failed.mkString(": ", ", ", "") else ""}")
    // Failures leave no parquet dir, so they'd silently vanish from the
    // driver's correctness artifact (round-5 lesson: 22 queries dropped
    // without a trace). Record them explicitly alongside the dumps.
    Files.writeString(Paths.get(s"$outDir/_failed.json"),
      failed.map("\"" + _ + "\"").mkString("[", ",", "]"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
