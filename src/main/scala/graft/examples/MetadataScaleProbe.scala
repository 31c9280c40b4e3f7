package graft.examples

import org.apache.spark.sql.SparkSession

/** Envelope probe: footer-metadata readers on a ~1000-file directory.
  *
  * Measures the driver-serial regime (driverFileLimit above the file
  * count — the pre-round-16 behavior) against the distributed regime
  * (driverFileLimit = 0: file list as a Dataset, footers opened in
  * mapPartitions on executors) over the SAME directory, and verifies
  * the two row sets are identical. The wall-clock ratio is the
  * executor-side-scaling evidence for ENVELOPE_r16_metadata.json; at
  * 100k+ files only the distributed regime remains viable.
  *
  * Usage: runMain graft.examples.MetadataScaleProbe [nFiles]
  */
object MetadataScaleProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.nonEmpty) args(0).toInt else 1000
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("metadata-scale-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files
      .createTempDirectory("graft_meta_scale").toString
    // nFiles parquet + orc files with real per-file stats variety
    val df = spark.range(0, 2000L * nFiles)
      .selectExpr("id", "CAST(id AS DOUBLE) / 3 AS v",
        "CONCAT('s', id % 1000) AS s")
      .repartition(nFiles)
    df.write.parquet(s"$base/p")
    df.write.orc(s"$base/o")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

    import graft.sources.Layout
    // warm both code paths once on a small dir so JVM/codegen warmup
    // doesn't land in either measurement
    spark.range(0, 100).repartition(2).write.parquet(s"$base/warm")
    rows(Layout.parquetMetadata(spark, s"$base/warm", 10))
    rows(Layout.parquetMetadata(spark, s"$base/warm", 0))

    val (pDrv, tPDrv) = time(rows(
      Layout.parquetMetadata(spark, s"$base/p", driverFileLimit = nFiles + 1)))
    val (pExe, tPExe) = time(rows(
      Layout.parquetMetadata(spark, s"$base/p", driverFileLimit = 0)))
    val (oDrv, tODrv) = time(rows(
      Layout.orcMetadata(spark, s"$base/o", driverFileLimit = nFiles + 1)))
    val (oExe, tOExe) = time(rows(
      Layout.orcMetadata(spark, s"$base/o", driverFileLimit = 0)))

    val pEq = pDrv == pExe
    val oEq = oDrv == oExe
    println(f"""{"probe":"MetadataScaleProbe","n_files":$nFiles,""" +
      f""""parquet_rows":${pDrv.size},"orc_rows":${oDrv.size},""" +
      f""""parquet_driver_sec":$tPDrv%.2f,"parquet_executor_sec":$tPExe%.2f,""" +
      f""""orc_driver_sec":$tODrv%.2f,"orc_executor_sec":$tOExe%.2f,""" +
      f""""parquet_identical":$pEq,"orc_identical":$oEq}""")
    require(pEq && oEq, "regimes disagree")
    spark.stop()
  }
}
