package graft.examples

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-axis floor decomposition (VERDICT r14 next #6): how much of a
  * replay gate's wall time is per-trigger fixed cost, and what do the
  * two rig levers (shuffle partitions = state stores per op, stateful
  * op count) contribute? Runs a 6-trigger MemoryStream schedule (the
  * gates' shape: 4 data batches + 2 sentinel/drain) through three
  * pipeline classes — passthrough (0 state stores), dedup (1),
  * stream-stream interval join (2) — at 1/2/4/8 shuffle partitions,
  * two timed reps each (min taken, first run warm-up discarded).
  *
  *   sbt "runMain graft.examples.StreamFloorProbe"
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.minBatchesToRetain", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 2400 rows over 4 data batches + 2 sentinel batches — the gates'
    // schedule shape and row scale at sf0.1
    val rows = (0 until 2400).map { i =>
      (new java.sql.Timestamp(1700000000000L + i * 1000L),
        (i % 40).toLong, if (i % 2 == 0) "view" else "click")
    }
    val batches = rows.grouped(600).toSeq ++
      Seq(Seq((new java.sql.Timestamp(1700000000000L + 86400000L),
        -1L, "view")), Seq((new java.sql.Timestamp(
        1700000000000L + 2 * 86400000L), -1L, "view")))

    def pipeline(kind: String)(
        ds: Dataset[(java.sql.Timestamp, Long, String)]): DataFrame = {
      val df = ds.toDF("ts", "user_id", "side")
      kind match {
        case "passthrough" => df
        case "dedup1" =>
          df.withWatermark("ts", "10 minutes")
            .dropDuplicates("user_id", "ts")
        case "join2" =>
          val v = df.filter($"side" === "view")
            .select($"user_id".as("v_user"), $"ts".as("v_ts"))
            .withWatermark("v_ts", "10 minutes")
          val c = df.filter($"side" === "click")
            .select($"user_id".as("c_user"), $"ts".as("c_ts"))
            .withWatermark("c_ts", "10 minutes")
          v.join(c, $"v_user" === $"c_user" &&
            $"c_ts" >= $"v_ts" && $"c_ts" <= $"v_ts" + expr(
              "INTERVAL 10 MINUTES"))
      }
    }

    def once(kind: String, parts: Int): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val input = MemoryStream[(java.sql.Timestamp, Long, String)]
      val n = spark.sparkContext.collectionAccumulator[Long]("n")
      val q = pipeline(kind)(input.toDS()).writeStream
        .outputMode("append")
        .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], _: Long) =>
          n.add(df.count()); ()
        }.start()
      val t0 = System.nanoTime()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        q.processAllAvailable()
      } finally q.stop()
      (System.nanoTime() - t0) / 1e9
    }

    once("passthrough", 4) // JVM/codegen warm-up, discarded
    for (kind <- Seq("passthrough", "dedup1", "join2");
         parts <- Seq(1, 2, 4, 8)) {
      val secs = math.min(once(kind, parts), once(kind, parts))
      println(f"""{"kind":"$kind","partitions":$parts,"sec":$secs%.2f}""")
    }
    spark.stop()
  }
}
