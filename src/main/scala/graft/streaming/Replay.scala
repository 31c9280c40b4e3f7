package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic micro-batch replay harness — the evidence bridge that
  * lets the streaming twins join the batch oracle gate.
  *
  * A fixed batch schedule is fed through a MemoryStream into the
  * caller-built streaming pipeline; every micro-batch's output is
  * captured via foreachBatch (tagged with its batch_id) and the union
  * is returned as a plain DataFrame. Because each StatefulOps twin is
  * contractually equal to its batch operator after ANY batch schedule
  * (mergeable state, exact integer numerators, in-order feeds), the
  * replayed FINAL table is expressible as one DuckDB SQL over the same
  * parquet input — which is exactly what the correctness gate checks.
  *
  * Reference analog: cpp/tests/groupby feeds fixed row batches through
  * the streaming groupby and asserts on the final table; this harness
  * is that test shape, industrialized into gate queries.
  *
  * Scale note: the harness COLLECTS the driver table to build the
  * schedule — that is the verification rig's bounded feed (the driver
  * replaces Kafka), not the operators' execution model; the stateful
  * operators themselves run distributed over however many partitions
  * the stream shuffles into. */
object Replay {

  /** State partitions for the replay rig. Streaming fixes the state
    * store count to spark.sql.shuffle.partitions at first trigger, and
    * every trigger then pays a per-partition state-store round trip
    * (with RocksDB: a native instance each). At the session default
    * (= cores = 32) a bounded ≤100k-row replay feed pays 32 store
    * visits per stateful op per trigger for ~600 rows each — pure
    * fixed cost, 4-8x what the feed needs. 4 keeps the operators
    * genuinely distributed (multi-partition shuffles, cross-partition
    * watermark min) while sizing rig overhead to the feed (round-14
    * sweep at sf0.1: interval_join 5.9 s at 8 partitions -> 4.4 s at
    * 4; RocksDB provider measured 34% SLOWER than the HDFS-backed
    * store here — per-partition native instances are pure overhead on
    * a bounded feed); production streams size this to load, not to
    * the verification rig. */
  private val RigPartitions = "4"

  /** Rig-scoped session conf, restored after the replay:
    *  - shuffle partitions sized to the feed (see [[RigPartitions]]);
    *  - no-data micro-batches OFF: processAllAvailable otherwise runs
    *    an EXTRA empty batch after nearly every data trigger to fire
    *    event-time bookkeeping, nearly doubling the per-trigger fixed
    *    cost that dominates a bounded replay (measured: stream axis
    *    66 -> 43 s at sf0.1). Correctness is schedule-independent by
    *    the twins' replay contract, and every watermark-draining gate
    *    feeds explicit SENTINEL data batches, so eviction/emission
    *    still happens on data triggers — the oracle compare re-proves
    *    the final table either way;
    *  - one batch of state retained (Spark default 100): restarts in
    *    this rig only ever happen after a CLEAN stop with every batch
    *    committed (stream_restart's runWithRestart DOES reuse the same
    *    checkpoint dir for q2, but only after q1.processAllAvailable +
    *    stop), so recovery loads exactly the latest committed state
    *    version — retaining older versions is pure commit-path cost
    *    here. A rig extended to crash-mid-batch restarts would need
    *    the retention back. */
  private def withRigConf[A](spark: SparkSession)(body: => A): A = {
    val keys = Seq(
      "spark.sql.shuffle.partitions" -> RigPartitions,
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
      "spark.sql.streaming.minBatchesToRetain" -> "1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Chunk a pre-ordered row seq into `n` contiguous micro-batches
    * (the fixed schedule). Deterministic for a deterministic input
    * order; n never exceeds the row count. */
  def timeSlices[T](rows: Seq[T], n: Int): Seq[Seq[T]] = {
    require(n > 0, "need n > 0")
    if (rows.isEmpty) Seq.empty
    else rows.grouped(math.max(1, (rows.size + n - 1) / n)).toSeq
  }

  /** Feed `batches` through `build`'s streaming pipeline one
    * processAllAvailable at a time and return every emitted row,
    * prefixed with the micro-batch id that emitted it (column
    * `batch_id` — Update-mode consumers keep each key's latest batch;
    * Append-mode consumers simply ignore it).
    *
    * A final processAllAvailable runs after the last batch so
    * watermark-advance-only batches (event-time timers) drain. */
  def run[In: Encoder](spark: SparkSession, batches: Seq[Seq[In]],
      outputMode: String)(build: Dataset[In] => DataFrame): DataFrame =
    withRigConf(spark) {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[In]
    val out = build(input.toDS())
    val schema = out.schema
    val buf = ArrayBuffer.empty[Row]
    val q = out.writeStream.outputMode(outputMode)
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        val rows = df.collect()
        buf.synchronized {
          buf ++= rows.map(r => Row.fromSeq(id +: r.toSeq))
        }
        ()
      }
      .start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b)
        q.processAllAvailable()
      }
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(buf.asJava,
      StructType(StructField("batch_id", LongType, nullable = false) +:
        schema.fields))
  }

  /** [[run]] for the foreachBatch-shaped ingest screens: feed `batches`
    * through a MemoryStream and apply a BATCH DataFrame function to
    * every micro-batch (the idiomatic Spark wiring for screens whose
    * anti-join probe side derives from the stream itself — see
    * [[StatefulOps.nearDupScreenBatch]]). The union of the per-batch
    * outputs is returned, batch_id-prefixed like [[run]]. The screen's
    * corpus index stays persisted across batches, which is exactly the
    * reuse contract the gate is proving. */
  def runForeachBatch[In: Encoder](spark: SparkSession,
      batches: Seq[Seq[In]])(f: DataFrame => DataFrame): DataFrame =
    withRigConf(spark) {
    require(batches.exists(_.nonEmpty), "need at least one non-empty batch")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[In]
    val buf = ArrayBuffer.empty[Row]
    @volatile var schema: StructType = null
    val q = input.toDS().toDF().writeStream
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        val out = f(df)
        val rows = out.collect()
        buf.synchronized {
          if (schema == null) schema = out.schema
          buf ++= rows.map(r => Row.fromSeq(id +: r.toSeq))
        }
        ()
      }
      .start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b)
        q.processAllAvailable()
      }
      q.processAllAvailable()
    } finally q.stop()
    require(schema != null, "no micro-batch ran")
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(buf.asJava,
      StructType(StructField("batch_id", LongType, nullable = false) +:
        schema.fields))
  }

  /** [[run]] with a CRASH-RESTART in the middle: the first schedule
    * half runs under query 1 (parquet sink + checkpoint), the query
    * stops, a NEW query instance starts from the same checkpoint and
    * consumes the rest. The stateful operator must recover its state
    * store and the sink log must suppress replayed offsets — the final
    * parquet table equals the no-restart run's, which is what the gate
    * row compares against the batch oracle. Append-mode pipelines only
    * (the parquet sink's commit log is the exactly-once half of the
    * proof). */
  def runWithRestart[In: Encoder](spark: SparkSession,
      firstBatches: Seq[Seq[In]], secondBatches: Seq[Seq[In]])(
      build: Dataset[In] => DataFrame): DataFrame =
    withRigConf(spark) {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_replay_rs")
      .toString
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    val input = MemoryStream[In]
    def start() = build(input.toDS()).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append").format("parquet").option("path", out).start()
    val q1 = start()
    try {
      firstBatches.foreach { b =>
        if (b.nonEmpty) input.addData(b)
        q1.processAllAvailable()
      }
    } finally q1.stop()
    val q2 = start()
    try {
      secondBatches.foreach { b =>
        if (b.nonEmpty) input.addData(b)
        q2.processAllAvailable()
      }
      q2.processAllAvailable()
    } finally q2.stop()
    spark.read.parquet(out)
  }
}
