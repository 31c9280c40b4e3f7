package org.apache.spark.sql.graftshim

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.arrow.ArrowConverters

/** Arrow interop (cudf/interop.hpp:504,622 to_arrow / from_arrow):
  * DataFrame ↔ Arrow IPC record-batch payloads, using Spark's built-in
  * columnar serializer (the engine under toPandas / pandas UDFs). The
  * converters are private[sql], hence this shim — same pattern as
  * [[ColumnBridge]].
  *
  * Batches convert per partition on executors; nothing funnels through
  * the driver except in [[toDriverBatches]], which exists for handing
  * data to an external Arrow consumer (the reference's interop use
  * case).
  */
object ArrowBridge {

  /** DataFrame → distributed Arrow IPC batches (bytes per batch). */
  def toArrowBatches(df: DataFrame,
      maxRecordsPerBatch: Long = 4096): RDD[Array[Byte]] = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    df.queryExecution.toRdd.mapPartitions { it =>
      ArrowConverters.toBatchIterator(it, schema, maxRecordsPerBatch, tz,
        true, false, TaskContext.get())
    }
  }

  /** Distributed Arrow batches → DataFrame (per-partition conversion). */
  def fromArrowBatches(df0: DataFrame, batches: RDD[Array[Byte]],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val tz = df0.sparkSession.sessionState.conf.sessionLocalTimeZone
    val rows = batches.mapPartitions { it =>
      ArrowConverters.fromBatchIterator(it, schema, tz, true, false,
        TaskContext.get())
    }
    df0.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema)
  }

  /** Executor→driver Arrow handoff for an external Arrow consumer. */
  def toDriverBatches(df: DataFrame): Array[Array[Byte]] =
    toArrowBatches(df).collect()

  /** Driver-side Arrow batches → DataFrame (interop.hpp from_arrow). */
  def fromDriverBatches(spark: org.apache.spark.sql.SparkSession,
      batches: Array[Array[Byte]], schemaJson: String): DataFrame =
    ArrowConverters.toDataFrame(batches.iterator, schemaJson,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  /** Full round trip df → Arrow IPC → df, for parity testing. */
  def roundTrip(df: DataFrame): DataFrame =
    fromArrowBatches(df, toArrowBatches(df), df.schema)
}
