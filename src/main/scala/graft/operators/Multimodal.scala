package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (north star).
  *
  * Media is modeled as opaque `binary` payload columns plus a typed
  * metadata struct — the Spark-side schema, partitioning, and batch
  * shape are real; the actual codec step is STUBBED with a deterministic
  * fake (this container has no image/audio native libs). Swapping the
  * stub for a real decoder is a drop-in change to [[decodeStub]] only:
  * at scale that step becomes a vectorized Arrow/Pandas UDF or a
  * mapPartitions over a JNI codec, keyed by the same schema.
  */
object Multimodal {

  /** Canonical media-row schema: id + payload + mime + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Fake ingestion: wraps a string column as a binary payload so the
    * pipeline shape can be exercised on the text testdata. */
  def ingestFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"))

  /** STUB decode ??? — real implementation requires native codecs.
    * Deterministic fake: byte length + pseudo-dimensions derived from the
    * payload digest, so downstream feature plumbing is testable. */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("fake_width", ascii(substring(md5(col("payload")), 1, 1)))
      .withColumn("fake_height", ascii(substring(md5(col("payload")), 2, 1)))

  /** Frame sampling shape: every k-th "frame" index up to nFrames —
    * posexplode keeps (media, frame_idx) rows partition-local. */
  def sampleFrames(df: DataFrame, everyK: Int, nFramesCol: String): DataFrame =
    df.select(col("media_id"),
      posexplode(sequence(lit(0), col(nFramesCol) - 1, lit(everyK))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_idx")
}
