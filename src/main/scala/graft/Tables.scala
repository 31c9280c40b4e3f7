package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All engine inputs are parquet scans so that Catalyst's predicate
  * pushdown / column pruning / partition sizing apply (SURVEY.md §2.1:
  * the reference's `read_parquet`, cpp/include/cudf/io/parquet.hpp:1009,
  * maps to Spark's built-in parquet source).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has shipped as both parquet INT64 TIMESTAMP(NANOS) — which
    * Spark has no native type for (SURVEY.md §1.2: TIMESTAMP_NANOS → µs
    * truncation) — and, in newer generations, plain TIMESTAMP(MICROS).
    * Adapt to whichever the file carries: when the column reads back as a
    * long (nanosAsLong), truncate ns→µs exactly as DuckDB does so the
    * oracles agree; when it is already a timestamp, pass it through. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Session TZ is pinned to UTC everywhere (Bench/Verify/tests), so
        // NTZ→TIMESTAMP is a pure reinterpretation; downstream operators
        // (unix_micros, range windows) expect TimestampType.
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
