package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro source/sink (cpp/include/cudf/io/avro.hpp:217 read_avro).
  *
  * The `spark-avro` DataSource module is absent from this offline
  * classpath, but Avro core + avro-mapred ARE present — so this maps the
  * reference op onto Spark's Hadoop-format RDD bridge instead:
  * `AvroKeyInputFormat` gives a distributed, split-aware scan (container
  * sync markers make Avro splittable) and `AvroKeyOutputFormat` a
  * per-partition writer; rows convert at the partition boundary with no
  * driver involvement. Primitive types (int/long/float/double/string/
  * boolean) plus nullable unions are supported — the same surface
  * cudf's read_avro supports (avro.hpp: "only primitive types").
  */
object Avro {

  private def avroType(dt: DataType): Schema = dt match {
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case other => throw new IllegalArgumentException(
      s"Avro bridge supports primitive columns only (avro.hpp), got $other")
  }

  /** Spark StructType → Avro record schema (nullable → union[null, T]). */
  def avroSchema(schema: StructType, name: String = "graft_record"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val base = avroType(f.dataType)
      if (f.nullable) {
        val union = Schema.createUnion(java.util.Arrays.asList(
          Schema.create(Schema.Type.NULL), base))
        fields.add(new Schema.Field(f.name, union, null,
          Schema.Field.NULL_DEFAULT_VALUE))
      } else fields.add(new Schema.Field(f.name, base, null, null))
    }
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(fields)
    rec
  }

  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schemaJson = avroSchema(df.schema).toString
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true) // overwrite semantics
    val rdd = df.rdd.mapPartitions { it =>
      val sch = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < row.length) {
          rec.put(i, if (row.isNullAt(i)) null else row.get(i))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    rdd.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, avroSchema(schema))
    val n = schema.fields.length
    val rows = spark.sparkContext.newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable],
        job.getConfiguration)
      // Convert record→Row immediately: the reader reuses its datum
      // buffer, so values must not be held across next() calls.
      .mapPartitions(_.map { case (k, _) =>
        val rec = k.datum()
        val vals = new Array[Any](n)
        var i = 0
        while (i < n) {
          vals(i) = rec.get(i) match {
            case null => null
            case s: CharSequence => s.toString
            case v => v
          }
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      })
    spark.createDataFrame(rows, schema)
  }

  /** Avro sink + source round trip, mirroring Io.orcRoundTrip. */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    write(df, path)
    read(df.sparkSession, path, df.schema)
  }
}
