package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Pluggable source via the DataSource V2 API (SURVEY §2.1 "pluggable
  * source/sink"; the reference's datasource.hpp): a full V2 stack —
  * TableProvider → Table → ScanBuilder → Batch → PartitionReader — over
  * Avro container files, usable as `spark.read.format("graft-avro")`.
  *
  * Scale shape: one InputPartition per file (Avro blocks make files
  * independently consumable), readers decode on executors, and
  * SupportsPushDownRequiredColumns prunes the deserialized columns so a
  * 2-column projection never materializes the full record. */
class AvroDataSource extends TableProvider with DataSourceRegister {
  import AvroDataSource.{hadoopConf, listAvroFiles}

  override def shortName(): String = "graft-avro"

  private def sparkType(s: org.apache.avro.Schema): DataType = {
    import org.apache.avro.Schema.Type._
    s.getType match {
      case INT     => IntegerType
      case LONG    => LongType
      case FLOAT   => FloatType
      case DOUBLE  => DoubleType
      case STRING  => StringType
      case BOOLEAN => BooleanType
      case UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != NULL)
        require(nonNull.size == 1, s"unsupported union $s")
        sparkType(nonNull.head)
      case other => throw new IllegalArgumentException(
        s"graft-avro supports primitive columns only, got $other")
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "graft-avro requires a path")
    val conf = hadoopConf()
    val first = listAvroFiles(path, conf).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $path"))
    val fs = first.getPath.getFileSystem(conf)
    val in = fs.open(first.getPath)
    try {
      val stream = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      val avro = stream.getSchema
      StructType(avro.getFields.asScala.map { f =>
        StructField(f.name(), sparkType(f.schema()),
          nullable = f.schema().getType == org.apache.avro.Schema.Type.UNION)
      }.toSeq)
    } finally in.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    AvroV2Table(properties.get("path"), schema)
}

object AvroDataSource {
  /** The active session's Hadoop conf (credentials, fs bindings) — the
    * bare `new Configuration()` this replaced would break any FS whose
    * access depends on session config (s3a, kerberized HDFS). */
  private[sources] def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration

  /** Single definition of "which files make up the table" — shared by
    * schema inference and partition planning so they can never disagree.
    * Name-sorted for deterministic partition order. */
  private[sources] def listAvroFiles(path: String,
      conf: Configuration): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.getName)
  }
}

case class AvroV2Table(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema)
}

class AvroScanBuilder(path: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = AvroScan(path, fullSchema, required)
}

case class AvroFilePartition(file: String) extends InputPartition

case class AvroScan(path: String, fullSchema: StructType,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro $path, ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] =
    AvroDataSource.listAvroFiles(path, AvroDataSource.hadoopConf())
      .map(f => AvroFilePartition(f.getPath.toString): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // Session Hadoop conf, serialized to the executors as plain pairs
    // (Configuration itself is not serializable).
    val conf = AvroDataSource.hadoopConf()
    val props = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    AvroReaderFactory(required.fields.map(_.name), props)
  }
}

case class AvroReaderFactory(columns: Array[String],
    confProps: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroFilePartition].file
    new PartitionReader[InternalRow] {
      private val conf = {
        val c = new Configuration(false)
        confProps.foreach { case (k, v) => c.set(k, v) }
        c
      }
      private val p = new Path(file)
      private val in = p.getFileSystem(conf).open(p)
      private val stream = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      // resolve pruned column → record field index once per partition
      private val idx = columns.map(stream.getSchema.getField(_).pos())
      private var rec: GenericRecord = _
      override def next(): Boolean = {
        if (!stream.hasNext) false
        else { rec = stream.next(rec); true }
      }
      override def get(): InternalRow =
        new GenericInternalRow(idx.map { i =>
          rec.get(i) match {
            case null => null
            case s: CharSequence => UTF8String.fromString(s.toString)
            case v => v
          }
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = { stream.close(); in.close() }
    }
  }
}
