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
  override def shortName(): String = "graft-avro"

  private def files(path: String): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".avro"))
  }

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
    val first = files(path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $path"))
    val fs = first.getPath.getFileSystem(new Configuration())
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

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.getName)
      .map(f => AvroFilePartition(f.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    AvroReaderFactory(required.fields.map(_.name))
}

case class AvroReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroFilePartition].file
    new PartitionReader[InternalRow] {
      private val p = new Path(file)
      private val in = p.getFileSystem(new Configuration()).open(p)
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
