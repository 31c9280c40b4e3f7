package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout operators: the two levers that remove work from every
  * downstream query at cluster scale (SURVEY.md §2.13, SCALING.md).
  *
  * - **Bucketing** (≙ the reference's hash_partition + pack persisted to
  *   storage, partitioning.hpp): both join sides pre-hashed into the
  *   same bucket count on the join key, so a fact-fact join runs with
  *   ZERO shuffle exchanges — at 100 TB this turns the nightly
  *   lineitem⋈orders re-shuffle into a map-side merge of co-located
  *   files. `sortBy` additionally persists bucket-local order so the
  *   sort-merge join needs no per-task sort.
  * - **Partitioned layout** (hive-style `partitionBy` directories):
  *   partition pruning happens in the driver's file listing, before any
  *   task launches — a predicate on the partition column reads only the
  *   matching directories (visible as PartitionFilters in the scan).
  */
object Layout {

  /** Write `df` as a bucketed (and optionally bucket-sorted) parquet
    * table at `path`, registered as external table `table`. Joins
    * between tables bucketed on the same key with the same `buckets`
    * count plan with no Exchange on either side. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, key: String,
                    sorted: Boolean = true): DataFrame = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    // repartition on the bucket key into exactly `buckets` partitions:
    // Spark's bucket id and HashPartitioning use the same murmur3 pmod,
    // so each task holds exactly one bucket → one file per bucket, which
    // lets the scan report the persisted sort order (no per-task re-sort
    // in front of the merge join).
    val w = df.repartition(buckets, df(key))
      .write.mode("overwrite").format("parquet")
      .option("path", path).bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
    s.table(table)
  }

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partCols`. Reads that filter on a partition column list only the
    * matching directories (driver-side pruning, no footer reads). */
  /** NOTE: the returned round-trip frame follows Hive layout rules —
    * partition columns move to the END of the schema, and their values
    * are re-inferred from directory names (string "01" can come back as
    * int 1 unless `spark.sql.sources.partitionColumnTypeInference
    * .enabled` is off). Select/cast explicitly before schema-sensitive
    * unions or comparisons. */
  def writePartitioned(df: DataFrame, path: String,
                       partCols: Seq[String]): DataFrame = {
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Z-ordered (Morton space-filling curve) parquet layout — the third
    * layout lever, for MULTI-dimensional pruning where bucketing serves
    * one join key and partitioning one low-cardinality column: rows are
    * range-partitioned and sorted by the bit-interleaved Z-value of the
    * `dims` columns ([[graft.plans.InterleaveBits]]), so every file's
    * min/max footer statistics are tight in EVERY dimension and a
    * predicate on ANY dim skips most files (Spark prunes row-groups
    * from the same stats). A linear sort gives this only for its
    * leading column. `dims` must be non-negative LONG codes — pre-rank
    * skewed or unbounded columns; `bits` low bits per dim are used.
    * One file per range partition (`files` total), so file-level stats
    * are the pruning granule. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
                    bits: Int = 16, files: Int = 16): DataFrame =
    writeCurveClustered(df, path, dims, bits, files, curve = "morton")

  /** [[writeZOrdered]] with a curve choice: `"morton"` (any k dims) or
    * `"hilbert"` (2 dims; consecutive curve positions are always
    * grid-adjacent, so range partitions cut into blobs with tighter
    * per-file bounding boxes — fewer files overlap a given predicate
    * box at the same file count). */
  def writeCurveClustered(df: DataFrame, path: String, dims: Seq[String],
                          bits: Int = 16, files: Int = 16,
                          curve: String = "morton"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val longs = dims.map(d => col(d).cast("long"))
    val key = curve match {
      case "morton" =>
        graft.plans.GraftExpressions.interleaveBits(bits, longs: _*)
      case "hilbert" =>
        require(dims.size == 2, "hilbert curve supports exactly 2 dims")
        graft.plans.GraftExpressions.hilbert2d(bits, longs(0), longs(1))
      case other => throw new IllegalArgumentException(
        s"unknown curve '$other' (morton | hilbert)")
    }
    // NOTE: operators.Spread was measured HERE and rejected (1.25 s ->
    // 1.84 s on io_zorder_prune): repartitionByRange executes its child
    // twice (range-boundary sampling pass + the shuffle itself), so an
    // injected pre-exchange runs twice and costs more than the
    // single-task curve-key evaluation it parallelizes.
    df.withColumn("__z", key)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Parquet footer metadata AS A TABLE (parquet_metadata.hpp — the
    * reference exposes footer schema/stats/row-group structure as
    * readable data; DuckDB's parquet_metadata() is the same idea): one
    * row per (file, row group, column chunk) with counts, byte sizes
    * and min/max/null-count statistics, read from FOOTERS ONLY — no
    * data pages are touched. min/max render via parquet-mr's
    * Statistics#minAsString (Double.toString / Long.toString / UTF-8,
    * lossless to cast back).
    *
    * The listing RECURSES into subdirectories (a hive-partitioned
    * `key=value` layout yields one row set per leaf file; `file_name`
    * is the path relative to `path`, so partition values stay
    * visible), skipping `_`/`.`-prefixed names (_SUCCESS, .crc).
    * Footer reads run on the DRIVER only below `driverFileLimit`
    * files (one seek each — fine for a handful); above it the file
    * list becomes a Dataset and footers are opened in `mapPartitions`
    * on EXECUTORS, so a 100k-file lake reads its metadata at cluster
    * parallelism instead of serializing through the driver. */
  def parquetMetadata(spark: org.apache.spark.sql.SparkSession,
      path: String, driverFileLimit: Int = 64): DataFrame = {
    import spark.implicits._
    footerScan(spark, path, ".parquet", driverFileLimit,
      parquetFooterRows)
      .toDF("file_name", "row_group_id", "row_group_num_rows",
        "path_in_schema", "type", "num_values", "null_count",
        "total_compressed_size", "total_uncompressed_size",
        "stats_min", "stats_max")
  }

  private def parquetFooterRows(
      conf: org.apache.hadoop.conf.Configuration, rel: String,
      p: org.apache.hadoop.fs.Path): Seq[(String, Int, Long, String,
      String, Long, Long, Long, Long, String, String)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try {
      reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
        case (bg, rg) =>
          bg.getColumns.asScala.toSeq.map { cc =>
            val stats = cc.getStatistics
            val hasMinMax = stats != null && stats.hasNonNullValue
            (rel, rg, bg.getRowCount,
              cc.getPath.toDotString,
              cc.getPrimitiveType.getPrimitiveTypeName.name,
              cc.getValueCount,
              if (stats != null && !stats.isNumNullsSet) -1L
              else if (stats != null) stats.getNumNulls else -1L,
              cc.getTotalSize, cc.getTotalUncompressedSize,
              if (hasMinMax) stats.minAsString else null,
              if (hasMinMax) stats.maxAsString else null)
          }
      }
    } finally reader.close()
  }

  /** ORC footer metadata as a table (orc_metadata.hpp twin of
    * [[parquetMetadata]]): one row per (file, top-level column) with
    * the footer's value count (ORC counts NON-null values, unlike
    * parquet), null flag, min/max statistics (rendered to string —
    * lossless for long/double/string; dates as ISO yyyy-MM-dd,
    * timestamps as UTC epoch millis, decimals via plain unscaled
    * rendering, booleans as true/false), plus file row and stripe
    * counts. Footers only; same recursive listing and
    * driver-vs-executor split as [[parquetMetadata]]. */
  def orcMetadata(spark: org.apache.spark.sql.SparkSession,
      path: String, driverFileLimit: Int = 64): DataFrame = {
    import spark.implicits._
    footerScan(spark, path, ".orc", driverFileLimit, orcFooterRows)
      .toDF("file_name", "column_name", "num_values", "has_null",
        "stats_min", "stats_max", "file_rows", "file_stripes")
  }

  /** Per-STRIPE ORC statistics (the reference's orc_metadata exposes
    * stripe structure; this is [[orcMetadata]] at parquet's row-group
    * grain): one row per (file, stripe, top-level column). */
  def orcStripeMetadata(spark: org.apache.spark.sql.SparkSession,
      path: String, driverFileLimit: Int = 64): DataFrame = {
    import spark.implicits._
    footerScan(spark, path, ".orc", driverFileLimit, orcStripeRows)
      .toDF("file_name", "stripe_id", "stripe_rows", "column_name",
        "num_values", "has_null", "stats_min", "stats_max")
  }

  /** min/max of an ORC ColumnStatistics, rendered to strings the
    * matching DuckDB/Spark cast can read back (numerics via
    * toString, dates ISO, timestamps as UTC epoch millis, booleans
    * reconstructed from the true/false counts). Containers
    * (struct/list/map/binary) and empty columns yield nulls. */
  private def orcMinMax(cs: org.apache.orc.ColumnStatistics)
      : (String, String) = {
    import org.apache.orc._
    def s(a: Any): String = if (a == null) null else a.toString
    if (cs.getNumberOfValues == 0) (null, null)
    else cs match {
      case i: IntegerColumnStatistics =>
        (i.getMinimum.toString, i.getMaximum.toString)
      case d: DoubleColumnStatistics =>
        (d.getMinimum.toString, d.getMaximum.toString)
      case st: StringColumnStatistics => (st.getMinimum, st.getMaximum)
      case d: DateColumnStatistics =>
        // via epoch days: getMinimumLocalDate is a hybrid-chronology
        // date whose toString renders "Hybrid AD yyyy-MM-dd"
        (java.time.LocalDate.ofEpochDay(d.getMinimumDayOfEpoch).toString,
         java.time.LocalDate.ofEpochDay(d.getMaximumDayOfEpoch).toString)
      case t: TimestampColumnStatistics =>
        (if (t.getMinimumUTC == null) null
         else t.getMinimumUTC.getTime.toString,
         if (t.getMaximumUTC == null) null
         else t.getMaximumUTC.getTime.toString)
      case d: DecimalColumnStatistics =>
        (s(d.getMinimum), s(d.getMaximum))
      case b: BooleanColumnStatistics =>
        (if (b.getFalseCount > 0) "false" else "true",
         if (b.getTrueCount > 0) "true" else "false")
      case _ => (null, null)
    }
  }

  private def orcFooterRows(conf: org.apache.hadoop.conf.Configuration,
      rel: String, p: org.apache.hadoop.fs.Path)
      : Seq[(String, String, Long, Boolean, String, String, Long, Int)] = {
    import org.apache.orc.OrcFile
    import scala.jdk.CollectionConverters._
    val reader = OrcFile.createReader(p, OrcFile.readerOptions(conf))
    try {
      val schema = reader.getSchema
      val stats = reader.getStatistics
      val (nRows, nStripes) =
        (reader.getNumberOfRows, reader.getStripes.size)
      // The statistics array is indexed by the TypeDescription's
      // pre-order type id (root struct = 0). A nested top-level column
      // (struct/array/map) expands into several flattened entries, so
      // `i + 1` only aligns for flat schemas — the child's own id is
      // the correct index regardless of nesting.
      schema.getFieldNames.asScala.toSeq
        .zip(schema.getChildren.asScala).map { case (name, child) =>
          val cs = stats(child.getId.toInt)
          val (mn, mx) = orcMinMax(cs)
          (rel, name, cs.getNumberOfValues, cs.hasNull, mn, mx,
            nRows, nStripes)
        }
    } finally reader.close()
  }

  private def orcStripeRows(conf: org.apache.hadoop.conf.Configuration,
      rel: String, p: org.apache.hadoop.fs.Path)
      : Seq[(String, Int, Long, String, Long, Boolean, String, String)] = {
    import org.apache.orc.OrcFile
    import scala.jdk.CollectionConverters._
    val reader = OrcFile.createReader(p, OrcFile.readerOptions(conf))
    try {
      val schema = reader.getSchema
      val names = schema.getFieldNames.asScala.toSeq
        .zip(schema.getChildren.asScala.map(_.getId.toInt))
      val stripes = reader.getStripes.asScala.toSeq
      reader.getStripeStatistics.asScala.toSeq.zipWithIndex.flatMap {
        case (ss, i) =>
          val colStats = ss.getColumnStatistics
          names.map { case (name, id) =>
            val cs = colStats(id)
            val (mn, mx) = orcMinMax(cs)
            (rel, i, stripes(i).getNumberOfRows, name,
              cs.getNumberOfValues, cs.hasNull, mn, mx)
          }
      }
    } finally reader.close()
  }

  /** Recursively list the data files under `root` ending in `suffix`,
    * as (path relative to root, absolute path), sorted; hidden
    * `_`/`.`-prefixed files and directories are skipped everywhere on
    * the path (the hadoop convention Spark's own listing follows). */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      suffix: String): Seq[(String, String)] = {
    val qRoot = fs.makeQualified(root)
    if (!fs.getFileStatus(qRoot).isDirectory)
      Seq((qRoot.getName, qRoot.toString)).filter(_._1.endsWith(suffix))
    else {
      val prefix = qRoot.toString + "/"
      // listStatus recursion, NOT fs.listFiles(_, recursive=true): the
      // latter returns LocatedFileStatus and resolves per-file block
      // locations — measured ~4 ms/file on a local fs (17 s for 4k
      // files), pure waste for a footer scan that never uses locality
      def walk(p: org.apache.hadoop.fs.Path): Seq[(String, String)] =
        fs.listStatus(p).toSeq
          .filterNot { st =>
            val n = st.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          }
          .flatMap { st =>
            if (st.isDirectory) walk(st.getPath)
            else {
              val full = st.getPath.toString
              if (full.endsWith(suffix))
                Seq((full.stripPrefix(prefix), full))
              else Nil
            }
          }
      walk(qRoot).sortBy(_._1)
    }
  }

  /** Java-serializable Configuration box (hadoop's Configuration
    * isn't Serializable; Spark's own wrapper is private[spark]). */
  private class ConfBox(
      @transient private var c: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = c
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); c.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      c = new org.apache.hadoop.conf.Configuration(false)
      c.readFields(in)
    }
  }

  /** Shared footer-scan harness: recursive listing, then per-file
    * `read` either in a driver loop (≤ `driverFileLimit` files — one
    * metadata seek each, no job) or distributed over executors (file
    * list as a Dataset, footers opened in mapPartitions, hadoop conf
    * broadcast) — the path a 100k-file lake takes. */
  private def footerScan[T <: Product : org.apache.spark.sql.Encoder](
      spark: org.apache.spark.sql.SparkSession, path: String,
      suffix: String, driverFileLimit: Int,
      read: (org.apache.hadoop.conf.Configuration, String,
        org.apache.hadoop.fs.Path) => Seq[T])
      : org.apache.spark.sql.Dataset[T] = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val files = listDataFiles(root.getFileSystem(conf), root, suffix)
    if (files.size <= driverFileLimit)
      spark.createDataset(files.flatMap { case (rel, full) =>
        read(conf, rel, new org.apache.hadoop.fs.Path(full))
      })
    else {
      val bc = spark.sparkContext.broadcast(new ConfBox(conf))
      val parts = math.min(math.max(files.size / 8, 1),
        math.max(1, spark.sparkContext.defaultParallelism))
      spark.createDataset(files).repartition(parts)
        .mapPartitions { it =>
          // per-partition copy: Configuration reads are synchronized,
          // so tasks sharing the broadcast instance would serialize on
          // its lock and cancel the fan-out
          val c = new org.apache.hadoop.conf.Configuration(bc.value.value)
          it.flatMap { case (rel, full) =>
            read(c, rel, new org.apache.hadoop.fs.Path(full))
          }
        }
    }
  }

  /** Compact a parquet directory into ~`targetFileBytes` output files —
    * the small-files maintenance job (a streaming sink or an
    * over-parallel write leaves thousands of KB-sized files whose
    * per-file open/footer cost then dominates every downstream scan).
    * The output file count derives from the directory's ACTUAL byte
    * size (driver-side file listing — metadata, not data), and the
    * rewrite is one round-robin repartition: no shuffle key needed, no
    * skew possible. Optionally sorts within files by `sortCols` so
    * min/max footer stats stay selective after compaction. Returns the
    * re-read compacted frame. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): DataFrame = {
    require(targetFileBytes > 0, "need targetFileBytes > 0")
    val hadoopPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hadoopPath).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inPath)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(files,
            sortCols.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(
            sortCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(files)
    shaped.write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }
}
