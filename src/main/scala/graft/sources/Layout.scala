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
    * Footer reads happen on the driver (one seek per file — the same
    * metadata-sized listing [[compact]] already does); for a lake with
    * many thousands of files, parallelize by mapping this over
    * per-directory partitions instead of one giant glob. */
  def parquetMetadata(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val statuses =
      (if (fs.getFileStatus(root).isDirectory) fs.listStatus(root).toSeq
       else Seq(fs.getFileStatus(root)))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
    val rows = statuses.flatMap { st =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromStatus(st, conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
          case (bg, rg) =>
            bg.getColumns.asScala.toSeq.map { cc =>
              val stats = cc.getStatistics
              val hasMinMax = stats != null && stats.hasNonNullValue
              (st.getPath.getName, rg, bg.getRowCount,
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
    import spark.implicits._
    rows.toDF("file_name", "row_group_id", "row_group_num_rows",
      "path_in_schema", "type", "num_values", "null_count",
      "total_compressed_size", "total_uncompressed_size",
      "stats_min", "stats_max")
  }

  /** ORC footer metadata as a table (orc_metadata.hpp twin of
    * [[parquetMetadata]]): one row per (file, top-level column) with
    * the footer's value count (ORC counts NON-null values, unlike
    * parquet), null flag, min/max statistics (rendered to string —
    * lossless for long/double/string), plus file row and stripe
    * counts. Footers only; same driver-side metadata listing. */
  def orcMetadata(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import org.apache.orc.{ColumnStatistics, OrcFile}
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val statuses =
      (if (fs.getFileStatus(root).isDirectory) fs.listStatus(root).toSeq
       else Seq(fs.getFileStatus(root)))
        .filter(_.getPath.getName.endsWith(".orc"))
        .sortBy(_.getPath.getName)
    def mm(cs: ColumnStatistics): (String, String) = cs match {
      case i: org.apache.orc.IntegerColumnStatistics =>
        (i.getMinimum.toString, i.getMaximum.toString)
      case d: org.apache.orc.DoubleColumnStatistics =>
        (d.getMinimum.toString, d.getMaximum.toString)
      case s: org.apache.orc.StringColumnStatistics =>
        (s.getMinimum, s.getMaximum)
      case _ => (null, null)
    }
    val rows = statuses.flatMap { st =>
      val reader = OrcFile.createReader(st.getPath,
        OrcFile.readerOptions(conf).filesystem(fs))
      val schema = reader.getSchema
      val names = schema.getFieldNames.asScala.toSeq
      val stats = reader.getStatistics
      val (nRows, nStripes) =
        (reader.getNumberOfRows, reader.getStripes.size)
      // The statistics array is indexed by the TypeDescription's
      // pre-order type id (root struct = 0). A nested top-level column
      // (struct/array/map) expands into several flattened entries, so
      // `i + 1` only aligns for flat schemas — the child's own id is
      // the correct index regardless of nesting.
      names.zip(schema.getChildren.asScala).map { case (name, child) =>
        val cs = stats(child.getId.toInt)
        val (mn, mx) = mm(cs)
        (st.getPath.getName, name, cs.getNumberOfValues, cs.hasNull,
          mn, mx, nRows, nStripes)
      }
    }
    import spark.implicits._
    rows.toDF("file_name", "column_name", "num_values", "has_null",
      "stats_min", "stats_max", "file_rows", "file_stripes")
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
