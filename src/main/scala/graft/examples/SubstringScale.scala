package graft.examples

import org.apache.spark.sql.SparkSession

/** Scaling evidence for the r7 corpus-complete SubstringDedup (chunk
  * pass + winnowing cross-chunk pass): run resolveDuplicates over the
  * FULL documents table at two corpus sizes and report time + rows.
  *
  *   sbt "runMain graft.examples.SubstringScale <sfDir1> <sfDir2>"
  */
object SubstringScale {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.length >= 2) Seq(args(0), args(1))
      else Seq("/root/testdata/sf0.01", "/tmp/sf5x_001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val t0 = System.nanoTime()
      val dups = graft.operators.SubstringDedup
        .resolveDuplicates(docs, "doc_id", "text", minWidth = 15, chunks = 8)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[substring-scale] dir=$dir docs=$n dup_rows=$dups " +
        f"time=$secs%.1fs")
    }
    spark.stop()
  }
}
