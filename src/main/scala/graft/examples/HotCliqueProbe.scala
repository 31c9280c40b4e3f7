package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-duplicate-clique evidence: one sentinel 15-gram family planted
  * in EVERY doc of the corpus, then both substring-dedup paths timed.
  *
  *  - the posting-list cross-chunk path ([[graft.operators
  *    .SubstringDedup.resolveDuplicates]]) pays C(m,2) gram-verified
  *    candidate pairs on a gram shared by m documents (the documented
  *    round-13 caveat — same class as LSH hot bands);
  *  - the distributed global suffix ranking ([[graft.operators
  *    .SubstringDedup.duplicatedGrams]]) pays O(occurrences): the
  *    clique is ONE m-row group (the reference's global-SA bound,
  *    nvtext/deduplicate.hpp:40).
  *
  * Pass 1+ corpus dirs (e.g. a plain sf dir and detwin 5x/25x copies);
  * every doc with doc_id % 10M < 500 gets the sentinel appended — the
  * same construction as the doc_hotclique_dups oracle gate. The pair
  * path is only run while C(m,2) stays below ~10M (above that it is
  * the point being made, not a measurement worth hours).
  *
  *   sbt "runMain graft.examples.HotCliqueProbe <dir1> [dir2 ...]"
  */
object HotCliqueProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sentinel = "##GLOBAL*SA*HOT*CLIQUE##"
    dirs.foreach { dir =>
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 10000000L < 500 && col("text").isNotNull)
        .select(col("doc_id"),
          concat(col("text"), lit(" "), lit(sentinel)).as("text"))
        .cache()
      val m = corpus.count()
      val pairs = m * (m - 1) / 2
      val t0 = System.nanoTime()
      val nGlobal = graft.operators.SubstringDedup
        .duplicatedGrams(corpus, "doc_id", "text", minWidth = 15).count()
      val tGlobal = (System.nanoTime() - t0) / 1e9
      val pairPath = if (pairs <= 10000000L) {
        val t1 = System.nanoTime()
        val n = graft.operators.SubstringDedup
          .resolveDuplicates(corpus, "doc_id", "text", minWidth = 15)
          .count()
        f""","pair_path_sec":${(System.nanoTime() - t1) / 1e9}%.1f,"pair_path_rows":$n"""
      } else ""
      println(f"""{"probe":"hotclique","dir":"$dir","clique_m":$m,""" +
        f""""clique_pairs":$pairs,"global_sec":$tGlobal%.1f,""" +
        f""""global_dup_grams":$nGlobal$pairPath}""")
      corpus.unpersist()
    }
    spark.stop()
  }
}
