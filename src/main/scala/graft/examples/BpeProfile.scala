package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Kernel profile for `plans.BpeEncode` (VERDICT r6 #9): 2M DISTINCT
  * 32-char hex words (so no duplicate-word shortcut flatters the
  * number) against a two-level 512-pair merge table — every word runs
  * the full char → pair → quad merge cascade. Prints words/s; run:
  *
  *   sbt "runMain graft.examples.BpeProfile"
  */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hex = "0123456789abcdef"
    // level 1: all 256 char pairs; level 2: 256 quad merges of the
    // level-1 outputs — every adjacent position always has a merge, so
    // a 32-char word applies 16 + 8 = 24 merges
    val merges =
      (for (a <- hex; b <- hex) yield (a.toString, b.toString)) ++
        (for (a <- hex; b <- hex) yield (s"$a$b", s"$b$a"))
    val n = 2000000L
    val df = spark.range(n).select(md5(col("id").cast("string")).as("w"))

    // warm (io/codegen), then two timed passes, report the min
    val enc = graft.plans.BpeEncode(col("w"), merges.toSeq)
    def run(): Double = {
      val t0 = System.nanoTime()
      df.select(size(enc).as("k")).agg(sum(col("k"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    run()
    val secs = math.min(run(), run())
    println(f"[bpe-profile] words=$n time=$secs%.2fs " +
      f"rate=${n / secs / 1e6}%.2fM words/s (${secs / n * 1e9}%.0f ns/word)")
    spark.stop()
  }
}
