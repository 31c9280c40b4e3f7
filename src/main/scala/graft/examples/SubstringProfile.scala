package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of SubstringDedup on a (possibly stressed)
  * gate slice — built to decompose the round-13 finding that the
  * scaled doc_substring_dups gate rides at ~n^1.5 between 5× and 25×:
  * is it the fixed-chunk-count local suffix arrays, or the winnowing
  * candidate fan-out (hot common-text fingerprints saturating the
  * posting lists)?
  *
  *   sbt "runMain graft.examples.SubstringProfile <sfDir> [chunks...]"
  */
object SubstringProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val chunkChoices =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(4, 16)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10000000L < 30)
      .select(col("doc_id"), col("text"))
    docs.persist()
    val n = docs.count()
    val chars = docs.agg(sum(length(col("text")))).head().getLong(0)
    println(f"[ssd-profile] dir=$dir docs=$n chars=$chars")

    // fingerprint + candidate-pair profile at the two (k, w) splits
    val minWidth = 15
    for ((k, w) <- Seq(((minWidth + 1) / 2, minWidth - (minWidth + 1) / 2 + 1),
        (minWidth - 1, 2))) {
      val t0 = System.nanoTime()
      val fps = docs.as[(Long, String)].flatMap { case (id, t) =>
        graft.operators.SubstringDedup.winnowChars(t, k, w).map(fp => (id, fp))
      }.toDF("id", "fp")
      val nFps = fps.count()
      // posting-list histogram: how hot are the hottest fingerprints?
      val hist = fps.groupBy("fp").agg(countDistinct("id").as("ids"))
      val pairSum = hist.agg(
        sum((col("ids") * (col("ids") - 1) / 2).cast("long")).as("pairs"),
        max(col("ids")).as("hottest"), count(lit(1)).as("n_keys")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[ssd-profile] k=$k w=$w fingerprints=$nFps " +
        f"pairSumAcrossKeys=${pairSum.getLong(0)} " +
        f"hottestPostingList=${pairSum.getLong(1)} " +
        f"distinctKeys=${pairSum.getLong(2)} time=$secs%.1fs")
    }

    // end-to-end at each chunk count (same output by contract)
    chunkChoices.foreach { ch =>
      val t0 = System.nanoTime()
      val rows = graft.operators.SubstringDedup
        .resolveDuplicates(docs, "doc_id", "text", minWidth, chunks = ch)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[ssd-profile] chunks=$ch dup_rows=$rows time=$secs%.1fs")
    }
    spark.stop()
  }
}
