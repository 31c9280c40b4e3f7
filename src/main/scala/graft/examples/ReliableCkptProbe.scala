package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Envelope probe: the reliable-checkpoint regime at stress scale.
  *
  * CheckpointsSpec proves knob parity on toy frames; this probe runs
  * the two heaviest Checkpoints.cut consumers over a REAL stress
  * corpus (a detwinned N× documents dir built by tools/detwin.py)
  * in both regimes — localCheckpoint (default) vs reliable
  * checkpoint() to a directory (spark.graft.checkpointDir) — and
  * reports wall clock, a full-result checksum (must be identical),
  * and the bytes the reliable regime persisted per loop round. The
  * measured overhead is what a cluster pays for executor-loss
  * recovery on hours-long fixpoints; results land in
  * ENVELOPE_r16_reliableckpt.json.
  *
  * Usage: runMain graft.examples.ReliableCkptProbe <stressSfDir> <ckptDir>
  */
object ReliableCkptProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, ckptDir) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("reliable-ckpt-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // order-insensitive full-result checksum (mod a prime so the sum
    // cannot overflow under ANSI arithmetic)
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.select(pmod(xxhash64(df.columns.map(col): _*),
          lit(1000000007L)).as("h"))
        .agg(count(lit(1)), sum($"h")).head
      (r.getLong(0), r.getLong(1))
    }
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else f.length()
      val f = new java.io.File(p)
      if (f.exists()) walk(f) else 0L
    }

    val docs = graft.Tables.documents(spark, sfDir)
      .filter($"text".isNotNull)
      .select($"doc_id".cast("long").as("doc_id"), $"text")
    // pageRank graph from the corpus itself: doc -> 8 pseudo-random
    // successors (splitmix-style), so |V| scales with the stress copy
    val edges = docs.select($"doc_id").distinct()
      .select($"doc_id".as("s"),
        explode(sequence(lit(1), lit(8))).as("k"))
      .select($"s", pmod(hash($"s", $"k"), lit(50000))
        .cast("long").as("d"))
      .drop("k")

    def grams() = graft.operators.SubstringDedup
      .duplicatedGrams(docs, "doc_id", "text", 15)
    def ranks() = graft.operators.LinkAnalysis
      .pageRank(edges, "s", "d", iters = 8, exact = true)

    def leg(name: String, body: () => org.apache.spark.sql.DataFrame)
        : ((Long, Long), Double, (Long, Long), Double, Long) = {
      // local regime (one unmeasured warmup first, so codegen/page-cache
      // warm-in doesn't masquerade as regime overhead)
      spark.conf.unset(graft.operators.Checkpoints.DirKey)
      checksum(body())
      val (csL, tL) = time(checksum(body()))
      // reliable regime
      spark.conf.set(graft.operators.Checkpoints.DirKey, ckptDir)
      val before = dirBytes(ckptDir)
      val (csR, tR) = time(checksum(body()))
      val written = dirBytes(ckptDir) - before
      spark.conf.unset(graft.operators.Checkpoints.DirKey)
      println(f"""LEG $name local=$tL%.1fs reliable=$tR%.1fs """ +
        f"""written=${written / (1 << 20)}MB identical=${csL == csR}""")
      (csL, tL, csR, tR, written)
    }

    val (gL, gtL, gR, gtR, gw) = leg("duplicatedGrams", () => grams())
    val (rL, rtL, rR, rtR, rw) = leg("pageRank", () => ranks())

    println(f"""{"probe":"ReliableCkptProbe","sf_dir":"$sfDir",""" +
      f""""grams_rows":${gL._1},"grams_local_sec":$gtL%.1f,""" +
      f""""grams_reliable_sec":$gtR%.1f,"grams_ckpt_mb":${gw / (1 << 20)},""" +
      f""""grams_identical":${gL == gR},""" +
      f""""pagerank_rows":${rL._1},"pagerank_local_sec":$rtL%.1f,""" +
      f""""pagerank_reliable_sec":$rtR%.1f,"pagerank_ckpt_mb":${rw / (1 << 20)},""" +
      f""""pagerank_identical":${rL == rR}}""")
    require(gL == gR && rL == rR, "regimes disagree")
    spark.stop()
  }
}
