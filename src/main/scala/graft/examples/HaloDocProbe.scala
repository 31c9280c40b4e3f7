package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** The multi-GB-single-document caveat probe (VERDICT r14 next #3):
  * the global suffix ranking's lead used to window by document, so ONE
  * document's positions landed in ONE task. With blocked leads
  * (SubstringDedup.leadByPos, spark.graft.substring.blockChars) a
  * 64 M-char single document must spread over ~16 tasks of ≤ block +
  * minWidth positions each, with exact planted-gram results.
  *
  * The probe plants one 40-char sentinel k=8 times inside an otherwise
  * random 64 M-char document (plus once in a small twin doc), runs
  * duplicatedGrams at the 4 M default block AND at a single-block
  * override (the old per-doc-window regime), and reports for each:
  * elapsed, the max shuffle-read records any ONE task saw (the
  * serialization metric), and planted-gram exactness (every 15-gram of
  * the sentinel must appear with count 9; count must be 26 grams).
  *
  *   sbt "runMain graft.examples.HaloDocProbe [chars]"
  *
  * The reference cannot represent this input at all: its corpus cap is
  * ≤ 2 GB total on one device (nvtext/deduplicate.hpp:40) — superset
  * territory.
  */
object HaloDocProbe {
  def main(args: Array[String]): Unit = {
    val chars = if (args.nonEmpty) args(0).toInt else 64 << 20
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sentinel = "##HALO*PROBE*SENTINEL*0123456789abcd####" // 40 chars
    require(sentinel.length == 40)
    // Filler: 8-char base-26 groups of SPLITMIX-mixed group counters —
    // no LCG lag structure (java.util.Random filler measurably repeats
    // 15-grams at 64 M draws) and no constant-digit runs (a plain
    // counter encoding collides across phases wherever high digits sit
    // at 'a'). Accidental repeats are birthday-bounded (~1e-6); the
    // exactness check below verifies every reported gram against a
    // JVM-side scan, so even one would not make the probe lie.
    def mix(k: Long): Long = {
      var z = k * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val sb = new java.lang.StringBuilder(chars + 8 * sentinel.length)
    val gap = chars / 8
    var ctr = 0L
    (0 until 8).foreach { _ =>
      var j = 0
      while (j < gap) {
        var v = mix(ctr) & Long.MaxValue; ctr += 1
        var k = 0
        while (k < 8) { sb.append(('a' + (v % 26)).toChar); v /= 26; k += 1 }
        j += 8
      }
      sb.append(sentinel)
    }
    val big = sb.toString
    val docs = Seq((1L, big), (2L, "twin:" + sentinel + ":niwt"))
      .toDF("doc_id", "text")

    val maxTaskRecords = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          maxTaskRecords.updateAndGet(x => math.max(x, r))
        }
      }
    })

    def run(label: String, block: Option[Int]): String = {
      block.foreach(b => spark.conf.set(
        graft.operators.SubstringDedup.BlockCharsKey, b.toString))
      try {
        maxTaskRecords.set(0)
        val t0 = System.nanoTime()
        val got = graft.operators.SubstringDedup
          .duplicatedGrams(docs, "doc_id", "text", minWidth = 15)
          .as[(String, Long)].collect().toMap
        val secs = (System.nanoTime() - t0) / 1e9
        // Ground-truth check, filler-agnostic: every expected sentinel
        // gram must be reported with count 9 (8 plants in `big` + 1 in
        // the twin), and any OTHER reported gram must match its true
        // occurrence count from a JVM-side scan of both docs — so an
        // accidental filler repeat shows up as a verified true
        // duplicate, never as silent inexactness.
        def occurrences(g: String): Long =
          Seq(big, "twin:" + sentinel + ":niwt").map { t =>
            var (n, i) = (0L, t.indexOf(g))
            while (i >= 0) { n += 1; i = t.indexOf(g, i + 1) }
            n
          }.sum
        val expected = (0 to sentinel.length - 15)
          .map(p => sentinel.substring(p, p + 15) -> 9L).toMap
        val exact = expected.forall { case (g, n) => got.get(g).contains(n) } &&
          (got.keySet -- expected.keySet).forall(g => got(g) == occurrences(g))
        val extras = (got.keySet -- expected.keySet).size
        Thread.sleep(1500) // let straggler TaskEnd events drain
        f"""{"regime":"$label","chars":${big.length},"elapsed_sec":$secs%.1f,""" +
          s""""max_task_shuffle_records":${maxTaskRecords.get},""" +
          s""""grams":${got.size},"extras_verified":$extras,""" +
          s""""planted_exact":$exact}"""
      } finally block.foreach(_ => spark.conf.unset(
        graft.operators.SubstringDedup.BlockCharsKey))
    }

    // blocked (default 4M) first, then the old single-block regime
    // (block >= doc length => one block per doc, per-doc-window shape);
    // args(1) optionally scopes to one regime ("blocked" | "single")
    val regime = if (args.length > 1) args(1) else "both"
    if (regime != "single") println(run("blocked_4M", None))
    if (regime != "blocked") println(run("single_block", Some(1 << 28)))
    spark.stop()
  }
}
