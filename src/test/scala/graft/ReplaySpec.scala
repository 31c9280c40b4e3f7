package graft

import org.scalatest.funsuite.AnyFunSuite

/** The deterministic micro-batch replay harness that feeds the
  * stream_* oracle gate rows (graft.streaming.Replay): schedule
  * construction, batch_id tagging, and schedule-invariance of a
  * mergeable twin (the property the gate's oracles rely on).
  */
class ReplaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("timeSlices: contiguous cover, deterministic, bounds") {
    val rows = (1 to 10).toSeq
    val s4 = graft.streaming.Replay.timeSlices(rows, 4)
    assert(s4.flatten == rows, "slices concatenate to the input in order")
    assert(s4.forall(_.nonEmpty))
    assert(graft.streaming.Replay.timeSlices(rows, 100).size == 10,
      "never more slices than rows")
    assert(graft.streaming.Replay.timeSlices(Seq.empty[Int], 3).isEmpty)
  }

  test("run tags emissions with their micro-batch id (update mode)") {
    import spark.implicits._
    val batches = Seq(Seq(("a", 1.0), ("b", 2.0)), Seq(("a", 3.0)))
    val out = graft.streaming.Replay.run(spark, batches, "update") { ds =>
      graft.streaming.StatefulOps.runningAgg(ds.groupByKey(_._1)).toDF()
    }.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).sortBy(t => (t._1, t._2))
    // batch 0 emits both keys' first states; batch 1 re-emits only "a"
    assert(out.toSeq == Seq((0L, "a", 1L, 1.0), (0L, "b", 1L, 2.0),
      (1L, "a", 2L, 4.0)), s"got ${out.toSeq}")
  }

  test("schedule invariance: 1-batch and 3-batch replays agree on final state") {
    import spark.implicits._
    val rows = (1 to 30).map(i => ("k" + (i % 3), i.toDouble))
    def finalState(nBatches: Int): Map[String, (Long, Double)] = {
      val out = graft.streaming.Replay.run(spark,
        graft.streaming.Replay.timeSlices(rows, nBatches), "update") { ds =>
        graft.streaming.StatefulOps.runningAgg(ds.groupByKey(_._1)).toDF()
      }
      out.collect().map(r => (r.getString(1),
          (r.getLong(0), r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).view
        .mapValues(v => { val m = v.map(_._2).maxBy(_._1); (m._2, m._3) })
        .toMap
    }
    assert(finalState(1) == finalState(3))
  }
}
