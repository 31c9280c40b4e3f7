package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards (the 100 TB checklist from SCALING.md):
  * pushdown must reach the scans, dimension joins must broadcast, top-k
  * must avoid a global sort. These lock the *physical* properties the
  * correctness gate can't see.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    import org.apache.spark.sql.execution.ExplainMode
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
  }

  test("q6: filters are pushed to the parquet scan") {
    val p = plan("q6_revenue_change")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed")
    assert(p.contains("LessThan(l_quantity,24.0)"), "quantity filter not pushed")
  }

  test("q6: scan reads only the referenced columns") {
    val p = plan("q6_revenue_change")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), "unpruned column in scan")
  }

  test("q3: dimension joins broadcast") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast join")
  }

  test("topk plans TakeOrderedAndProject, not a global sort") {
    val p = plan("topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("join_semi and join_anti plan semi/anti hash joins") {
    assert(plan("join_semi").contains("LeftSemi"))
    assert(plan("join_anti").contains("LeftAnti"))
  }
}
