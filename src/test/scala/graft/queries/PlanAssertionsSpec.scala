package graft.queries

import graft.SparkSpec

/** Regression locks on the physical-plan properties PLANS.md documents:
  * scan pruning/pushdown, the broadcast dimension join, and the
  * TakeOrderedAndProject top-k. A change that silently loses one of these
  * costs nothing at test scale and everything at 100 TB — so they are
  * asserted, not just audited.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry
      .queries(name)(spark, dir)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q2_filter pushes predicates and prunes columns at the scan") {
    val plan = planOf("q2_filter")
    assert(plan.contains("PushedFilters:"), plan.take(500))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed")
    assert(plan.contains("EqualTo(l_returnflag,R)"), "returnflag equality not pushed")
    // pruned read schema: no l_comment/l_tax etc.
    assert(!plan.contains("l_comment"), "scan reads unprojected columns")
  }

  test("q3_join_agg broadcasts the customer dimension") {
    val plan = planOf("q3_join_agg")
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("q12_topk plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q12_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }
}
