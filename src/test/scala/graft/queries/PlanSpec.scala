package graft.queries

import graft.SparkSpec

/**
 * Physical-plan back-stops for the relational flagships — cheap insurance
 * that future edits don't silently de-optimize the layer: the dimension
 * joins must stay broadcast (no shuffle of the fact side against a
 * 25-row dimension) and the big aggregation must keep its map-side
 * partial phase (the shuffle carries one row per group per task, not one
 * row per input row).
 */
class PlanSpec extends SparkSpec {

  /** Final (post-AQE) physical plan string of a registered query. */
  private def finalPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf())
    df.collect() // materialize so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("q_join_revenue broadcasts the dimension side of every dim join") {
    val plan = finalPlan("q_join_revenue")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    // nation and region are explicit broadcast(); customer/orders joins may
    // legitimately shuffle (both scale with the fact data) — the invariant
    // is that NO dimension join degraded to a SortMergeJoin
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin(") ||
      !plan.contains("n_nationkey") || !plan.contains("r_regionkey"),
      s"a dimension join degraded to SortMergeJoin:\n$plan")
  }

  test("q_agg_pricing keeps map-side partial aggregation") {
    val plan = finalPlan("q_agg_pricing")
    assert(plan.contains("partial_sum"),
      s"expected a partial HashAggregate before the shuffle, plan:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected HashAggregate:\n$plan")
  }
}
