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

  test("q_dedup_keep_best windows are all partitioned (no global funnel)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LW}
    val df = graft.SparkEntry.queries("q_dedup_keep_best")(spark, sf())
    val globals = df.queryExecution.optimizedPlan.collect {
      case w: LW if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty, "a window lost its partitioning — single-task sort at scale")
  }

  test("q_shuffle_shards assignment plans without joins or windows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJ, Window => LW}
    val df = graft.SparkEntry.queries("q_shuffle_shards")(spark, sf())
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collect { case j: LJ => j }.isEmpty,
      "the seeded permutation must stay a pure projection — no join crept in")
    assert(plan.collect { case w: LW => w }.isEmpty,
      "no window — per-shard order is a sort key, not a rank")
  }
}
