package graft.queries

import graft.SparkSpec

/**
 * Registry-integrity guard. Round 6 lost 20 time-based queries from the
 * correctness report WITHOUT any test failing: a testdata type change made
 * their plans break, the driver's Verify caught the exceptions, and the
 * broken queries simply vanished from the report (178 registered, 158
 * checked). Nothing in-repo asserted the registry's size or that every
 * registered query still builds. This suite makes that class of break loud:
 *
 *  - queries and oracles must cover exactly the same names (a query without
 *    an oracle silently downgrades to a weaker rows-only check);
 *  - the registry size is pinned — a vanished or accidentally-dropped query
 *    fails the build, and adding a query forces the constant (and therefore
 *    this guard) to be updated consciously;
 *  - every query is BUILT against sf0.001 and its analyzed plan forced.
 *    For the lazy relational queries this is a cheap plan-time check (the
 *    round-6 failures were plan-time DATATYPE_MISMATCH); the engine and
 *    streaming queries execute eagerly while being built (topics produced,
 *    micro-batch streams drained to completion), so runtime-only breaks —
 *    STREAM_FAILED, mid-stream cast errors, ClassCastException in typed
 *    pipelines — surface here too, not just plan-time ones.
 *
 * Cost note: the eager engine/streaming queries dominate this suite's
 * runtime; the pure relational majority only pays analysis. That cost is
 * the price of the guarantee the driver's correctness gate assumes: every
 * registered query can actually run.
 */
class RegistrySpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(q == o, s"query/oracle drift — missing oracles: ${(q -- o).toSeq.sorted}; " +
      s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  test(s"registry holds exactly ${RegistrySpec.Expected} queries") {
    val n = graft.SparkEntry.queries.size
    assert(n == RegistrySpec.Expected,
      s"registry size changed ($n vs ${RegistrySpec.Expected}) — if intentional, " +
        "update RegistrySpec.Expected in the same commit")
  }

  for (name <- graft.SparkEntry.queries.keySet.toSeq.sorted) {
    test(s"$name builds and analyzes against sf0.001") {
      try {
        val df = graft.SparkEntry.queries(name)(spark, sf())
        assert(df.queryExecution.analyzed != null)
      } finally spark.catalog.clearCache()
    }
  }
}

object RegistrySpec {
  /** Pinned registry size — update consciously when adding/removing queries. */
  val Expected = 178
}
