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
 *  - every query is BUILT and EXECUTED against sf0.001. Building alone
 *    would catch the round-6 plan-time DATATYPE_MISMATCH failures and the
 *    eager engine/streaming queries' runtime breaks (they run while being
 *    built: topics produced, micro-batch streams drained to completion) —
 *    but 4 of round 6's 20 failures were runtime-only errors a plan check
 *    cannot see (mid-stream CAST_INVALID_INPUT, ClassCastException in a
 *    typed pipeline), so the lazy relational majority is counted too.
 *
 * Cost note: the eager engine/streaming queries dominate this suite's
 * runtime; the relational majority executes in fractions of a second at
 * sf0.001. That cost is the price of the guarantee the driver's
 * correctness gate assumes: every registered query can actually run.
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
    test(s"$name builds and executes against sf0.001") {
      try {
        val df = graft.SparkEntry.queries(name)(spark, sf())
        assert(df.queryExecution.analyzed != null)
        df.count(): Unit // runtime-only breaks must fail here, not vanish
      } finally spark.catalog.clearCache()
    }
  }
}

object RegistrySpec {
  /** Pinned registry size — update consciously when adding/removing queries. */
  val Expected = 227
}
