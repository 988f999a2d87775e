package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property check on the read_committed reader filter
 * ([[GraftReaderSupport.outsideExcluded]]): the early-exit forward walk
 * over lo-sorted (possibly overlapping) `[lo, hi)` ranges must agree with
 * a direct "in no range" reference evaluation for arbitrary range sets
 * and probe ids — this predicate decides per-row visibility on EVERY
 * read_committed scan, so any drift silently leaks or hides rows.
 * (Deterministic seeds; plain ScalaCheck generators — the scalatest
 * bridge artifact is not in the offline cache.)
 */
class ExclusionPropertySpec extends SparkSpec {

  private val genRanges: Gen[Seq[(Long, Long)]] = Gen.listOf(for {
    lo <- Gen.choose(0L, 2000L)
    len <- Gen.choose(0L, 300L) // empty ranges allowed: count-0 filtered upstream, harmless here
  } yield (lo, lo + len)).map(_.sortBy(_._1))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("outsideExcluded agrees with direct containment for arbitrary ranges") {
    (1 to 300).foreach { i =>
      val ranges = sample(genRanges, 9100L + i)
      val (exLo, exHi) = {
        val ip = GraftInputPartition(0, 0L, Long.MaxValue, Nil,
          excludeRanges = ranges)
        ip.excludeArrays
      }
      // probe edges of every range plus arbitrary ids
      val probes = ranges.flatMap { case (lo, hi) =>
        Seq(lo - 1, lo, lo + 1, hi - 1, hi, hi + 1)
      } ++ (0 until 50).map(j => sample(Gen.choose(0L, 2500L), 9500L + i * 50 + j))
      probes.foreach { id =>
        val expect = !ranges.exists { case (lo, hi) => id >= lo && id < hi }
        val got = GraftReaderSupport.outsideExcluded(exLo, exHi, id)
        assert(got == expect,
          s"seed ${9100 + i}, id $id, ranges $ranges: got $got, expect $expect")
      }
    }
  }
}
