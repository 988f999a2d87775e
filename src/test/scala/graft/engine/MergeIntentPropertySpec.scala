package graft.engine

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property checks on the merge-intent crash protocol's two load-bearing
 * pieces: the JSON round-trip (a recovery reading back a crashed
 * driver's intent must see EXACTLY what was written — any drift decides
 * the wrong way) and the watermark-coverage predicate
 * ([[MergeIntent.produceCommitted]]) against a direct reference
 * evaluation. (Deterministic seeds; plain ScalaCheck generators — the
 * scalatest bridge artifact is not in the offline cache.)
 */
class MergeIntentPropertySpec extends SparkSpec {

  private val genRange: Gen[TxnRange] = for {
    p <- Gen.choose(0, 15)
    first <- Gen.choose(0L, 1000000L)
    count <- Gen.choose(0L, 100000L)
  } yield TxnRange(p, first, count)

  private val genIntent: Gen[MergeIntent] = for {
    dir <- Gen.identifier.map(s => s"/wh/t/tmp-merge-${s.take(12)}")
    files <- Gen.listOf(Gen.identifier.map(f => s"$dir/$f.parquet"))
    deletes <- Gen.choose(0L, 1000L)
    inserts <- Gen.choose(0L, 1000L)
    ranges <- Gen.option(Gen.listOf(genRange).map(_.toVector))
  } yield MergeIntent(dir, files.toVector, deletes, inserts, ranges)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("intent JSON round-trips exactly for arbitrary intents") {
    (1 to 300).foreach { i =>
      val intent = sample(genIntent, 7000L + i)
      assert(MergeIntent.fromJson(intent.toJson) == intent,
        s"round-trip drift at seed ${7000 + i}: $intent")
    }
  }

  test("produceCommitted agrees with a direct evaluation for arbitrary watermarks") {
    val genWm: Gen[Map[Int, Long]] = Gen.mapOf(
      Gen.zip(Gen.choose(0, 15), Gen.choose(0L, 1200000L)))
    (1 to 300).foreach { i =>
      val intent = sample(genIntent, 9000L + i)
      val wm = sample(genWm, 9500L + i)
      val expected = intent.produceRanges match {
        case None => false // ids never fixed: provably uncommitted
        case Some(rs) =>
          // committed iff EVERY range lies fully below its partition's
          // watermark (the atomic watermark write covers all partitions)
          rs.forall(r => r.first + r.count <= wm.getOrElse(r.partition, 0L))
      }
      assert(intent.produceCommitted(wm) == expected,
        s"decision drift at seed ${9000 + i}: $intent vs $wm")
    }
  }

  test("the decision is monotone in the watermark (a commit can never un-commit)") {
    (1 to 200).foreach { i =>
      val intent = sample(genIntent, 11000L + i)
      val wm = sample(Gen.mapOf(
        Gen.zip(Gen.choose(0, 15), Gen.choose(0L, 1200000L))), 11500L + i)
      if (intent.produceCommitted(wm)) {
        val advanced = wm.map { case (p, w) => p -> (w + 1000L) }
        assert(intent.produceCommitted(advanced),
          s"decision regressed under watermark advance at seed ${11000 + i}")
      }
    }
  }
}
