package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {

  import SparkSpec._

  test("asOf: latest right row at or before each left time, per key") {
    import session.implicits._
    val left = Seq((1, 10L, "l1"), (1, 20L, "l2"), (1, 5L, "l0"), (2, 10L, "l3"))
      .toDF("k", "t", "lname")
    val right = Seq((1, 10L, 100L, 1.0), (1, 15L, 101L, 2.0), (2, 11L, 102L, 3.0))
      .toDF("k", "t", "rid", "v")
    val out = Joins.asOf(left, right, key = "k", leftTime = "t", rightTime = "t",
      rightPayload = Seq("rid" -> "rid", "v" -> "rv"), rightOrder = "rid")
      .select($"lname", $"rid", $"rv")
      .collect().map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out("l1") == ((Some(100L), Some(1.0))))  // tie at t=10: <= matches
    assert(out("l2") == ((Some(101L), Some(2.0))))  // latest of {10, 15}
    assert(out("l0") == ((None, None)))             // nothing at or before t=5
    assert(out("l3") == ((None, None)))             // right row is later (11 > 10)
  }

  test("asOf: equal-time right duplicates resolve to the largest order key") {
    import session.implicits._
    val left = Seq((1, 10L)).toDF("k", "t")
    val right = Seq((1, 10L, 7L), (1, 10L, 9L), (1, 10L, 8L)).toDF("k", "t", "rid")
    val out = Joins.asOf(left, right, "k", "t", "t", Seq("rid" -> "rid"), "rid")
      .collect()(0).getAs[Long]("rid")
    assert(out == 9L)
  }

  test("intervalOverlapBinned: exact pairs, once each, across bin boundaries") {
    import session.implicits._
    val left = Seq((1L, 0L, 30L), (2L, 10L, 12L), (3L, 40L, 41L), (4L, 13L, 13L))
      .toDF("lid", "l_lo", "l_hi")
    val right = Seq((10L, 5L, 6L), (11L, 12L, 20L), (12L, 31L, 39L), (13L, 30L, 30L))
      .toDF("rid", "r_lo", "r_hi")
    val got = Joins.intervalOverlapBinned(left, right,
        "l_lo", "l_hi", "r_lo", "r_hi", binWidth = 7)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    // brute-force truth: closed-interval overlap
    val l = Seq((1L, 0L, 30L), (2L, 10L, 12L), (3L, 40L, 41L), (4L, 13L, 13L))
    val r = Seq((10L, 5L, 6L), (11L, 12L, 20L), (12L, 31L, 39L), (13L, 30L, 30L))
    val expected = (for {
      (li, llo, lhi) <- l; (ri, rlo, rhi) <- r if llo <= rhi && rlo <= lhi
    } yield (li, ri)).toSet
    // the fixture exercises: multi-bin pair (1,11), touching endpoints
    // (1,13) and (2,11), and non-overlap despite shared bin (3,12)
    assert(expected == Set((1L, 10L), (1L, 11L), (1L, 13L), (2L, 11L), (4L, 11L)))
    assert(got == expected)
    // once each — a multi-bin overlap must not duplicate
    val n = Joins.intervalOverlapBinned(left, right,
      "l_lo", "l_hi", "r_lo", "r_hi", binWidth = 3).count()
    assert(n == expected.size)
  }

  test("rangeBinned: exact containment across bin boundaries") {
    import session.implicits._
    val points = Seq(0L, 5L, 7L, 10L, 15L, 21L).toDF("p")
    val intervals = Seq((1L, 5L, 9L), (2L, 0L, 21L), (3L, 16L, 16L))
      .toDF("iid", "lo", "hi")
    val out = Joins.rangeBinned(points, intervals, "p", "lo", "hi", binWidth = 7)
      .select($"p", $"iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set(
      0L -> 2L, 5L -> 1L, 5L -> 2L, 7L -> 1L, 7L -> 2L,
      10L -> 2L, 15L -> 2L, 21L -> 2L)
    assert(out == expected)
  }

  test("rangeBinned produces no duplicate pairs (one bin per point)") {
    import session.implicits._
    val points = Seq(10L).toDF("p")
    val intervals = Seq((1L, 0L, 100L)).toDF("iid", "lo", "hi") // spans many bins
    val out = Joins.rangeBinned(points, intervals, "p", "lo", "hi", binWidth = 7)
    assert(out.count() == 1)
  }

  test("saltedAgg matches single-phase aggregation exactly") {
    import session.implicits._
    val df = session.read.parquet(sf("sf0.001") + "/events.parquet")
    val salted = Skew.saltedAgg(df, col("event_type"), saltBuckets = 8,
      Seq("n" -> ((count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))),
        "mx" -> ((max($"value"), (c: org.apache.spark.sql.Column) => max(c)))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val plain = df.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"value").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(salted == plain)
  }

  test("saltedAgg with an explicit saltOn spreads byte-identical rows") {
    import session.implicits._
    // count-style facts: every row of the hot key is byte-identical, so
    // the default full-row content salt degenerates to ONE bucket; an
    // explicit varying salt source (here a synthetic uniform column an
    // ingest pipeline would have, e.g. an id) restores the spread — and
    // the aggregate stays exact either way
    val df = (0 until 4096).map(i => ("hot", i.toLong)).toDF("k", "rid")
    val spread = df.withColumn("__s",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"rid"), lit(8L)))
      .select($"__s").distinct().count()
    assert(spread == 8L, "salt source must actually vary")
    val salted = Skew.saltedAgg(df.select($"k", $"rid"), col("k"), saltBuckets = 8,
      Seq("n" -> ((count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)))),
      saltOn = Seq($"rid"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("hot" -> 4096L))
    // degenerate default documented in the scaladoc: identical rows share
    // one salt — result still exact, only the spread is lost
    val dflt = Skew.saltedAgg(df.select($"k"), col("k"), saltBuckets = 8,
      Seq("n" -> ((count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dflt == Map("hot" -> 4096L))
  }

  test("asOf tolerance: stale matches null out, fresh ones survive") {
    import session.implicits._
    val left = Seq((1L, 100L, "x"), (1L, 500L, "y"), (2L, 50L, "z"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 90L, 7L), (2L, 10L, 8L)).toDF("k", "t", "rid")
    val out = Joins.asOf(left, right, key = "k", leftTime = "t",
        rightTime = "t", rightPayload = Seq("rid" -> "rid"),
        rightOrder = "rid", tolerance = Some(50L))
      .orderBy(col("t")).collect()
      .map(r => (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // k=1 t=100: match at 90 (age 10 ≤ 50) → 7
    // k=1 t=500: match at 90 (age 410 > 50) → null
    // k=2 t=50:  match at 10 (age 40 ≤ 50)  → 8
    assert(out === Array(("z", 8L), ("x", 7L), ("y", -1L)))
  }

  test("saltedJoin equals the plain join exactly, including dup/missing keys") {
    import session.implicits._
    // left has a hot key (1 ×6), a key missing on the right (3), and
    // right has a key missing on the left (9) plus a DUPLICATE key (2 ×2,
    // each left row must pair with both)
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"), (1L, "e"),
      (1L, "f"), (2L, "g"), (3L, "h")).toDF("k", "lv")
    val right = Seq((1L, 10L), (2L, 20L), (2L, 21L), (9L, 90L)).toDF("k", "rv")
    val salted = Skew.saltedJoin(left, right, "k", saltBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val plain = left.join(right, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(salted === plain)
    assert(salted.count(_._1 == 2L) === 2) // duplicate right rows both paired
  }

  test("approx_count_distinct (rsd 1%) lands within 5% of exact on real data") {
    val r = session.read.parquet(sf("sf0.01") + "/orders.parquet")
      .agg(approx_count_distinct(col("o_custkey"), rsd = 0.01).as("a"),
        countDistinct(col("o_custkey")).as("e"))
      .collect()(0)
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }
}
