package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {

  test("resampleCarryForward: grid, last-per-bucket, gap fill, flags") {
    import spark.implicits._
    // key A: obs at t=5 (v=1.0), t=7 (v=2.0) [same bucket 0], t=25 (v=9.0)
    //   step 10 → buckets 0,10,20; bucket 10 is a gap carrying 2.0 forward
    // key B: single obs → single bucket
    val df = Seq(
      ("A", 5L, 1L, 1.0), ("A", 7L, 2L, 2.0), ("A", 25L, 3L, 9.0),
      ("B", 42L, 4L, 7.0)
    ).toDF("k", "ts", "eid", "v")
    val out = TimeSeries.resampleCarryForward(df, "k", "ts", "v", "eid", 10L)
      .orderBy(col("key"), col("bucket_ts")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out === Array(
      ("A", 0L, 2.0, false),  // last obs in bucket (t=7) wins
      ("A", 10L, 2.0, true),  // gap: carried forward
      ("A", 20L, 9.0, false),
      ("B", 40L, 7.0, false)))
  }

  test("resampleCarryForward: long gaps fill every intermediate bucket") {
    import spark.implicits._
    val df = Seq(("k", 0L, 1L, 5.0), ("k", 50L, 2L, 6.0)).toDF("k", "ts", "eid", "v")
    val out = TimeSeries.resampleCarryForward(df, "k", "ts", "v", "eid", 10L)
      .orderBy(col("bucket_ts")).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out === Array((0L, 5.0, false), (10L, 5.0, true), (20L, 5.0, true),
      (30L, 5.0, true), (40L, 5.0, true), (50L, 6.0, false)))
  }

  test("resampleCarryForward: tie on ts broken by tie column (larger wins)") {
    import spark.implicits._
    val df = Seq(("k", 3L, 1L, 1.0), ("k", 3L, 2L, 8.0)).toDF("k", "ts", "eid", "v")
    val out = TimeSeries.resampleCarryForward(df, "k", "ts", "v", "eid", 10L)
      .collect().map(r => r.getDouble(2))
    assert(out === Array(8.0))
  }

  test("nanosecond-scale timestamps bucket exactly (no double rounding)") {
    import spark.implicits._
    // 2^60-ish nanos: far beyond a double's 52-bit exact-integer range
    val big = 1300000000000000001L
    val df = Seq(("k", big, 1L, 1.5)).toDF("k", "ts", "eid", "v")
    val out = TimeSeries.resampleCarryForward(df, "k", "ts", "v", "eid",
        3600000000000L)
      .collect().map(r => r.getLong(1))
    assert(out === Array(big - big % 3600000000000L))
  }
}
