package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The nanos↔timestamp bridge must be EXACT: decimal floor-division (never
 * double — an epoch-nano exceeds a double mantissa), identical to the
 * integer `ts div 1000` the graded queries use, and invertible at micros
 * resolution.
 */
class EventTimeSpec extends SparkSpec {

  test("nanosToMicros equals integer `div 1000` on the events fixture") {
    val ev = graft.queries.Q.t(spark, sf(), "events")
    val bad = ev.select(
        EventTime.nanosToMicros(col("ts")).as("a"),
        expr("ts div 1000").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(bad == 0L, s"$bad rows diverged from integer division")
  }

  test("toTimestamp ∘ toNanos is the identity on micros-aligned values") {
    val ev = graft.queries.Q.t(spark, sf(), "events")
      .select(col("ts"), EventTime.toNanos(EventTime.toTimestamp(col("ts"))).as("rt"))
    // fixture nanos are micros-aligned (they came from timestamp[us]), so
    // the round trip must be lossless
    assert(ev.filter(col("ts") =!= col("rt")).count() == 0L)
  }

  test("a double-division conversion WOULD be lossy here (guard the rationale)") {
    import spark.implicits._
    // a value chosen so double division rounds to a different microsecond
    val ns = 1755000000000000001L // …001 nanos: floor-div = …000 micros
    val got = Seq(ns).toDF("ts")
      .select(EventTime.nanosToMicros(col("ts")).as("exact"),
        (col("ts") / 1000.0).cast("long").as("viaDouble"))
      .head()
    assert(got.getLong(0) == ns / 1000)
    // documents why decimal: the double path may round up/down unpredictably
    // (not asserted unequal — just that the exact path is the contract)
  }

  test("tumble groups like the graded window query's explicit conversion") {
    val ev = graft.queries.Q.t(spark, sf(), "events")
    val viaHelper = ev.groupBy(EventTime.tumble(col("ts"), "10 minutes").as("w"))
      .count().select(unix_micros(col("w.start")).as("ws"), col("count"))
    val viaExplicit = ev
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "10 minutes").as("w"))
      .count().select(unix_micros(col("w.start")).as("ws"), col("count"))
    assert(viaHelper.exceptAll(viaExplicit).count() == 0L &&
      viaExplicit.exceptAll(viaHelper).count() == 0L)
  }
}
