package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.GraftDriver

/**
 * Aggregate pushdown (`SupportsPushDownAggregates`): COUNT/MIN/MAX over
 * `event_id`, optionally grouped by `partition`, answered from watermark
 * arithmetic — O(1) metadata reads on a topic of any size, because ids
 * are dense `[0, watermark)` per partition until a row-dropping op runs.
 * The moment that invariant is not provable (gap marker, filters), the
 * builder refuses and Spark falls back to a real scan — correctness never
 * rides on the shortcut.
 */
class AggPushdownSpec extends SparkSpec {

  private def mkTopic(): GraftDriver = {
    import spark.implicits._
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-aggpd").toString)
    d.createTopic("t", partitions = 4)
    d.openTopic("t").producer().produce(
      (0 until 202).map(i => (s"""{"k":$i}""", i % 4)).toDF("metadata", "partition"))
    d
  }

  private def load(d: GraftDriver, t: String = "t") =
    spark.read.format("graft").option("warehouse", d.warehouse).option("topic", t).load()

  private def pushed(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("GraftAggScan")

  test("global COUNT/MIN/MAX answer from watermarks, no file scan") {
    val d = mkTopic()
    val agg = load(d).agg(count(lit(1)).as("n"),
      min(col("event_id")).as("mn"), max(col("event_id")).as("mx"))
    val r = agg.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((202L, 0L, 50L)))
    assert(pushed(agg), s"expected the aggregate pushed down:\n${agg.queryExecution.executedPlan}")
  }

  test("grouped by partition: per-partition counts and max ids") {
    val d = mkTopic()
    val agg = load(d).groupBy(col("partition"))
      .agg(count(lit(1)).as("n"), max(col("event_id")).as("mx"))
    val rows = agg.collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map(0 -> ((51L, 50L)), 1 -> ((51L, 50L)),
      2 -> ((50L, 49L)), 3 -> ((50L, 49L))))
    assert(pushed(agg))
  }

  test("empty topic: COUNT 0, MIN/MAX null") {
    val d = mkTopic()
    d.createTopic("empty", partitions = 2)
    val r = load(d, "empty").agg(count(lit(1)).as("n"), min(col("event_id")).as("mn"))
      .collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("a compliance delete permanently disables the shortcut — values stay right") {
    val d = mkTopic()
    assert(!d.catalog.mayHaveIdGaps("t"))
    d.openTopic("t").deleteWhere(get_json_object(col("metadata"), "$.k") === "5")
    assert(d.catalog.mayHaveIdGaps("t"))
    val agg = load(d).agg(count(lit(1)).as("n"))
    assert(agg.collect().head.getLong(0) == 201L)
    assert(!pushed(agg), "gap-marked topic must fall back to a real scan")
  }

  test("filters and unsupported aggregates fall back to a real scan") {
    val d = mkTopic()
    val filtered = load(d).filter(col("event_id") < 10).agg(count(lit(1)).as("n"))
    assert(filtered.collect().head.getLong(0) == 40L)
    assert(!pushed(filtered), "a filtered aggregate must read the log")
    val sums = load(d).agg(sum(col("event_id")).as("s"))
    assert(sums.collect().head.getLong(0) == (0 until 51).sum * 2L + (0 until 50).sum * 2L)
    assert(!pushed(sums), "SUM is not watermark-derivable")
  }

  test("targets restrict the arithmetic to the chosen partitions") {
    val d = mkTopic()
    val agg = spark.read.format("graft").option("warehouse", d.warehouse)
      .option("topic", "t").option("targets", "1,2").load()
      .groupBy(col("partition")).agg(count(lit(1)).as("n"))
    val rows = agg.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(rows == Map(1 -> 51L, 2 -> 50L))
    assert(pushed(agg))
  }
}
