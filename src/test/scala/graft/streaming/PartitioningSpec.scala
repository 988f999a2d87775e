package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.GraftDriver

/**
 * Reported physical layout (`SupportsReportPartitioning`): the scan plans
 * one slice per topic partition, each carrying its partition id as the
 * partition key, so the output is `KeyGroupedPartitioning(partition)`.
 * With `spark.sql.sources.v2.bucketing.enabled`, partition-keyed
 * aggregations run WITHOUT an exchange and two co-partitioned topics join
 * as a storage-partitioned join — at 100 TB the difference between
 * shuffling the whole log and shuffling nothing.
 */
class PartitioningSpec extends SparkSpec {

  private def mkTopics(): GraftDriver = {
    import spark.implicits._
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-spj").toString)
    for (t <- Seq("a", "b")) {
      d.createTopic(t, partitions = 4)
      val n = if (t == "a") 80 else 40
      val rows = (0 until n).map(i => (s"""{"k":$i}""", i % 4)).toDF("metadata", "partition")
      d.openTopic(t).producer().produce(rows)
    }
    d
  }

  private def load(d: GraftDriver, t: String) =
    spark.read.format("graft").option("warehouse", d.warehouse).option("topic", t).load()

  private def withBucketing[T](body: => T): T = {
    val prev = (spark.conf.get("spark.sql.sources.v2.bucketing.enabled", "false"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", prev._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._2)
    }
  }

  private def shuffles(p: SparkPlan): Seq[SparkPlan] = flatten(p).filter {
    case _: ShuffleExchangeLike => true
    case _ => false
  }

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("partition-keyed aggregation runs without an exchange") {
    val d = mkTopics()
    withBucketing {
      val agg = load(d, "a").groupBy(col("partition")).agg(count(lit(1)).as("cnt"))
      val rows = agg.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(rows == Map(0 -> 20L, 1 -> 20L, 2 -> 20L, 3 -> 20L))
      assert(shuffles(agg.queryExecution.executedPlan).isEmpty,
        s"expected a shuffle-free partition-keyed aggregate:\n${agg.queryExecution.executedPlan}")
    }
  }

  test("two co-partitioned topics join storage-partitioned: zero exchanges") {
    val d = mkTopics()
    withBucketing {
      // per-partition summaries of both topics, joined on partition: both
      // aggregates AND the join ride the reported layout — no exchange
      // anywhere in the query. SUM keeps both sides un-pushable: a
      // COUNT/MIN/MAX-only aggregate would push down to watermark
      // arithmetic instead (strictly cheaper — zero file IO — but Spark
      // builds pushed-aggregate relations without the layout, so the tiny
      // summaries would then shuffle; see GraftAggScan).
      val aAgg = load(d, "a").groupBy(col("partition"))
        .agg(count(lit(1)).as("cnt_a"), sum(col("event_id")).as("sum_a"))
      val bAgg = load(d, "b").groupBy(col("partition")).agg(sum(col("event_id")).as("sum_b"))
      val j = aAgg.join(bAgg, Seq("partition"))
      val rows = j.collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // 20 ids per partition in a (sum 0..19 = 190), 10 in b (sum 0..9 = 45)
      assert(rows == (0 until 4).map(p => p -> ((20L, 190L, 45L))).toMap)
      val plan = j.queryExecution.executedPlan
      assert(shuffles(plan).isEmpty, s"expected a zero-exchange join:\n$plan")
      assert(flatten(plan).exists(_.isInstanceOf[SortMergeJoinExec]),
        s"expected a sort-merge join over the co-partitioned layout:\n$plan")
    }
  }

  test("layout is not reported when partition is pruned away") {
    val d = mkTopics()
    withBucketing {
      // projecting partition out must fall back to UnknownPartitioning —
      // the key expression can't resolve against the scan output
      val agg = load(d, "a").select(col("event_id"))
        .groupBy((col("event_id") % 4).as("g")).agg(count(lit(1)).as("cnt"))
      assert(agg.collect().length == 4)
      assert(shuffles(agg.queryExecution.executedPlan).nonEmpty,
        "a non-partition grouping must still shuffle")
    }
  }
}
