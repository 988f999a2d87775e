package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{In, LessThan}

import graft.SparkSpec
import graft.engine.GraftDriver

/**
 * Plan-time statistics (`SupportsReportStatistics`) and join-driven runtime
 * pruning (`SupportsRuntimeFiltering`) on the DSv2 topic scan.
 *
 * Why these matter at 100 TB: without reported stats, Catalyst treats every
 * topic scan as "huge" and never auto-broadcasts a small topic (or a small
 * pushed slice of a huge one) — users must hand-hint every join. With dense
 * per-partition ids, the row count of any id window is watermark arithmetic:
 * EXACT and free. Runtime filtering then turns joins on `partition` into
 * directory-level pruning decided by the build side's realized values.
 */
class ScanStatsSpec extends SparkSpec {

  private def freshDriver(): GraftDriver =
    new GraftDriver(spark, Files.createTempDirectory("graft-stats-spec").toString)

  /** Topic with 4 partitions × 50 events; payload ~200 bytes/row so the
    * data column dominates the chunk files. */
  private def mkTopic(d: GraftDriver, name: String): Unit = {
    import spark.implicits._
    d.createTopic(name, partitions = 4)
    val rows = (0 until 200).map { i =>
      // incompressible payload (seeded random) so the data column dominates
      // the chunk files even after parquet compression
      val payload = new Array[Byte](200)
      new scala.util.Random(i).nextBytes(payload)
      (s"""{"k":$i}""", i % 4, payload)
    }.toDF("metadata", "partition", "data")
    d.openTopic(name).producer().produce(rows): Unit
  }

  private def load(d: GraftDriver, name: String) =
    spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", name).load()

  private def scanRelStats(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.stats
    }.head

  test("numRows is exact from the id watermarks; pushed ranges shrink it") {
    val d = freshDriver(); mkTopic(d, "t")
    val full = scanRelStats(load(d, "t"))
    assert(full.rowCount.contains(BigInt(200)))
    // event_id < 10 → 10 ids per partition × 4 (dense ids, no file IO)
    val sliced = scanRelStats(load(d, "t").filter(col("event_id") < 10))
    assert(sliced.rowCount.contains(BigInt(40)))
    assert(sliced.sizeInBytes < full.sizeInBytes)
  }

  test("column pruning shrinks sizeInBytes: metadata-only ≪ with payload") {
    val d = freshDriver(); mkTopic(d, "t")
    val metaOnly = scanRelStats(load(d, "t").select("event_id", "metadata"))
    val withData = scanRelStats(load(d, "t").select("event_id", "metadata", "data"))
    // the ~200-byte payload dominates the sampled footer; metadata-only
    // must report well under half of the full-projection estimate
    assert(metaOnly.sizeInBytes * 2 < withData.sizeInBytes,
      s"metadata-only $metaOnly vs with-payload $withData")
  }

  test("reported stats auto-broadcast a small topic slice (no hint)") {
    val d = freshDriver(); mkTopic(d, "t")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      // big side: ~8 MB of longs, far over the 64 KiB threshold; the topic
      // slice (40 rows) is broadcastable only because the scan REPORTS it
      val big = spark.range(1000000).select(col("id").as("k"), (col("id") % 97).as("v"))
      val slice = load(d, "t").filter(col("event_id") < 10)
        .select(get_json_object(col("metadata"), "$.k").cast("long").as("k"))
      val joined = slice.join(big, "k").agg(sum("v").as("sv"))
      val rows = joined.collect()
      assert(rows.head.getLong(0) == (0 until 40).map(_ % 97).sum)
      val all = finalPlan(joined.queryExecution.executedPlan)
      val bhj = all.collect { case j: BroadcastHashJoinExec => j }
      assert(bhj.nonEmpty, "expected an auto-broadcast hash join from reported stats")
      // the graft side must be under the broadcast exchange, not the 8 MB range
      val buildHasGraft = all.collect { case e: BroadcastExchangeExec => e }
        .exists(e => finalPlan(e).exists {
          case b: BatchScanExec => b.scan.isInstanceOf[GraftScan]
          case _ => false
        })
      assert(buildHasGraft, "expected the topic slice on the broadcast side")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("runtime filter() narrows partitions and id ranges before planning") {
    val d = freshDriver(); mkTopic(d, "t")
    val tbl = new GraftTopicTable(d.warehouse, "t", None, None, None)
    val scan = tbl.newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .build().asInstanceOf[GraftScan]
    assert(scan.toBatch.planInputPartitions().length == 4)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("partition", Array(0, 2))))
    assert(scan.narrowedTargets.contains(Set(0, 2)))
    assert(scan.toBatch.planInputPartitions().length == 2)
    // realized event_id values narrow to a covering range (skipping only)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("event_id", Array(3L, 7L))))
    assert(scan.narrowedIdRange == (Some(3L), Some(8L)))
    val planned = scan.toBatch.planInputPartitions()
    assert(planned.forall { ip =>
      val g = ip.asInstanceOf[GraftInputPartition]
      g.fromId == 3L && g.untilId == 8L
    })
    // a static pushed bound can only tighten, never widen
    scan.filter(Array[org.apache.spark.sql.sources.Filter](LessThan("event_id", 100L)))
    assert(scan.narrowedIdRange == (Some(3L), Some(8L)))
  }

  test("a broadcast join on partition delivers runtime partition pruning") {
    import spark.implicits._
    val d = freshDriver(); mkTopic(d, "t")
    // The dim must be a REAL source with a selective Filter node — a local
    // Seq gets constant-folded into a LocalRelation and the PartitionPruning
    // rule sees nothing selective. And the TOPIC must stay the probe side
    // (payload columns in the scan + a low threshold), because a DPP filter
    // on the broadcast build side is replaced by `dynamicpruning(true)`.
    val dimPath = Files.createTempDirectory("graft-stats-dim").toString
    Seq((0, "keep"), (1, "drop"), (2, "keep"), (3, "drop"))
      .toDF("p", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (8 * 1024).toString)
      val joined = load(d, "t")
        .join(dim, col("partition") === col("p"))
        .groupBy(col("p")).agg(sum(length(col("data"))).as("bytes"))
      val rows = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(rows == Map(0 -> 10000L, 2 -> 10000L))
      val scans = finalPlan(joined.queryExecution.executedPlan).collect {
        case b: BatchScanExec if b.scan.isInstanceOf[GraftScan] =>
          (b, b.scan.asInstanceOf[GraftScan])
      }
      assert(scans.nonEmpty)
      // Spark planted a runtime filter on the scan and delivered the
      // realized partition values before re-planning
      assert(scans.exists(_._1.runtimeFilters.nonEmpty),
        s"expected runtime filters on the graft scan:\n${joined.queryExecution.executedPlan}")
      assert(scans.exists(_._2.narrowedTargets.contains(Set(0, 2))),
        "expected the scan narrowed to partitions {0,2}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** Every node, descending through AQE wrappers and materialized query
    * stages (QueryStageExec is a LEAF — plain collect stops at it). */
  private def finalPlan(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(finalPlan)
  }
}
