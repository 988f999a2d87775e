package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec
import graft.engine.GraftDriver

/**
 * Limit / top-N pushdown: dense per-partition ids turn LIMIT into an id
 * WINDOW — at most `limit` ids per partition plan, and file pruning drops
 * everything else. Always partial: Spark re-applies the exact limit (and
 * the sort, for top-N) on the surfaced rows.
 */
class LimitPushdownSpec extends SparkSpec {

  private def mkTopic(): GraftDriver = {
    import spark.implicits._
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-limit").toString)
    d.createTopic("t", partitions = 4)
    d.openTopic("t").producer(chunkMaxRecords = 8).produce(
      (0 until 200).map(i => (s"""{"k":$i}""", i % 4)).toDF("metadata", "partition"))
    d
  }

  private def load(d: GraftDriver) =
    spark.read.format("graft").option("warehouse", d.warehouse).option("topic", "t").load()

  test("pushed limit caps every planned id window") {
    val d = mkTopic()
    val b = new GraftTopicTable(d.warehouse, "t", None, None, None)
      .newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[GraftScanBuilder]
    assert(b.pushLimit(5))
    val planned = b.build().toBatch.planInputPartitions()
    assert(planned.length == 4)
    planned.foreach { ip =>
      val g = ip.asInstanceOf[GraftInputPartition]
      assert(g.untilId - g.fromId == 5, s"window not capped: $g")
      // 50 ids per partition rolled at 8 records/file → a 5-id window
      // needs exactly ONE chunk file
      assert(g.files.length == 1, s"expected one pruned file, got ${g.files.length}")
    }
  }

  test("LIMIT n end-to-end: exact row count, capped scan") {
    val d = mkTopic()
    val df = load(d).limit(3)
    assert(df.collect().length == 3)
    assert(df.queryExecution.executedPlan.toString.contains("cap=3"),
      s"expected the limit pushed into the scan:\n${df.queryExecution.executedPlan}")
  }

  test("ORDER BY event_id LIMIT n pushes as top-N; other sorts do not") {
    val d = mkTopic()
    val top = load(d).orderBy(col("event_id")).limit(6)
      .select(col("event_id")).collect().map(_.getLong(0)).toSeq
    // four partitions share each id: the global top-6 by id is 0,0,0,0,1,1
    assert(top == Seq(0L, 0L, 0L, 0L, 1L, 1L))
    val plan = load(d).orderBy(col("event_id")).limit(6).queryExecution.executedPlan
    assert(plan.toString.contains("cap=6"),
      s"expected ORDER BY event_id LIMIT to push:\n$plan")
    // a non-id sort must NOT cap the scan (the whole log feeds the sort)
    val other = load(d).orderBy(col("metadata").desc).limit(6)
    assert(other.collect().length == 6)
    assert(!other.queryExecution.executedPlan.toString.contains("cap="),
      "a non-id top-N must not cap the scan")
  }

  test("limit larger than the topic surfaces everything") {
    val d = mkTopic()
    assert(load(d).limit(100000).count() == 200L)
  }

  test("gap-marked topics refuse the cap: LIMIT never under-delivers") {
    import spark.implicits._
    val d = mkTopic()
    // drop the first 30 ids of every partition — the first `n` ids of a
    // partition now hold ZERO surviving rows, so a capped id window would
    // surface nothing for a LIMIT the log can satisfy
    d.openTopic("t").deleteWhere(col("event_id") < 30)
    val df = load(d).limit(10)
    assert(df.collect().length == 10, "LIMIT under-delivered on a gapped log")
    assert(!df.queryExecution.executedPlan.toString.contains("cap="),
      s"gap-marked topic must not cap the scan:\n${df.queryExecution.executedPlan}")
    // top-N likewise falls back to a real scan and stays exact
    val top = load(d).orderBy(col("event_id")).limit(4)
      .select(col("event_id")).collect().map(_.getLong(0)).toSeq
    assert(top == Seq(30L, 30L, 30L, 30L))
  }

  test("a purge landing between pushdown and planning drops the cap at plan time") {
    val d = mkTopic()
    val b = new GraftTopicTable(d.warehouse, "t", None, None, None)
      .newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[GraftScanBuilder]
    assert(b.pushLimit(5)) // accepted: ids dense at pushdown time
    d.openTopic("t").deleteWhere(col("event_id") < 30) // race: gaps appear
    val planned = b.build().toBatch.planInputPartitions()
    planned.foreach { ip =>
      val g = ip.asInstanceOf[GraftInputPartition]
      assert(g.untilId - g.fromId > 5, s"stale cap survived the purge: $g")
    }
  }
}
