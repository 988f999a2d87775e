package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Per-file bloom index: point-lookup pruning must skip files provably and
 * NEVER lose a row (no false negatives by construction), freshness must
 * stay conservative, the planner's JVM hash must match the Spark build
 * expression bit-for-bit, and maintain() must refresh the filters after
 * compaction replaces every file.
 */
class BloomIndexSpec extends SparkSpec {

  private def newTopic(partitions: Int = 2): (GraftDriver, TopicHandle) = {
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-bloom-spec").toString)
    d.createTopic("bl", partitions = partitions)
    (d, d.openTopic("bl"))
  }

  /** Produce rows {"u": <key>} for the given keys, one produce call. */
  private def produceKeys(topic: TopicHandle, keys: Seq[String]): Unit = {
    import spark.implicits._
    topic.producer().produce(keys.map(k => s"""{"u":"$k"}""").toDF("metadata"))
  }

  private def uOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(get_json_object(col("metadata"), "$.u"))
      .collect().map(_.getString(0)).toSeq.sorted

  test("JVM planner positions equal the Spark build positions on random keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val keys = (0 until 100).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
    val numBits = 63 * 8
    val sparkPos = keys.toDF("k")
      .select(col("k"), array((0 until 3).map(j =>
        graft.operators.Bloom.position(col("k"), j, numBits)): _*).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).map(_.toInt)).toMap
    keys.foreach { k =>
      assert(BloomIndex.jvmPositions(k, numBits, 3) == sparkPos(k),
        s"planner/build hash divergence for key '$k'")
    }
  }

  test("lookup prunes to the files that can hold the key; rows match the full scan") {
    val (_, topic) = newTopic(partitions = 2)
    // three produces with DISJOINT key populations; every key unique so a
    // zone over them would be wide, but membership is file-local
    produceKeys(topic, (0 until 50).map(i => s"alpha-$i"))
    produceKeys(topic, (0 until 50).map(i => s"beta-$i"))
    produceKeys(topic, (0 until 50).map(i => s"gamma-$i"))
    assert(topic.refreshBloomIndex("u_bloom", "$.u") == 6) // 3 produces × 2 parts
    val s = topic.bloomScanEq("u_bloom", "beta-7")
    assert(s.total == 6 && s.kept <= 2 + 1 && s.kept >= 1,
      s"expected ~2 of 6 files kept (small FP allowance): $s")
    assert(s.kept < s.total, "lookup must prune")
    assert(uOf(topic.eventsBloomEq("u_bloom", "beta-7")) == Seq("beta-7"))
    // an absent key returns nothing (false positives may open files, the
    // residual equality drops every row)
    assert(topic.eventsBloomEq("u_bloom", "delta-99").count() == 0L)
  }

  test("distributed plan path (large-topic mode) prunes identically to the driver path") {
    val (_, topic) = newTopic(partitions = 2)
    produceKeys(topic, (0 until 50).map(i => s"alpha-$i"))
    produceKeys(topic, (0 until 50).map(i => s"beta-$i"))
    assert(topic.refreshBloomIndex("u_bloom", "$.u") == 4)
    produceKeys(topic, (0 until 50).map(i => s"late-$i")) // unindexed: kept on both paths
    val driver = topic.bloomScanEq("u_bloom", "beta-7")
    val driverRows = uOf(topic.eventsBloomEq("u_bloom", "beta-7"))
    // force the pruning decision through the live⟕index join — word arrays
    // are probed with element_at in the relation, never on the driver
    spark.conf.set("spark.graft.index.driverPlanMaxEntries", "0")
    try {
      val dist = topic.bloomScanEq("u_bloom", "beta-7")
      assert(dist == driver, s"distributed plan diverged: $dist vs $driver")
      assert(uOf(topic.eventsBloomEq("u_bloom", "beta-7")) == driverRows)
    } finally spark.conf.unset("spark.graft.index.driverPlanMaxEntries")
  }

  test("freshness conservative + incremental refresh; no row ever lost") {
    val (_, topic) = newTopic(partitions = 2)
    produceKeys(topic, (0 until 40).map(i => s"old-$i"))
    assert(topic.refreshBloomIndex("u_bloom", "$.u") == 2)
    produceKeys(topic, (0 until 40).map(i => s"new-$i"))
    // stale index: the unindexed files are scanned, so the new key is found
    assert(uOf(topic.eventsBloomEq("u_bloom", "new-3")) == Seq("new-3"))
    // incremental: only the new files are indexed
    assert(topic.refreshBloomIndex("u_bloom", "$.u") == 2)
    assert(uOf(topic.eventsBloomEq("u_bloom", "new-3")) == Seq("new-3"))
    assert(uOf(topic.eventsBloomEq("u_bloom", "old-3")) == Seq("old-3"))
    // parameters are pinned: restating different ones is refused
    val e = intercept[IllegalArgumentException](
      topic.refreshBloomIndex("u_bloom", "$.u", numBits = 63 * 4))
    assert(e.getMessage.contains("parameters cannot change"))
  }

  test("maintain() refreshes bloom indexes after compaction replaces the files") {
    val (d, topic) = newTopic(partitions = 1)
    (0 until 3).foreach(b => produceKeys(topic, (0 until 30).map(i => s"k$b-$i")))
    assert(topic.refreshBloomIndex("u_bloom", "$.u") == 3)
    // compaction rewrites 3 chunks into 1 — every indexed path is dead
    val (compacted, _, reindexed) = topic.maintain(maxFilesPerPartition = 2)
    assert(compacted && reindexed == 1,
      s"maintain must re-index the compacted file: compacted=$compacted reindexed=$reindexed")
    val s = topic.bloomScanEq("u_bloom", "k1-5")
    assert(s.total == 1 && s.kept == 1)
    assert(uOf(topic.eventsBloomEq("u_bloom", "k1-5")) == Seq("k1-5"))
    assert(topic.eventsBloomEq("u_bloom", "zz-absent").count() == 0L)
  }
}
