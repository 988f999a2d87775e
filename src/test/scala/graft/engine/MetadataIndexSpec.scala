package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Zone-map metadata index: pruning must SKIP files provably, FRESHNESS
 * must stay conservative (unindexed files always scanned), and the indexed
 * read must return exactly the rows the full-scan filter would under every
 * lifecycle event (new produces, compaction, all-NULL files).
 */
class MetadataIndexSpec extends SparkSpec {

  private def newTopic(partitions: Int = 2): (GraftDriver, TopicHandle) = {
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-idx-spec").toString)
    d.createTopic("idx", partitions = partitions)
    (d, d.openTopic("idx"))
  }

  /** Produce rows with metadata {"v": i} for i in [lo, hi). */
  private def produceRange(topic: TopicHandle, lo: Int, hi: Int): Unit = {
    import spark.implicits._
    topic.producer().produce(
      (lo until hi).map(i => s"""{"v":$i}""").toDF("metadata"))
  }

  private def vOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(get_json_object(col("metadata"), "$.v").cast("long"))
      .collect().map(_.getLong(0)).toSet

  test("indexed read prunes non-intersecting files and matches the full-scan filter") {
    val (_, topic) = newTopic(partitions = 2)
    // four produces with disjoint value ranges → per partition, four chunk
    // files with disjoint zone maps
    Seq((0, 100), (100, 200), (200, 300), (300, 400))
      .foreach { case (lo, hi) => produceRange(topic, lo, hi) }
    assert(topic.refreshIndex("v_idx", "$.v") == 8) // 4 produces × 2 partitions
    // [120, 180] intersects exactly one produce's files
    val s = topic.indexScan("v_idx", 120, 180)
    assert(s.total == 8 && s.kept == 2, s"expected 2 of 8 files kept: $s")
    val got = vOf(topic.eventsIndexed("v_idx", 120, 180))
    val want = vOf(topic.events().filter(
      get_json_object(col("metadata"), "$.v").cast("long").between(120, 180)))
    assert(got == want && got == (120L to 180L).toSet)
    // an empty window keeps nothing and returns nothing
    assert(topic.indexScan("v_idx", 5000, 6000).kept == 0)
    assert(topic.eventsIndexed("v_idx", 5000, 6000).count() == 0L)
  }

  test("distributed plan path (large-topic mode) prunes identically to the driver path") {
    val (_, topic) = newTopic(partitions = 2)
    Seq((0, 100), (100, 200), (200, 300), (300, 400))
      .foreach { case (lo, hi) => produceRange(topic, lo, hi) }
    produceRange(topic, 400, 500) // indexed by the refresh (10 = 5 produces × 2 parts)
    assert(topic.refreshIndex("v_idx", "$.v") == 10)
    produceRange(topic, 500, 600) // post-refresh: conservative keep on both paths
    val driver = topic.indexScan("v_idx", 120, 180)
    val driverRows = vOf(topic.eventsIndexed("v_idx", 120, 180))
    // force the pruning decision through the live⟕index join — the index
    // relation must never be collected on this path, only kept paths are
    spark.conf.set("spark.graft.index.driverPlanMaxEntries", "0")
    try {
      val dist = topic.indexScan("v_idx", 120, 180)
      assert(dist == driver, s"distributed plan diverged: $dist vs $driver")
      assert(vOf(topic.eventsIndexed("v_idx", 120, 180)) == driverRows)
      assert(topic.indexScan("v_idx", 5000, 6000).kept == 2) // only unindexed kept
    } finally spark.conf.unset("spark.graft.index.driverPlanMaxEntries")
  }

  test("freshness is conservative: files produced after a refresh are still scanned") {
    val (_, topic) = newTopic(partitions = 2)
    produceRange(topic, 0, 100)
    assert(topic.refreshIndex("v_idx", "$.v") == 2)
    // new data lands, index is stale — the indexed read must still see it
    produceRange(topic, 100, 200)
    val s = topic.indexScan("v_idx", 150, 160)
    assert(s.total == 4 && s.kept == 2, // the 2 unindexed files, old 2 pruned
      s"stale index must keep exactly the unindexed files: $s")
    assert(vOf(topic.eventsIndexed("v_idx", 150, 160)) == (150L to 160L).toSet)
    // the second refresh indexes ONLY the new files (incremental)
    assert(topic.refreshIndex("v_idx", "$.v") == 2)
    assert(topic.indexScan("v_idx", 150, 160).kept == 2)
  }

  test("compaction invalidates entries gracefully; refresh re-indexes the new files") {
    val (_, topic) = newTopic(partitions = 2)
    Seq((0, 100), (100, 200)).foreach { case (lo, hi) => produceRange(topic, lo, hi) }
    assert(topic.refreshIndex("v_idx", "$.v") == 4)
    topic.compact()
    // every indexed path is dead → all live files are unindexed → full
    // conservative scan, result still exact
    val s = topic.indexScan("v_idx", 0, 50)
    assert(s.kept == s.total, s"dead index must scan everything: $s")
    assert(vOf(topic.eventsIndexed("v_idx", 0, 50)) == (0L to 50L).toSet)
    val n = topic.refreshIndex("v_idx", "$.v")
    assert(n == s.total, s"refresh must re-index all ${s.total} compacted files, got $n")
    // each compacted file now spans the full value range, so the window
    // intersects every zone — no pruning is possible, but the scan is
    // indexed (not conservative) and the rows stay exact
    assert(topic.indexScan("v_idx", 0, 50).kept == s.total)
    assert(vOf(topic.eventsIndexed("v_idx", 0, 50)) == (0L to 50L).toSet)
  }

  test("all-NULL files are skipped; mixed files use non-null bounds") {
    import spark.implicits._
    val (_, topic) = newTopic(partitions = 1)
    topic.producer().produce(
      (0 until 50).map(i => s"""{"v":$i}""").toDF("metadata"))
    topic.producer().produce( // no "v" at all → all-NULL zone
      (0 until 50).map(i => s"""{"w":$i}""").toDF("metadata"))
    assert(topic.refreshIndex("v_idx", "$.v") == 2)
    val s = topic.indexScan("v_idx", 0, 100)
    assert(s.total == 2 && s.kept == 1, s"the all-NULL file must be skipped: $s")
    assert(topic.eventsIndexed("v_idx", 0, 100).count() == 50L)
  }

  test("string-kinded index prunes equality reads by lexicographic zones") {
    import spark.implicits._
    val (_, topic) = newTopic(partitions = 1)
    // one produce per language → per-file zones are single values
    Seq("de", "en", "fr").foreach { lang =>
      topic.producer().produce(
        (0 until 20).map(i => s"""{"lang":"$lang","i":$i}""").toDF("metadata"))
    }
    assert(topic.refreshIndex("lang_idx", "$.lang", MetadataIndex.Str) == 3)
    val s = topic.indexScanEq("lang_idx", "en")
    assert(s.total == 3 && s.kept == 1, s"expected 1 of 3 files: $s")
    assert(topic.eventsIndexedEq("lang_idx", "en").count() == 20L)
    assert(topic.indexScanEq("lang_idx", "zz").kept == 0)
    assert(topic.eventsIndexedEq("lang_idx", "zz").count() == 0L)
    // kind mismatch between write and read fails loudly
    val e = intercept[IllegalArgumentException] { topic.indexScan("lang_idx", 0, 1) }
    assert(e.getMessage.contains("string-kinded"))
    val e2 = intercept[IllegalArgumentException] {
      topic.refreshIndex("lang_idx", "$.lang", MetadataIndex.Numeric)
    }
    assert(e2.getMessage.contains("use a different index name"))
  }

  test("maintain(): compacts past the file threshold, vacuums, refreshes indexes") {
    val (d, topic) = newTopic(partitions = 1)
    // 5 produces → 5 chunk files in the single partition
    (0 until 5).foreach(i => produceRange(topic, i * 10, i * 10 + 10))
    topic.refreshIndex("v_idx", "$.v")
    // plant vacuum debris: a crashed compactor's swap dir
    val hfs = d.catalog.topicPath("idx")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.mkdirs(new org.apache.hadoop.fs.Path(d.catalog.topicPath("idx"), "log.compact.tmp"))
    // threshold 4 < 5 files → compacts; the index is re-derived in the
    // same call, so pruning works immediately against the new layout
    val (compacted, vac, indexed) = topic.maintain(maxFilesPerPartition = 4)
    assert(compacted, "5 files > threshold 4 must trigger compaction")
    assert(vac.swapLeftovers == 0, "the swap dir is consumed by compaction itself")
    assert(indexed == 1, s"the compacted file must be re-indexed: $indexed")
    assert(topic.indexScan("v_idx", 0, 100).kept == 1)
    assert(vOf(topic.eventsIndexed("v_idx", 12, 17)) == (12L to 17L).toSet)
    // a clean topic: maintain is a no-op on every axis
    val (c2, v2, i2) = topic.maintain(maxFilesPerPartition = 4)
    assert(!c2 && v2 == VacuumReport(0, 0, 0, 0L) && i2 == 0)
  }

  test("randomized: indexed reads equal the full-scan filter across lifecycles") {
    import spark.implicits._
    // the index's one contract — pruning may skip I/O, never rows — swept
    // under random interleavings of produces (overlapping value ranges,
    // field-less produces), refreshes at arbitrary points, and compaction
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 3) {
      val (_, topic) = newTopic(partitions = 1 + rnd.nextInt(3))
      val produces = 2 + rnd.nextInt(4)
      for (_ <- 0 until produces) {
        val lo = rnd.nextInt(500); val n = 20 + rnd.nextInt(60)
        if (rnd.nextInt(4) == 0) // field-less produce: all-NULL zones
          topic.producer().produce(
            (0 until n).map(j => s"""{"w":$j}""").toDF("metadata"))
        else produceRange(topic, lo, lo + n)
        if (rnd.nextBoolean()) topic.refreshIndex("v_idx", "$.v"): Unit
      }
      topic.refreshIndex("v_idx", "$.v")
      if (rnd.nextBoolean()) topic.compact()
      if (rnd.nextBoolean()) produceRange(topic, rnd.nextInt(500), rnd.nextInt(500) + 520)
      val a = rnd.nextInt(600); val b = rnd.nextInt(600)
      val (wLo, wHi) = (math.min(a, b), math.max(a, b))
      val got = vOf(topic.eventsIndexed("v_idx", wLo, wHi))
      val want = vOf(topic.events().filter(
        get_json_object(col("metadata"), "$.v").cast("long").between(wLo, wHi)))
      assert(got == want, s"trial=$trial window=[$wLo,$wHi]")
      val s = topic.indexScan("v_idx", wLo, wHi)
      assert(s.kept <= s.total, s"trial=$trial scan=$s")
    }
  }

  test("index misuse fails loudly") {
    val (_, topic) = newTopic(partitions = 1)
    produceRange(topic, 0, 10)
    topic.refreshIndex("v_idx", "$.v")
    // one index = one field
    val e = intercept[IllegalArgumentException] { topic.refreshIndex("v_idx", "$.w") }
    assert(e.getMessage.contains("is over $.v"))
    // reading an index that does not exist
    val e2 = intercept[IllegalStateException] { topic.indexScan("nope", 0, 1) }
    assert(e2.getMessage.contains("does not exist"))
    // index names are path components
    intercept[IllegalArgumentException] { topic.refreshIndex("a/b", "$.v") }
  }

  test("a crashed index install heals; maintain never silently drops the index") {
    val (d, topic) = newTopic(partitions = 2)
    produceRange(topic, 0, 100)
    assert(topic.refreshIndex("v_idx", "$.v") == 2)
    val fs = new org.apache.hadoop.fs.Path(d.warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(d.warehouse, "idx"), "_index/v_idx")
    assert(fs.exists(dir), s"index layout moved? $dir")
    // simulate a crash between the install's two renames: live dir moved
    // aside, new copy not yet in place
    val old = new org.apache.hadoop.fs.Path(dir.getParent, dir.getName + ".old")
    assert(fs.rename(dir, old))
    // refreshExisting HEALS instead of reporting "no index" (which would
    // make maintain() silently stop refreshing it forever)
    produceRange(topic, 100, 200)
    assert(MetadataIndex.refreshExisting(spark, d.catalog, "idx", "v_idx") == 2)
    assert(fs.exists(dir) && !fs.exists(old))
    // the healed index still answers exactly
    val got = vOf(topic.eventsIndexed("v_idx", 120, 180))
    val want = vOf(topic.events().filter(
      get_json_object(col("metadata"), "$.v").cast("long").between(120, 180)))
    assert(got == want && got.nonEmpty)
  }
}