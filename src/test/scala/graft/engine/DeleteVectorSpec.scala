package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/**
 * Merge-on-read compliance delete (deletion vectors): `deleteWhereVectored`
 * records matching (partition, event_id) pairs beside the log instead of
 * rewriting it — O(matched) written, zero chunk files touched, applied by
 * every read surface, folded physically by the next log rewrite. The
 * scale contract: at 100 TB a compliance delete touching a sliver of the
 * log must not rewrite the log.
 */
class DeleteVectorSpec extends SparkSpec {

  private def mkTopic(n: Int = 200, parts: Int = 4,
                      serializer: Option[Serializer] = None): (GraftDriver, TopicHandle) = {
    import spark.implicits._
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-delvec").toString)
    serializer match {
      case Some(ser) => d.createTopic("t", partitions = parts, serializer = ser)
      case None => d.createTopic("t", partitions = parts)
    }
    val topic = d.openTopic("t")
    topic.producer(chunkMaxRecords = 16).produce(
      (0 until n).map(i => (s"""{"k":$i}""", i % parts)).toDF("metadata", "partition"))
    (d, topic)
  }

  private def load(d: GraftDriver) =
    spark.read.format("graft").option("warehouse", d.warehouse).option("topic", "t").load()

  private def k(c: org.apache.spark.sql.Column = col("metadata")) =
    get_json_object(c, "$.k").cast("long")

  private def chunkFiles(d: GraftDriver): Set[String] = {
    val log = new java.io.File(
      new org.apache.hadoop.fs.Path(d.catalog.logPath("t")).toUri.getPath)
    if (!log.exists()) Set.empty
    else log.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
  }

  test("vectored delete: rows gone from batch reads, chunk files untouched") {
    val (d, topic) = mkTopic()
    val before = chunkFiles(d)
    assert(before.nonEmpty)
    val n = topic.deleteWhereVectored(k() % 5 === 0)
    assert(n == 40, s"expected 40 vectored ids, got $n")
    assert(chunkFiles(d) == before, "a vectored delete must not touch chunk files")
    val got = load(d).select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(got == (0 until 200).filter(_ % 5 != 0).map(_.toLong).toSet)
    // the O(1) aggregate shortcut is disabled — COUNT comes from a real scan
    assert(load(d).count() == 160)
    assert(d.catalog.mayHaveIdGaps("t"))
  }

  test("deletes accumulate; re-matching ids never re-record") {
    val (d, topic) = mkTopic()
    assert(topic.deleteWhereVectored(k() % 5 === 0) == 40)
    // %10==0 ⊂ %5==0: all already vectored → zero NEW deletions
    assert(topic.deleteWhereVectored(k() % 10 === 0) == 0)
    assert(topic.deleteWhereVectored(k() % 7 === 3) > 0)
    val got = load(d).select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(got == (0 until 200).filter(i => i % 5 != 0 && i % 7 != 3).map(_.toLong).toSet)
  }

  test("consumer pull and streaming drain both drop vectored rows") {
    val (d, topic) = mkTopic()
    topic.deleteWhereVectored(k() % 4 === 1): Unit // partition 1 emptied entirely
    // consumer surface
    val pulled = topic.events().select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(pulled == (0 until 200).filter(_ % 4 != 1).map(_.toLong).toSet)
    // streaming surface, mid-file trigger windows
    val q = spark.readStream.format("graft")
      .option("warehouse", d.warehouse).option("topic", "t")
      .option("maxEventsPerTrigger", 7)
      .load()
      .writeStream.format("memory").queryName("delvec_stream")
      .option("checkpointLocation", Files.createTempDirectory("delvec-ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("delvec_stream")
      .select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(streamed == pulled, "stream and consumer must agree on survivors")
  }

  test("version-pinned reads also drop vectored rows (compliance is retroactive)") {
    val (d, topic) = mkTopic()
    val v = topic.history().select(max(col("version"))).head().getLong(0)
    topic.deleteWhereVectored(k() < 50): Unit
    val pinned = topic.events(v).select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(pinned == (50 until 200).map(_.toLong).toSet,
      "a version pinned BEFORE the delete must not resurrect purged rows")
  }

  test("log rewrite folds the vectors: physical purge, _deletes cleared") {
    val (d, topic) = mkTopic()
    topic.deleteWhereVectored(k() % 3 === 0): Unit
    assert(d.catalog.deleteVectorFiles("t").nonEmpty)
    topic.compact(chunkMaxRecords = 64)
    assert(d.catalog.deleteVectorFiles("t").isEmpty, "compact must fold the vectors")
    val got = load(d).select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(got == (0 until 200).filter(_ % 3 != 0).map(_.toLong).toSet)
    // physically gone: the raw log itself no longer holds the ids
    val raw = spark.read.schema(Catalog.EventSchema)
      .parquet(d.catalog.logPath("t"))
      .select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(got == raw)
  }

  test("vectored delete works on tiered topics (rewrite delete refuses)") {
    val (d, topic) = mkTopic()
    assert(topic.archiveBefore(25).filesMoved > 0)
    intercept[IllegalStateException] { topic.deleteWhere(k() % 2 === 0) }
    val n = topic.deleteWhereVectored(k() % 2 === 0)
    assert(n == 100)
    val got = load(d).select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(got == (0 until 200).filter(_ % 2 != 0).map(_.toLong).toSet,
      "vectors must apply to cold-tier reads too")
  }

  test("NULL predicates delete nothing (three-valued logic guard)") {
    val (_, topic) = mkTopic(n = 40)
    // $.missing is NULL on every row → cond is NULL, never TRUE
    assert(topic.deleteWhereVectored(
      get_json_object(col("metadata"), "$.missing").cast("long") > 0) == 0L)
    assert(topic.events().count() == 40)
  }

  test("non-default serializer topics filter on the row path too") {
    val (d, topic) = mkTopic(n = 60, serializer = Some(Serializer.Base64))
    assert(topic.deleteWhereVectored(k(Serializer.Base64.decodedMetadataCol) < 20) == 20)
    val got = load(d).select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(got == (20 until 60).map(_.toLong).toSet)
  }

  test("indexed reads drop vectored rows too (zone map + bloom)") {
    val (_, topic) = mkTopic()
    topic.refreshIndex("by_k", "$.k", MetadataIndex.Numeric): Unit
    topic.refreshBloomIndex("bl_k", "$.k"): Unit
    topic.deleteWhereVectored(k() >= 10 && k() < 20): Unit
    // zone-map range read over exactly the vectored span: nothing surfaces
    assert(topic.eventsIndexed("by_k", 10.0, 19.0).count() == 0,
      "zone-indexed read resurrected vectored rows")
    assert(topic.eventsIndexed("by_k", 0.0, 29.0)
      .select(k().as("k")).collect().map(_.getLong(0)).toSet ==
      ((0 until 10) ++ (20 until 30)).map(_.toLong).toSet)
    // bloom point lookup on a vectored value: nothing surfaces
    assert(topic.eventsBloomEq("bl_k", "15").count() == 0,
      "bloom-indexed read resurrected vectored rows")
    assert(topic.eventsBloomEq("bl_k", "25").count() == 1)
  }

  test("tiered topics fold by merging vector files (commit-time auto-fold bounds the count)") {
    val (d, topic) = mkTopic()
    assert(topic.archiveBefore(25).filesMoved > 0) // tiered: rewrites refuse
    (0 until 6).foreach(i => topic.deleteWhereVectored(k() === i): Unit)
    // the 5th delete crossed the >4 bound and auto-folded to 1; the 6th
    // added one more — a delete-heavy topic that never maintains still
    // keeps the per-slice vector-load count bounded
    assert(d.catalog.deleteVectorFiles("t").size == 2,
      "commit-time auto-fold must bound the root count without maintenance")
    d.catalog.compactDeleteVectors("t"): Unit
    assert(d.catalog.deleteVectorFiles("t").size == 1,
      "an explicit fold must merge a tiered topic's vectors into one relation")
    val got = load(d).select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(got == (6 until 200).map(_.toLong).toSet,
      "the merged vector must preserve every deleted id")
  }

  test("SQL DELETE routes to vectors under spark.graft.delete.mode=vector") {
    val (d, _) = mkTopic()
    spark.conf.set("spark.sql.catalog.dvcat", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvcat.warehouse", d.warehouse)
    spark.conf.set("spark.graft.delete.mode", "vector")
    try {
      val before = chunkFiles(d)
      spark.sql("DELETE FROM dvcat.t WHERE event_id < 10")
      assert(chunkFiles(d) == before, "vector-mode SQL DELETE must not rewrite")
      assert(d.catalog.deleteVectorFiles("t").nonEmpty)
      assert(spark.sql("SELECT count(*) FROM dvcat.t").head().getLong(0) == 160)
    } finally {
      spark.conf.unset("spark.graft.delete.mode")
      spark.conf.unset("spark.sql.catalog.dvcat")
      spark.conf.unset("spark.sql.catalog.dvcat.warehouse")
    }
  }

  test("a fold keeps superseded inputs readable for in-flight plans; vacuum reaps them") {
    val (d, topic) = mkTopic()
    topic.deleteWhereVectored(k() < 3): Unit
    topic.deleteWhereVectored(k() >= 10 && k() < 13): Unit
    val roots = d.catalog.deleteVectorFiles("t")
    assert(roots.size == 2)
    val pinned = roots.head // an in-flight change-feed plan holds this path
    assert(d.catalog.compactDeleteVectors("t") == 2)
    // delisted, but physically intact: the racing reader's slice still
    // finds every row it planned against
    assert(!d.catalog.deleteVectorFiles("t").contains(pinned))
    assert(spark.read.schema(Catalog.DeleteSchema).parquet(pinned).count() == 3,
      "superseded input must stay readable until vacuum")
    // age the markers past the staleness horizon: vacuum reaps the bodies
    val fs = new org.apache.hadoop.fs.Path(pinned)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    roots.foreach { r =>
      fs.setTimes(new org.apache.hadoop.fs.Path(r, "_folded"),
        System.currentTimeMillis() - 24L * 3600 * 1000, -1)
    }
    topic.vacuum(): Unit
    assert(!fs.exists(new org.apache.hadoop.fs.Path(pinned)),
      "aged folded roots must be physically reaped")
    assert(d.catalog.deleteVectorFiles("t").size == 1, "the fold root survives")
    val got = load(d).select(k().as("k")).collect().map(_.getLong(0)).toSet
    assert(got == (0 until 200).map(_.toLong)
      .filterNot(i => i < 3 || (i >= 10 && i < 13)).toSet)
  }

  test("maintain reads the vector inventory once (fold pays one more under lock)") {
    val (d, topic) = mkTopic()
    // clean topic: the compact/merge trigger check is the ONLY listing
    val c0 = Catalog.deletesListings.get()
    d.catalog.maintainTopic("t", maxFilesPerPartition = 1000): Unit
    assert(Catalog.deletesListings.get() - c0 == 1,
      "a clean maintain must list _deletes exactly once")
    // fold path: trigger check + the rewrite's own apply-vectors read
    (0 until 6).foreach(i => topic.deleteWhereVectored(k() === i): Unit)
    val c1 = Catalog.deletesListings.get()
    d.catalog.maintainTopic("t", maxFilesPerPartition = 1000): Unit
    val foldRuns = Catalog.deletesListings.get() - c1
    assert(foldRuns <= 2, s"a folding maintain must list _deletes at most twice, did $foldRuns")
  }

  test("compaction folds vectors physically; auto-fold bounds them between runs") {
    val (d, topic) = mkTopic()
    (0 until 6).foreach(i => topic.deleteWhereVectored(k() === i): Unit)
    // commit-time auto-fold kept the count bounded (5th delete folded)
    assert(d.catalog.deleteVectorFiles("t").size == 2)
    d.catalog.compactTopic("t")
    assert(d.catalog.deleteVectorFiles("t").isEmpty,
      "a log rewrite must purge vectored rows and clear _deletes")
    assert(load(d).count() == 194)
  }

  test("scan statistics stay EXACT on vector-deleted topics (full window)") {
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val (d, topic) = mkTopic()
    topic.deleteWhereVectored(k() % 4 === 0): Unit // 50 of 200
    val scan = new graft.streaming.GraftTopicTable(d.warehouse, "t", None, None, None)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of()))
      .build().asInstanceOf[SupportsReportStatistics]
    assert(scan.estimateStatistics().numRows().getAsLong == 150L,
      "full-window numRows must subtract the vectored counts exactly")
    // a bounded window skips the subtraction (conservative over-report)
    val bounded = new graft.streaming.GraftTopicTable(d.warehouse, "t", None, None, None)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of())).asInstanceOf[graft.streaming.GraftScanBuilder]
    bounded.pushFilters(Array(
      org.apache.spark.sql.sources.LessThan("event_id", 10L))): Unit
    val boundedRows = bounded.build().asInstanceOf[SupportsReportStatistics]
      .estimateStatistics().numRows().getAsLong
    assert(boundedRows == 40L, s"bounded window over-reports, never under: $boundedRows")
  }

  test("vectors apply on the zero-threshold (parquet-relation) planning path") {
    val prev = spark.conf.getOption("spark.graft.manifest.driverMaxEntries")
    spark.conf.set("spark.graft.manifest.driverMaxEntries", "0")
    try {
      val (d, topic) = mkTopic()
      topic.deleteWhereVectored(k() % 5 === 0): Unit
      assert(load(d).count() == 160)
      assert(topic.events().count() == 160)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.manifest.driverMaxEntries", v)
      case None => spark.conf.unset("spark.graft.manifest.driverMaxEntries")
    }
  }

  test("vacuum keeps committed vectors, clears only stale staged tmps") {
    val (d, topic) = mkTopic()
    topic.deleteWhereVectored(k() % 5 === 0): Unit
    val committed = d.catalog.deleteVectorFiles("t")
    topic.vacuum(): Unit
    assert(d.catalog.deleteVectorFiles("t") == committed)
    assert(load(d).count() == 160)
  }
}
