package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.GraftDriver

/**
 * Time travel over the manifest-commit axis: `TopicHandle.history()` /
 * `events(version)`, the SQL `VERSION AS OF` / `TIMESTAMP AS OF` surface
 * through [[GraftCatalog]], and the format("graft") `asOfVersion` option —
 * all resolving through `Catalog.watermarkAsOf`, all retention-bounded by
 * the manifest log's own snapshot folding.
 */
class TimeTravelSpec extends SparkSpec {

  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  private def newCatalog(): (String, GraftDriver) = {
    val wh = Files.createTempDirectory("graft-tt-spec").toString
    val cat = s"ttcat_${n.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, new GraftDriver(spark, wh))
  }

  private def produceBatch(d: GraftDriver, topic: String, lo: Int, hi: Int): Unit = {
    val p = d.openTopic(topic).producer()
    (lo until hi).foreach(i => p.push(s"""{"i":$i}"""))
    p.flush()
  }

  test("history lists one version per commit; each pins its prefix") {
    val (_, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    produceBatch(d, "t", 0, 10)
    produceBatch(d, "t", 10, 30)
    produceBatch(d, "t", 30, 60)
    val t = d.openTopic("t")
    val h = t.history().orderBy("version").collect()
    assert(h.length == 3)
    assert(h.map(_.getAs[String]("kind")).toSeq == Seq("snapshot", "delta", "delta"))
    val versions = h.map(_.getAs[Long]("version"))
    assert(versions.toSeq == versions.toSeq.sorted)
    assert(h.map(_.getAs[Long]("n_events")).toSeq == Seq(10L, 30L, 60L))
    // events(version) returns exactly the prefix each commit pinned
    assert(t.events(versions(0)).count() == 10)
    assert(t.events(versions(1)).count() == 30)
    assert(t.events(versions(2)).count() == 60)
    // the pinned read is stable under later produces
    val pinned = t.events(versions(1))
    produceBatch(d, "t", 60, 80)
    assert(pinned.count() == 30)
    assert(t.events().count() == 80)
  }

  test("SQL VERSION AS OF and TIMESTAMP AS OF resolve through the catalog") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES (partitions '2')")
    produceBatch(d, "t", 0, 16)
    produceBatch(d, "t", 16, 48)
    val t = d.openTopic("t")
    val h = t.history().orderBy("version").collect()
    val Seq(v1, v2) = h.map(_.getAs[Long]("version")).toSeq
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF '$v1'").count() == 16)
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF '$v2'").count() == 48)
    // TIMESTAMP AS OF: each commit's own time resolves to that commit.
    // Commit mtimes can share a millisecond on a fast produce pair — space
    // them apart through the filesystem, the clock history itself.
    val fs = new org.apache.hadoop.fs.Path(d.warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(d.warehouse, "t"), "_manifest")
    val bySeq = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".json"))
      .sortBy(_.getPath.getName.replaceAll("^[a-z]+-|\\.json$", "").toLong)
    fs.setTimes(bySeq(0).getPath, 1000000L, -1)
    fs.setTimes(bySeq(1).getPath, 2000000L, -1)
    def tsOf(ms: Long) = new java.sql.Timestamp(ms)
    assert(spark.sql(s"SELECT * FROM $cat.t TIMESTAMP AS OF '${tsOf(1500000L)}'").count() == 16)
    assert(spark.sql(s"SELECT * FROM $cat.t TIMESTAMP AS OF '${tsOf(2000000L)}'").count() == 48)
    // before the first retained commit: loud
    val early = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.t TIMESTAMP AS OF '${tsOf(999L)}'").count())
    assert(early.getMessage.contains("no commit at or before"), early.getMessage)
  }

  test("format path asOfVersion option pins the same prefix") {
    val (_, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    produceBatch(d, "t", 0, 12)
    produceBatch(d, "t", 12, 40)
    val v1 = d.openTopic("t").history().agg(min("version")).collect()(0).getLong(0)
    val pinned = spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "t")
      .option("asOfVersion", v1.toString).load()
    assert(pinned.count() == 12)
    // and the pin composes with pushed filters
    assert(pinned.filter(col("event_id") >= 3).count() == 6) // 2 partitions × ids 3..5
  }

  test("unretained / future versions and streaming time travel fail loudly") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES (partitions '1')")
    produceBatch(d, "t", 0, 5)
    val bad = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF '999'").count())
    assert(bad.getMessage.contains("no retained version 999"), bad.getMessage)
    val junk = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'abc'").count())
    assert(junk.getMessage.contains("commit version number"), junk.getMessage)
    val stream = intercept[Exception](
      spark.readStream.format("graft")
        .option("warehouse", d.warehouse).option("topic", "t")
        .option("asOfVersion", "1").load()
        .writeStream.format("memory").queryName(s"tt_stream_${n.incrementAndGet()}")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-tt-ck").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        .awaitTermination())
    assert(stream.getMessage.contains("time-travel pin"), stream.getMessage)
  }

  test("version-diff reads: startingVersion/endingVersion pin the middle produce") {
    val (_, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    produceBatch(d, "t", 0, 10)
    produceBatch(d, "t", 10, 30)
    produceBatch(d, "t", 30, 60)
    val t = d.openTopic("t")
    val Seq(v1, v2, v3) = t.history().orderBy("version").collect()
      .map(_.getAs[Long]("version")).toSeq
    // handle API: events produced after v1, visible at v2 = the middle batch
    val mid = t.events(v1, v2)
    assert(mid.count() == 20)
    val is = mid.select(get_json_object(col("metadata"), "$.i").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(is == (10 until 30).map(_.toLong).toSet)
    // format path: same pins through options; composes with the full read
    val viaOpts = spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "t")
      .option("startingVersion", v1.toString)
      .option("endingVersion", v2.toString).load()
    assert(viaOpts.count() == 20)
    // startingVersion alone = everything produced after that commit
    val since = spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "t")
      .option("startingVersion", v2.toString).load()
    assert(since.count() == 30)
    assert(v3 > v2)
    // asOfVersion + endingVersion together: ambiguous, loud
    val both = intercept[Exception](spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "t")
      .option("asOfVersion", v1.toString)
      .option("endingVersion", v2.toString).load().count())
    assert(both.getMessage.contains("same pin"), both.getMessage)
  }

  test("a stream born at startingVersion drains only post-commit events") {
    val (_, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    produceBatch(d, "t", 0, 14)
    produceBatch(d, "t", 14, 44)
    val t = d.openTopic("t")
    val v1 = t.history().agg(min("version")).collect()(0).getLong(0)
    val qname = s"tt_sv_${n.incrementAndGet()}"
    spark.readStream.format("graft")
      .option("warehouse", d.warehouse).option("topic", "t")
      .option("startingVersion", v1.toString).load()
      .select(get_json_object(col("metadata"), "$.i").cast("long").as("i"))
      .writeStream.format("memory").queryName(qname)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-tt-sv-ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val seen = spark.table(qname).collect().map(_.getLong(0)).toSet
    assert(seen == (14 until 44).map(_.toLong).toSet)
    // consumer + startingVersion: two notions of where to begin, loud
    // (the check lives in scan build, shared by batch and stream paths)
    val e = intercept[Exception](spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "t")
      .option("consumer", "g").option("startingVersion", v1.toString)
      .load().count())
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
  }

  test("a snapshot roll folds old versions; folded versions error loudly") {
    val prev = graft.engine.Catalog.ManifestSnapshotEvery
    try {
      graft.engine.Catalog.ManifestSnapshotEvery = 3
      val (_, d) = newCatalog()
      d.createTopic("t", partitions = 1)
      (0 until 5).foreach(b => produceBatch(d, "t", b * 5, b * 5 + 5))
      val t = d.openTopic("t")
      val h = t.history().orderBy("version").collect()
      // the 4th commit rolled commits 1..4 into one snapshot (2 deltas
      // since the last snap + the incoming one hits the bound); the 5th
      // is a delta on top: exactly two retained versions
      assert(h.length == 2, h.mkString(","))
      assert(h.map(_.getAs[String]("kind")).toSeq == Seq("snapshot", "delta"))
      assert(h.map(_.getAs[Long]("n_events")).toSeq == Seq(20L, 25L))
      val folded = intercept[IllegalArgumentException](t.events(1L).count())
      assert(folded.getMessage.contains("no retained version 1"), folded.getMessage)
      // the retained ones still pin their exact prefixes
      assert(t.events(h.head.getAs[Long]("version")).count() == 20)
    } finally graft.engine.Catalog.ManifestSnapshotEvery = prev
  }

  test("restoreTo purges the tail; ids never regress; history moves forward") {
    val (_, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    produceBatch(d, "t", 0, 16)
    produceBatch(d, "t", 16, 48)
    val t = d.openTopic("t")
    val v1 = t.history().agg(min("version")).collect()(0).getLong(0)
    val maxBefore = t.history().agg(max("version")).collect()(0).getLong(0)
    t.restoreTo(v1)
    // exactly the v1 corpus survives
    val is = t.events().select(get_json_object(col("metadata"), "$.i").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(is == (0 until 16).map(_.toLong).toSet)
    // the restore itself is a new commit — versions only move forward
    assert(t.history().agg(max("version")).collect()(0).getLong(0) > maxBefore)
    // the id watermark did NOT regress: the next produce appends after a
    // gap instead of re-issuing the purged ids
    produceBatch(d, "t", 100, 104)
    val ids = t.events().select(col("partition"), col("event_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val perPart = (0 until 16).map(i => (i % 2, (i / 2).toLong)) ++
      (100 until 104).map(i => (i % 2, 24L + (i - 100) / 2))
    assert(ids == perPart.toSet, s"got $ids")
  }

  test("compaction folds version numbers but never reuses them; map pins survive") {
    val (_, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    produceBatch(d, "t", 0, 20)
    val wmPin = d.openTopic("t").snapshot() // id-map pin, rewrite-proof
    produceBatch(d, "t", 20, 50)
    val t = d.openTopic("t")
    val before = t.history().orderBy("version").collect()
    val v1 = before.head.getAs[Long]("version")
    d.catalog.compactTopic("t")
    val after = t.history().orderBy("version").collect()
    // the rebuilt snapshot's version advances PAST every pre-compaction
    // seq — a stale version number folds away loudly instead of silently
    // aliasing the rebuilt full-corpus snapshot
    assert(after.map(_.getAs[Long]("version")).min >
      before.map(_.getAs[Long]("version")).max)
    val folded = intercept[IllegalArgumentException](t.events(v1).count())
    assert(folded.getMessage.contains(s"no retained version $v1"), folded.getMessage)
    // watermark-map pins are id-based and survive the rewrite: the exact
    // first-produce corpus, from the compacted files
    assert(t.events(wmPin).count() == 20)
    val is = t.events(wmPin).select(get_json_object(col("metadata"), "$.i").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(is == (0 until 20).map(_.toLong).toSet)
  }
}
