package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Parquet-backed manifests (topics past `spark.graft.manifest.driverMaxEntries`):
 * the snapshot's file list lives in a parquet relation, the JSON carries
 * watermarks + a reference, and every planner prunes the relation INSTEAD of
 * materializing the file list driver-side. The conf is pinned to 0 here so a
 * small fixture exercises the exact paths a million-file topic would take.
 */
class ManifestScaleSpec extends SparkSpec {

  private def withLowThreshold[A](body: => A): A = {
    spark.conf.set("spark.graft.manifest.driverMaxEntries", "0")
    spark.conf.set("spark.graft.index.driverPlanMaxEntries", "0")
    try body
    finally {
      spark.conf.unset("spark.graft.manifest.driverMaxEntries")
      spark.conf.unset("spark.graft.index.driverPlanMaxEntries")
    }
  }

  private def newTopic(): (GraftDriver, TopicHandle, String) = {
    val wh = Files.createTempDirectory("graft-manifest-scale").toString
    val d = new GraftDriver(spark, wh)
    d.createTopic("big", partitions = 2)
    (d, d.openTopic("big"), wh)
  }

  test("snapshot rolls move the file list to parquet; the resident manifest stays O(deltas)") {
    withLowThreshold {
      val (d, topic, _) = newTopic()
      val producer = topic.producer()
      (0 until 5).foreach { b =>
        (0 until 10).foreach(i => producer.push(s"""{"i":${b * 10 + i}}""",
          partition = Some(i % 2)))
        producer.flush()
      }
      val m = d.catalog.readManifest("big").get
      assert(m.filesRef.isDefined, "manifest must be parquet-backed past the threshold")
      // THE directive's assertion: the driver-resident structure holds only
      // the post-snapshot delta tail, never the full file list
      val resident = m.files.valuesIterator.map(_.size).sum
      val total = d.catalog.manifestFileCounts("big", m).values.sum
      assert(total == 10L, s"5 produces × 2 partitions = 10 chunk files, got $total")
      assert(resident < total,
        s"resident manifest ($resident entries) must not hold all $total files")
      // the relation itself is complete and typed
      val rel = d.catalog.manifestFilesRel("big", m).get
      assert(rel.count() + resident == total)
      // reads stay exactly right through the relation-planned source
      val rows = topic.events().select("partition", "event_id").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(rows == (for (p <- 0 until 2; i <- 0L until 25L) yield (p, i)).toSet)
    }
  }

  test("streaming planner prunes the relation and collects only overlapping files") {
    withLowThreshold {
      val (d, topic, _) = newTopic()
      val producer = topic.producer()
      (0 until 5).foreach { b =>
        (0 until 10).foreach(i => producer.push(s"""{"i":${b * 10 + i}}""",
          partition = Some(i % 2)))
        producer.flush()
      }
      assert(d.catalog.readManifest("big").get.filesRef.isDefined)
      // a tail slice [20, 25) per partition overlaps exactly the last of the
      // 5 chunk files per partition — the join path must return 1 file per
      // partition, not the topic's 10
      val slices = graft.streaming.GraftPartitions.plan(
        d.catalog, "big", targets = None, from = _ => 20L, until = _ => 25L)
      assert(slices.length == 2)
      slices.foreach { s =>
        val ip = s.asInstanceOf[graft.streaming.GraftInputPartition]
        assert(ip.files.size == 1,
          s"tail slice must plan 1 overlapping file, got ${ip.files.size}: ${ip.files}")
      }
      // and a full-history slice still plans every file
      val full = graft.streaming.GraftPartitions.plan(
        d.catalog, "big", targets = None, from = _ => 0L, until = _ => 25L)
      assert(full.map(_.asInstanceOf[graft.streaming.GraftInputPartition].files.size).sum == 10)
    }
  }

  test("produce hygiene (purge/vacuum) anti-joins the relation without false positives") {
    withLowThreshold {
      val (d, topic, _) = newTopic()
      val producer = topic.producer()
      (0 until 3).foreach { b =>
        (0 until 10).foreach(i => producer.push(s"""{"i":$i}""", partition = Some(i % 2)))
        producer.flush()
      }
      // clean topic: nothing is uncommitted, vacuum must delete NOTHING —
      // a false positive here would destroy committed data
      val vac = topic.vacuum()
      assert(vac.uncommittedChunks == 0, vac)
      assert(topic.events().count() == 30)
      // plant an orphan chunk (a crashed produce's leftover: not in the
      // manifest, ids at the watermark) — the anti-join must find exactly it
      val logDir = new org.apache.hadoop.fs.Path(d.catalog.logPath("big"), "partition=0")
      val orphanSrc = topic.events().filter(col("partition") === 0 && col("event_id") < 2)
        .withColumn("event_id", col("event_id") + 15L)
      val tmpOut = Files.createTempDirectory("orphan").toString
      orphanSrc.coalesce(1).write.mode("overwrite").parquet(tmpOut)
      val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmpOut))
        .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(logDir, "chunk-zz-orphan.parquet"))
      val vac2 = topic.vacuum()
      assert(vac2.uncommittedChunks == 1, vac2)
      assert(topic.events().count() == 30)
    }
  }

  test("zone and bloom indexes plan via the live-file relation") {
    withLowThreshold {
      val (d, topic, _) = newTopic()
      val producer = topic.producer()
      (0 until 4).foreach { b =>
        (0 until 10).foreach(i => producer.push(s"""{"v":${b * 10 + i}}""",
          partition = Some(i % 2)))
        producer.flush()
      }
      assert(d.catalog.readManifest("big").get.filesRef.isDefined)
      assert(topic.refreshIndex("byv", "$.v") == 8)
      // refresh again: nothing new, distributed diff must report 0
      assert(topic.refreshIndex("byv", "$.v") == 0)
      val scan = topic.indexScan("byv", 0.0, 5.0)
      assert(scan.total == 8, scan)
      assert(scan.kept == 2, s"values 0-5 live in produce-0's two files: $scan")
      val got = topic.eventsIndexed("byv", 12.0, 17.0)
        .select(get_json_object(col("metadata"), "$.v").cast("long")).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == (12L to 17L))
      // bloom: point lookup through the same relation-planned universe
      assert(topic.refreshBloomIndex("bv", "$.v") == 8)
      val bs = topic.bloomScanEq("bv", "13")
      assert(bs.total == 8 && bs.kept >= 1 && bs.kept <= 2, bs)
      assert(topic.eventsBloomEq("bv", "13").count() == 1)
    }
  }

  test("maintenance (describe/maintain/compact) stays correct on parquet-backed manifests") {
    withLowThreshold {
      val (d, topic, _) = newTopic()
      val producer = topic.producer()
      (0 until 4).foreach { b =>
        (0 until 10).foreach(i => producer.push(s"""{"i":$i}""", partition = Some(i % 2)))
        producer.flush()
      }
      val desc = topic.describe().collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      assert(desc.toSet == Set((0, 20L, 4L), (1, 20L, 4L)), desc.toSeq)
      // 4 files/partition > 2 → maintain compacts; the rebuilt manifest is
      // parquet-backed again and reads stay identical
      val (compacted, _, _) = topic.maintain(maxFilesPerPartition = 2)
      assert(compacted)
      val m = d.catalog.readManifest("big").get
      assert(m.filesRef.isDefined, "rebuilt manifest must stay parquet-backed")
      assert(topic.events().count() == 40)
      val counts = d.catalog.manifestFileCounts("big", m)
      assert(counts.values.forall(_ <= 2), counts)
    }
  }
}
