package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Shallow clone ([[Catalog.cloneTopic]] — the Delta SHALLOW CLONE analog):
 * a new topic referencing the source's committed files, O(metadata) and
 * zero data bytes copied; `restoreArchive()` on the clone materializes it
 * (deep clone) without touching the source.
 */
class CloneSpec extends SparkSpec {

  private def k(c: org.apache.spark.sql.Column = col("metadata")) =
    get_json_object(c, "$.k").cast("long")

  private def mkDriver(): GraftDriver =
    new GraftDriver(spark, Files.createTempDirectory("graft-clone").toString)

  private def produceRange(t: TopicHandle, from: Int, until: Int): Unit = {
    import spark.implicits._
    t.producer().produce(
      (from until until).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")): Unit
  }

  private def keys(t: TopicHandle): Seq[Long] =
    t.events().select(k()).collect().map(_.getLong(0)).sorted.toSeq

  private def chunkFiles(d: GraftDriver, topic: String): Seq[String] = {
    val log = new org.apache.hadoop.fs.Path(d.catalog.logPath(topic))
    val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(log)) Nil
    else fs.listStatus(log).filter(_.isDirectory).flatMap(dir =>
      fs.listStatus(dir.getPath).filter(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)).toSeq
  }

  test("a clone reads identically to the source with ZERO data files copied") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 100)
    val clone = d.cloneTopic("src", "dup")
    assert(keys(clone) == (0L until 100L))
    assert(chunkFiles(d, "dup").isEmpty, "no chunk files under the clone's log")
    // schema/stream surfaces work too: the clone is a normal topic
    assert(spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "dup")
      .load().count() == 100)
  }

  test("produces after the clone are isolated BOTH ways; ids continue densely") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 40)
    val clone = d.cloneTopic("src", "dup")
    produceRange(src, 1000, 1020)   // source-only
    produceRange(clone, 2000, 2030) // clone-only
    assert(keys(src) == ((0L until 40L) ++ (1000L until 1020L)))
    assert(keys(clone) == ((0L until 40L) ++ (2000L until 2030L)))
    // dense ids: the clone's produce continued from the cloned watermark
    val ids = clone.events().groupBy(col("partition"))
      .agg(count(lit(1)).as("n"), max(col("event_id")).as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ids.forall { case (n, mx) => mx == n - 1 }, "ids dense per partition")
  }

  test("deletes are isolated: vectors copied at clone time, diverge after") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 60)
    src.deleteWhereVectored(k() < 10): Unit
    val clone = d.cloneTopic("src", "dup")
    assert(keys(clone) == (10L until 60L), "pre-clone vectors apply to the clone")
    clone.deleteWhereVectored(k() >= 50): Unit // clone-only delete
    src.deleteWhereVectored(k() % 2 === 1): Unit // source-only delete
    assert(keys(clone) == (10L until 50L))
    assert(keys(src) == (10L until 60L).filter(_ % 2 == 0))
  }

  test("restoreArchive materializes the clone; the source keeps every file") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 50)
    val srcFiles = chunkFiles(d, "src")
    val clone = d.cloneTopic("src", "dup")
    val copied = clone.restoreArchive()
    assert(copied == srcFiles.size)
    assert(chunkFiles(d, "src").sorted == srcFiles.sorted, "source untouched")
    assert(chunkFiles(d, "dup").size == srcFiles.size, "clone owns real files now")
    assert(d.catalog.tierState("dup").isEmpty)
    assert(keys(clone) == (0L until 50L))
    // materialized clone accepts maintenance rewrites again
    clone.compact(): Unit
    assert(keys(clone) == (0L until 50L))
  }

  test("a still-shallow clone refuses archiving and physical rewrites") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 30)
    val clone = d.cloneTopic("src", "dup")
    intercept[IllegalArgumentException] {
      clone.archiveBefore(10L)
    }
    // tiered-topic contract: physical rewrite refuses, vector delete works
    intercept[Exception] { clone.deleteWhere(k() < 5) }
    clone.deleteWhereVectored(k() < 5): Unit
    assert(keys(clone) == (5L until 30L))
    assert(keys(src) == (0L until 30L), "source sees neither")
  }

  test("physical deletion on the SOURCE refuses while a shallow clone lives") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 60)
    d.cloneTopic("src", "dup"): Unit
    assert(d.catalog.liveClones("src") == Seq("dup"))
    // every physical-deletion surface names the clone and refuses
    val e = intercept[IllegalStateException] { src.compact() }
    assert(e.getMessage.contains("dup"), s"must name the live clone: ${e.getMessage}")
    intercept[IllegalStateException] { src.deleteWhere(k() < 5) }
    intercept[IllegalStateException] { src.expire(10L) }
    intercept[IllegalStateException] { src.archiveBefore(10L) }
    intercept[IllegalStateException] { d.dropTopic("src") }
    // the clone still reads cleanly — nothing was broken
    assert(keys(d.openTopic("dup")) == (0L until 60L))
    // vectored (merge-on-read) deletes stay allowed: no files move
    src.deleteWhereVectored(k() === 0): Unit
    // materializing the clone releases the source
    d.openTopic("dup").restoreArchive(): Unit
    assert(d.catalog.liveClones("src").isEmpty)
    src.compact()
    assert(keys(src) == (1L until 60L))
    assert(keys(d.openTopic("dup")) == (0L until 60L), "materialized clone unaffected")
  }

  test("dropping a clone releases the source; force overrides the guard") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 20)
    d.cloneTopic("src", "dup"): Unit
    intercept[IllegalStateException] { src.compact() }
    d.dropTopic("dup")
    src.compact() // registration pruned lazily: the dead clone never blocks
    assert(keys(src) == (0L until 20L))
    d.cloneTopic("src", "dup2"): Unit
    // the cron surface SKIPS the compact step on a cloned source (the
    // tiered-skip shape) instead of failing routine maintenance
    val (compacted, _, _) = d.catalog.maintainTopic("src", maxFilesPerPartition = 1)
    assert(!compacted, "maintain must skip compaction while a clone lives")
    spark.conf.set("spark.graft.clone.force", "true")
    try src.compact() // explicit break-my-clones override
    finally spark.conf.unset("spark.graft.clone.force")
  }

  test("cloning a TIERED source carries both its cold and hot files") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 40)
    src.archiveBefore(20L): Unit // ids < 20 go cold
    produceRange(src, 40, 50)
    val clone = d.cloneTopic("src", "dup")
    assert(keys(clone) == (0L until 50L))
  }

  test("clone inherits the gap marker; duplicate target fails loudly") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 30)
    src.deleteWhere(k() < 5) // physical delete → gap marker
    val _ = d.cloneTopic("src", "dup")
    assert(d.catalog.mayHaveIdGaps("dup"),
      "gaps are a data property — the clone inherits the marker")
    assert(keys(d.openTopic("dup")) == (5L until 30L))
    intercept[IllegalStateException] { d.cloneTopic("src", "dup") }
  }

  test("copied vector roots re-attribute to the clone's birth commit (v1)") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 40)
    produceRange(src, 40, 60) // several source commits, so the source seq > 1
    src.deleteWhereVectored(k() < 6): Unit
    val _ = d.cloneTopic("src", "dup")
    val root = d.catalog.deleteVectorFiles("dup").head
    assert(Catalog.vectorRootVersion(root).contains(1L),
      "the source's embedded seq means nothing in the clone's history")
    // feed-replay consistency: changes spanning the clone's birth replay
    // raw inserts AND the copied preimages, reproducing the cloned state
    val feed = spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "dup")
      .option("readChangeFeed", "true").load()
    val dels = feed.filter(col("_change_type") === "delete")
      .select(k(), col("_commit_version")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(dels.map(_._1).sorted.toSeq == (0L until 6L))
    assert(dels.forall(_._2 == 1L), "attributed to the clone's birth commit")
  }

  test("materialize resumes past a truncated partial copy by re-copying it") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 50)
    val clone = d.cloneTopic("src", "dup")
    // simulate a copy that crashed mid-file: a TRUNCATED destination
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val srcFile = new org.apache.hadoop.fs.Path(chunkFiles(d, "src").head)
    val dstDir = new org.apache.hadoop.fs.Path(
      d.catalog.logPath("dup") + "/" + srcFile.getParent.getName)
    fs.mkdirs(dstDir)
    val partial = new org.apache.hadoop.fs.Path(dstDir, srcFile.getName)
    val out = fs.create(partial)
    out.write(Array[Byte](1, 2, 3)); out.close()

    clone.restoreArchive(): Unit
    assert(fs.getFileStatus(partial).getLen ==
      fs.getFileStatus(srcFile).getLen, "the truncated partial was re-copied")
    assert(keys(clone) == (0L until 50L))
  }

  test("cloning a legacy (no-manifest) topic with data refuses loudly") {
    val d = mkDriver()
    d.createTopic("src", partitions = 2)
    val src = d.openTopic("src")
    produceRange(src, 0, 20)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      d.warehouse + "/src/_manifest"), true): Unit
    val ex = intercept[IllegalStateException] { d.cloneTopic("src", "dup2") }
    assert(ex.getMessage.contains("rebuildManifest"))
    assert(!d.topicExists("dup2"), "nothing half-created")
  }

  test("relation-backed inventory: a clone past the driver threshold plans via parquet") {
    val d = mkDriver()
    spark.conf.set("spark.graft.manifest.driverMaxEntries", "0")
    try {
      d.createTopic("src", partitions = 2)
      val src = d.openTopic("src")
      produceRange(src, 0, 40)
      produceRange(src, 40, 80) // second commit: relation + tail shapes
      val clone = d.cloneTopic("src", "dup")
      val st = d.catalog.tierState("dup").get
      assert(st.shared && st.filesRef.isDefined,
        "past the threshold the clone's inventory is a parquet relation")
      assert(keys(clone) == (0L until 80L))
    } finally spark.conf.unset("spark.graft.manifest.driverMaxEntries")
  }
}
