package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * SQL MERGE cross-commit crash atomicity ([[MergeCommit]]): the pair
 * (produce commit, vector-delete commit) is tied together by a persisted
 * merge intent that [[Catalog.reconcileProduceState]] decides at the next
 * produce-path entry — ranges below the watermark prove the produce
 * committed (roll the delete FORWARD: an interrupted UPDATE completes),
 * anything else proves it died pre-commit (roll BACK: the merge never
 * happened). These specs construct the exact on-disk crash states the
 * protocol's two windows leave behind and assert the final table BOTH
 * ways.
 */
class MergeRecoverySpec extends SparkSpec {

  private def mkTopic(): (GraftDriver, TopicHandle) = {
    import spark.implicits._
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-mergerec").toString)
    d.createTopic("t", partitions = 2)
    val topic = d.openTopic("t")
    topic.producer().produce(
      (0 until 10).map(i => (s"""{"k":$i,"v":"old"}""", i % 2)).toDF("metadata", "partition"))
    (d, topic)
  }

  /** Stage merge actions the way the executor-side task writers do:
    * tombstone rows with k < 3, insert their replacements (an UPDATE of
    * k ∈ {0,1,2} split into its delete+insert halves). Returns the
    * staging dir and its file list. */
  private val stageN = new java.util.concurrent.atomic.AtomicInteger(0)

  private def stageActions(d: GraftDriver): (String, Vector[String]) = {
    import spark.implicits._
    val stagingDir = new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("t"), s"tmp-merge-spec${stageN.incrementAndGet()}").toString
    val dels = (0 until 3).map(k => (0, k % 2, (k / 2).toLong,
      null.asInstanceOf[String], null.asInstanceOf[Array[Byte]]))
    val ins = (0 until 3).map(k => (1, k % 2, -1L,
      s"""{"k":$k,"v":"new"}""", null.asInstanceOf[Array[Byte]]))
    (dels ++ ins).toDF("op", "partition", "event_id", "metadata", "data")
      .coalesce(1).write.parquet(stagingDir)
    val fs = new org.apache.hadoop.fs.Path(stagingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(stagingDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toVector
    (stagingDir, files)
  }

  private def tableState(topic: TopicHandle): Seq[(Long, String)] =
    topic.events()
      .select(get_json_object(col("metadata"), "$.k").cast("long"),
        get_json_object(col("metadata"), "$.v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("crash AFTER the produce commit rolls the delete FORWARD") {
    val (d, topic) = mkTopic()
    val (stagingDir, files) = stageActions(d)
    // reproduce the crash state: intent written, produce committed with
    // its ranges recorded, driver dead before the vector-delete commit
    // (no staging heartbeat — the marker never existed, so it reads dead)
    val cat = d.catalog
    cat.acquireProduceLock("t")
    try {
      cat.reconcileProduceState("t")
      cat.writeMergeIntent("t", "m1",
        MergeIntent(stagingDir, files, deletes = 3L, inserts = 3L, None))
      new Producer(spark, cat, cat.openTopic("t")).produceHeld(
        spark.read.schema(MergeCommit.ReadSchema).parquet(files: _*)
          .filter(col("op") === 1)
          .select(col("partition"), col("metadata"), col("data")),
        ranges => cat.writeMergeIntent("t", "m1",
          MergeIntent(stagingDir, files, 3L, 3L,
            Some(TxnRange.toRanges(ranges))))): Unit
    } finally cat.releaseProduceLock("t")
    // torn state visible: replacements produced, originals NOT tombstoned
    assert(tableState(topic).count(_._2 == "new") == 3)
    assert(tableState(topic).size == 13, "pre-recovery: transient duplicates")

    // the next produce-path entry decides the intent → roll forward
    import spark.implicits._
    topic.producer().produce(Seq(("""{"k":99,"v":"old"}""", 1)).toDF("metadata", "partition"))

    val after = tableState(topic)
    assert(after.size == 11, s"10 - 3 updated + 3 new + 1 late = 11, got $after")
    assert(after.filter(_._1 < 3).map(_._2).forall(_ == "new"),
      "the interrupted UPDATE must COMPLETE, never degrade to insert-only")
    assert(cat.listMergeIntents("t").isEmpty, "intent consumed")
    val fs = new org.apache.hadoop.fs.Path(stagingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stagingDir)), "staging cleaned")
    // re-running recovery is a no-op (the delete was idempotent anyway)
    cat.acquireProduceLock("t")
    try cat.reconcileProduceState("t") finally cat.releaseProduceLock("t")
    assert(tableState(topic) == after)
  }

  test("crash BEFORE the produce commit rolls the merge BACK") {
    val (d, topic) = mkTopic()
    val (stagingDir, files) = stageActions(d)
    val cat = d.catalog
    val before = tableState(topic)
    // crash state: intent written with ranges the watermark never covered
    // (the produce died between fixing its ids and committing them)
    val wm = cat.nextIds("t")
    cat.writeMergeIntent("t", "m2",
      MergeIntent(stagingDir, files, 3L, 3L,
        Some(Vector(TxnRange(0, wm.getOrElse(0, 0L), 2L),
          TxnRange(1, wm.getOrElse(1, 0L), 1L)))))

    // vacuum must NOT reap intent-referenced staging, stale or not —
    // age the dir past the horizon so the liveness rule alone WOULD reap it
    val fs = new org.apache.hadoop.fs.Path(stagingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.setTimes(new org.apache.hadoop.fs.Path(stagingDir),
      System.currentTimeMillis() - 2 * Catalog.CompactLockStaleMs, -1)
    cat.vacuumTopic("t"): Unit
    assert(fs.exists(new org.apache.hadoop.fs.Path(stagingDir)),
      "recovery owns intent-referenced staging; vacuum must leave it")

    // next entry (maintain is the cron-surface trigger) → roll back
    cat.maintainTopic("t"): Unit
    assert(tableState(topic) == before, "a pre-commit crash leaves NO trace")
    assert(cat.deleteVectorFiles("t").isEmpty, "no tombstones from a rolled-back merge")
    assert(cat.listMergeIntents("t").isEmpty, "intent discarded")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stagingDir)), "staging cleaned")
  }

  test("a MERGE retried inside a torn predecessor's window heals first — no duplicates") {
    val (d, topic) = mkTopic()
    val (stagingDir, files) = stageActions(d)
    val cat = d.catalog
    // torn state: produce committed (replacements visible beside the
    // originals), delete pending, driver dead (no marker)
    cat.acquireProduceLock("t")
    try {
      cat.reconcileProduceState("t")
      cat.writeMergeIntent("t", "m4",
        MergeIntent(stagingDir, files, 3L, 3L, None))
      new Producer(spark, cat, cat.openTopic("t")).produceHeld(
        spark.read.schema(MergeCommit.ReadSchema).parquet(files: _*)
          .filter(col("op") === 1)
          .select(col("partition"), col("metadata"), col("data")),
        ranges => cat.writeMergeIntent("t", "m4",
          MergeIntent(stagingDir, files, 3L, 3L,
            Some(TxnRange.toRanges(ranges))))): Unit
    } finally cat.releaseProduceLock("t")
    assert(tableState(topic).size == 13, "torn: originals + replacements")

    // the user RETRIES the merge through SQL: its plan-time target scan
    // must decide the pending intent first, or it matches BOTH copies of
    // each k < 3 and inserts duplicates the roll-forward never removes
    val sqlCat = "mergerec_retry"
    spark.conf.set(s"spark.sql.catalog.$sqlCat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$sqlCat.warehouse", d.warehouse)
    import spark.implicits._
    (0 until 3).map(k => (k.toLong, s"""{"k":$k,"v":"new"}"""))
      .toDF("k", "md").createOrReplaceTempView("retry_src")
    spark.sql(
      s"""MERGE INTO $sqlCat.t tgt USING retry_src c
         |ON get_json_object(tgt.metadata, '$$.k') = CAST(c.k AS STRING)
         |WHEN MATCHED THEN UPDATE SET metadata = c.md
         |WHEN NOT MATCHED THEN INSERT (partition, event_id, metadata, data)
         |  VALUES (CAST(NULL AS INT), -1L, c.md, NULL)""".stripMargin)
    val after = tableState(topic)
    assert(after.size == 10, s"exactly one row per key after the retry: $after")
    assert(after.groupBy(_._1).forall(_._2.size == 1), s"duplicate keys: $after")
    assert(after.filter(_._1 < 3).forall(_._2 == "new"))
    assert(cat.listMergeIntents("t").isEmpty)
  }

  test("a retry against a HARD-crashed merge (fresh marker) refuses loudly, then heals") {
    val (d, topic) = mkTopic()
    val (stagingDir, files) = stageActions(d)
    val cat = d.catalog
    val fs = new org.apache.hadoop.fs.Path(stagingDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // kill -9 shape: produce committed, intent kept, and the _inprogress
    // marker EXISTS with a fresh mtime (the heartbeat died with the JVM,
    // but the horizon hasn't passed — recovery cannot yet tell this from
    // a live merge mid-delete-phase)
    fs.create(new org.apache.hadoop.fs.Path(stagingDir, "_inprogress"), true).close()
    cat.acquireProduceLock("t")
    try {
      cat.reconcileProduceState("t")
      cat.writeMergeIntent("t", "m5",
        MergeIntent(stagingDir, files, 3L, 3L, None))
      new Producer(spark, cat, cat.openTopic("t")).produceHeld(
        spark.read.schema(MergeCommit.ReadSchema).parquet(files: _*)
          .filter(col("op") === 1)
          .select(col("partition"), col("metadata"), col("data")),
        ranges => cat.writeMergeIntent("t", "m5",
          MergeIntent(stagingDir, files, 3L, 3L,
            Some(TxnRange.toRanges(ranges))))): Unit
    } finally cat.releaseProduceLock("t")

    val sqlCat = "mergerec_hard"
    spark.conf.set(s"spark.sql.catalog.$sqlCat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$sqlCat.warehouse", d.warehouse)
    import spark.implicits._
    (0 until 3).map(k => (k.toLong, s"""{"k":$k,"v":"new"}"""))
      .toDF("k", "md").createOrReplaceTempView("hard_src")
    def retry(): Unit = spark.sql(
      s"""MERGE INTO $sqlCat.t tgt USING hard_src c
         |ON get_json_object(tgt.metadata, '$$.k') = CAST(c.k AS STRING)
         |WHEN MATCHED THEN UPDATE SET metadata = c.md
         |WHEN NOT MATCHED THEN INSERT (partition, event_id, metadata, data)
         |  VALUES (CAST(NULL AS INT), -1L, c.md, NULL)""".stripMargin): Unit
    // undecidable window: the retry must REFUSE (after the compressed
    // plan-time patience window — the intent cannot resolve while the
    // marker reads live), never plan over the duplicate view (matching
    // both copies would insert permanent dups)
    // session conf (the merge path builds its own Catalog instances, so a
    // per-instance override cannot reach it; the var default stays global)
    spark.conf.set("spark.graft.merge.commitWaitMs", "400")
    val e =
      try intercept[Exception](retry())
      finally spark.conf.unset("spark.graft.merge.commitWaitMs")
    assert(e.getMessage.contains("undecided"), e.getMessage)
    // the marker ages out (or a graceful failure path deletes it) → the
    // same retry heals first and applies exactly once
    fs.setTimes(new org.apache.hadoop.fs.Path(stagingDir, "_inprogress"),
      System.currentTimeMillis() - 2 * Catalog.CompactLockStaleMs, -1)
    retry()
    val after = tableState(topic)
    assert(after.size == 10 && after.groupBy(_._1).forall(_._2.size == 1),
      s"exactly one row per key: $after")
    assert(after.filter(_._1 < 3).forall(_._2 == "new"))
  }

  test("optimistic conflict check: removals since the plan abort, appends don't") {
    val (d, topic) = mkTopic()
    val (stagingDir, files) = stageActions(d)
    val cat = d.catalog
    val planned = cat.versionHistory("t").last.version

    // a concurrent APPEND never conflicts — row-level plans match existing
    // rows, and new rows were not in the match window by definition
    import spark.implicits._
    topic.producer().produce(Seq(("""{"k":50,"v":"old"}""", 0)).toDF("metadata", "partition"))
    cat.failOnRowRemovalSince("t", planned) // must not throw

    // a concurrent VECTOR DELETE conflicts: the staged actions were
    // matched against rows that may no longer exist
    topic.deleteWhereVectored(
      get_json_object(col("metadata"), "$.k").cast("long") === 9L): Unit
    val e = intercept[IllegalStateException](
      MergeCommit.commit(spark, d.warehouse, "t", files, 3L, 3L, stagingDir,
        plannedVersion = Some(planned)))
    assert(e.getMessage.contains("concurrent modification"), e.getMessage)
    // aborted BEFORE anything became visible: no replacements, no intent
    assert(tableState(topic).count(_._2 == "new") == 0)
    assert(cat.listMergeIntents("t").isEmpty)

    // the same staged merge re-planned against the CURRENT version commits
    val now = cat.versionHistory("t").last.version
    MergeCommit.commit(spark, d.warehouse, "t", files, 3L, 3L, stagingDir,
      plannedVersion = Some(now))
    val after = tableState(topic)
    assert(after.filter(_._1 < 3).map(_._2).forall(_ == "new"))
    assert(cat.listMergeIntents("t").isEmpty)

    // the pure-delete path checks INSIDE the vector commit's lock too
    val (staging2, files2) = stageActions(d)
    intercept[IllegalStateException](
      MergeCommit.commit(spark, d.warehouse, "t", files2, 3L, 0L, staging2,
        plannedVersion = Some(planned)))
  }

  test("a version-less LEGACY vector root conservatively conflicts, with the remedy named") {
    val (d, topic) = mkTopic()
    val cat = d.catalog
    topic.deleteWhereVectored(
      get_json_object(col("metadata"), "$.k").cast("long") === 4L): Unit
    // strip the version tag off the committed root — the pre-versioning
    // on-disk shape (d-<ms>-<uuid>, no 'v<seq>' segment, no sidecar)
    val root = new org.apache.hadoop.fs.Path(cat.deleteVectorFiles("t").head)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val legacy = new org.apache.hadoop.fs.Path(root.getParent,
      root.getName.replaceFirst("-v\\d+-", "-"))
    assert(fs.rename(root, legacy), s"rename $root -> $legacy")
    // even a plan against the CURRENT version cannot prove the root old
    val now = cat.versionHistory("t").last.version
    val e = intercept[IllegalStateException](cat.failOnRowRemovalSince("t", now))
    assert(e.getMessage.contains("no version tag") &&
      e.getMessage.contains("compact"), e.getMessage)
    // the named remedy clears it: a physical fold consumes the vectors
    topic.compact()
    cat.failOnRowRemovalSince("t", cat.versionHistory("t").last.version)
    assert(topic.events().count() == 9L, "the legacy root's delete still applied")
  }

  test("two-commit merges SERIALIZE: phase 1 refuses beside a live foreign intent") {
    val (d, topic) = mkTopic()
    val cat = d.catalog
    // merge A: produce committed, delete pending, driver LIVE (fresh
    // marker) — its row removal is invisible to any version/evidence
    // check until its phase 2 lands
    val (stagingA, filesA) = stageActions(d)
    val fs = new org.apache.hadoop.fs.Path(stagingA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(stagingA, "_inprogress"), true).close()
    cat.acquireProduceLock("t")
    try {
      cat.reconcileProduceState("t")
      cat.writeMergeIntent("t", "mA",
        MergeIntent(stagingA, filesA, 3L, 3L, None))
      new Producer(spark, cat, cat.openTopic("t")).produceHeld(
        spark.read.schema(MergeCommit.ReadSchema).parquet(filesA: _*)
          .filter(col("op") === 1)
          .select(col("partition"), col("metadata"), col("data")),
        ranges => cat.writeMergeIntent("t", "mA",
          MergeIntent(stagingA, filesA, 3L, 3L,
            Some(TxnRange.toRanges(ranges))))): Unit
    } finally cat.releaseProduceLock("t")

    // merge B (planned BEFORE A's intent existed — plan-time refusal
    // cannot have caught it) must refuse at COMMIT, pre-visibility:
    // committing beside A would re-assert stale matched state once A's
    // phase-2 delete lands (write skew). A NEVER-resolving foreign
    // intent exhausts the statement-patience window (compressed here)
    // and still surfaces loud and typed.
    val (stagingB, filesB) = stageActions(d)
    val before = tableState(topic)
    spark.conf.set("spark.graft.merge.commitWaitMs", "400")
    val e =
      try intercept[ConcurrentMergeException](
        MergeCommit.commit(spark, d.warehouse, "t", filesB, 3L, 3L, stagingB,
          plannedVersion = Some(0L)))
      finally spark.conf.unset("spark.graft.merge.commitWaitMs")
    assert(e.getMessage.contains("serialize"), e.getMessage)
    assert(tableState(topic) == before, "B must leave no trace")
    assert(cat.listMergeIntents("t").keySet == Set("mA"), "A's intent untouched")
  }

  test("statement patience: a MERGE queues behind a resolving foreign intent — both land") {
    val (d, topic) = mkTopic()
    val cat = d.catalog
    // merge A mid-commit: produce committed, delete pending, marker fresh
    // (a live driver between its phase 1 and phase 2)
    val (stagingA, filesA) = stageActions(d)
    val fs = new org.apache.hadoop.fs.Path(stagingA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(stagingA, "_inprogress")
    fs.create(marker, true).close()
    cat.acquireProduceLock("t")
    try {
      cat.reconcileProduceState("t")
      cat.writeMergeIntent("t", "mA",
        MergeIntent(stagingA, filesA, 3L, 3L, None))
      new Producer(spark, cat, cat.openTopic("t")).produceHeld(
        spark.read.schema(MergeCommit.ReadSchema).parquet(filesA: _*)
          .filter(col("op") === 1)
          .select(col("partition"), col("metadata"), col("data")),
        ranges => cat.writeMergeIntent("t", "mA",
          MergeIntent(stagingA, filesA, 3L, 3L,
            Some(TxnRange.toRanges(ranges))))): Unit
    } finally cat.releaseProduceLock("t")

    // A's driver "dies" 600ms in: the heartbeat marker goes stale, making
    // the intent decidable — B's own plan-time patience loop then heals A
    // (rolls the delete forward) and proceeds. No caller retry loop.
    val ager = new Thread(() => {
      Thread.sleep(600L)
      fs.setTimes(marker,
        System.currentTimeMillis() - 2 * Catalog.CompactLockStaleMs, -1)
    })
    ager.start()
    val sqlCat = "mergerec_queue"
    spark.conf.set(s"spark.sql.catalog.$sqlCat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$sqlCat.warehouse", d.warehouse)
    import spark.implicits._
    (4 to 6).map(k => (k.toLong, s"""{"k":$k,"v":"new2"}"""))
      .toDF("k", "md").createOrReplaceTempView("queue_src")
    spark.conf.set("spark.graft.merge.commitWaitMs", "20000")
    try spark.sql(
      s"""MERGE INTO $sqlCat.t tgt USING queue_src c
         |ON get_json_object(tgt.metadata, '$$.k') = CAST(c.k AS STRING)
         |WHEN MATCHED THEN UPDATE SET metadata = c.md""".stripMargin): Unit
    finally { spark.conf.unset("spark.graft.merge.commitWaitMs"); ager.join() }

    val after = tableState(topic)
    assert(after.size == 10 && after.map(_._1).distinct.size == 10,
      s"exactly one row per key after both merges: $after")
    assert(after.filter(_._1 < 3).forall(_._2 == "new"),
      s"A's interrupted UPDATE must have completed: $after")
    assert(after.filter(t => t._1 >= 4 && t._1 <= 6).forall(_._2 == "new2"),
      s"B's queued UPDATE must have landed: $after")
    assert(after.filter(t => t._1 == 3 || t._1 > 6).forall(_._2 == "old"))
    assert(cat.listMergeIntents("t").isEmpty)
  }

  test("phase-1 patience rides TYPED conflicts: a transient compact lock is waited out") {
    val (d, topic) = mkTopic()
    val cat = d.catalog
    val (stagingDir, files) = stageActions(d)
    // a "compaction" holds the topic for 600ms on its own thread (locks
    // are owner-released); the latch guarantees it is live before the
    // merge starts. The merge must WAIT (typed LockConflictException —
    // no message-substring matching anywhere), then land whole.
    val held = new java.util.concurrent.CountDownLatch(1)
    val compactor = new Thread(() => {
      cat.acquireCompactLock("t")
      held.countDown()
      Thread.sleep(600L)
      cat.releaseCompactLock("t")
    })
    compactor.start()
    held.await()
    // DIRECT caller: no pre-existing staging heartbeat — commit() must
    // create (and own) the `_inprogress` marker itself, so a concurrent
    // produce-path entry cannot read the mid-commit intent as dead
    val marker = new org.apache.hadoop.fs.Path(stagingDir, "_inprogress")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(marker))
    @volatile var markerSeenLive = false
    val observer = new Thread(() => {
      val deadline = System.currentTimeMillis() + 5000L
      while (!markerSeenLive && System.currentTimeMillis() < deadline) {
        if (fs.exists(marker)) markerSeenLive = true else Thread.sleep(20L)
      }
    })
    observer.start()
    spark.conf.set("spark.graft.merge.commitWaitMs", "20000")
    try MergeCommit.commit(spark, d.warehouse, "t", files, 3L, 3L, stagingDir,
      plannedVersion = Some(cat.versionHistory("t").last.version))
    finally { spark.conf.unset("spark.graft.merge.commitWaitMs")
      compactor.join(); observer.join() }
    val after = tableState(topic)
    assert(after.size == 10 && after.filter(_._1 < 3).forall(_._2 == "new"),
      s"the merge must have waited out the compaction and landed whole: $after")
    assert(markerSeenLive, "commit() must create the staging heartbeat when absent")
    assert(!fs.exists(marker), "commit() must remove a marker it created")
    assert(cat.listMergeIntents("t").isEmpty)
  }

  test("intent with no recorded ranges (died before produce fixed ids) rolls back") {
    val (d, topic) = mkTopic()
    val (stagingDir, files) = stageActions(d)
    val cat = d.catalog
    val before = tableState(topic)
    cat.writeMergeIntent("t", "m3", MergeIntent(stagingDir, files, 3L, 3L, None))
    import spark.implicits._
    topic.producer().produce(Seq(("""{"k":98,"v":"old"}""", 0)).toDF("metadata", "partition"))
    assert(tableState(topic).size == before.size + 1)
    assert(cat.deleteVectorFiles("t").isEmpty)
    assert(cat.listMergeIntents("t").isEmpty)
  }
}
