package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine.{GraftDriver, TopicHandle}

/**
 * Change data feed through the SOURCE (`readChangeFeed=true`): the
 * scan-level form of `TopicHandle.changes` — batch
 * (`spark.read.format("graft")`) and streaming (`readStream`, offsets
 * carrying the emitted-deletes version frontier). Inserts are the RAW
 * version-diff id window (a row inserted in the span counts even if
 * vector-deleted later), deletes are full preimages of in-span vector
 * roots, each side a pure scan.
 */
class StreamingCdfSpec extends SparkSpec {

  private def k(c: org.apache.spark.sql.Column = col("metadata")) =
    get_json_object(c, "$.k").cast("long")

  private def newTopic(): (GraftDriver, TopicHandle, String) = {
    val wh = Files.createTempDirectory("graft-scdf").toString
    val d = new GraftDriver(spark, wh)
    d.createTopic("t", partitions = 2)
    (d, d.openTopic("t"), wh)
  }

  private def produceRange(topic: TopicHandle, from: Int, until: Int): Unit = {
    import spark.implicits._
    topic.producer().produce(
      (from until until).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")): Unit
  }

  private def lastVersion(topic: TopicHandle): Long =
    topic.history().orderBy("version").collect().map(_.getAs[Long]("version")).last

  private def readCdf(wh: String, extra: (String, String)*) = {
    val base = spark.read.format("graft")
      .option("warehouse", wh).option("topic", "t")
      .option("readChangeFeed", "true")
    extra.foldLeft(base) { case (r, (key, v)) => r.option(key, v) }.load()
  }

  /** Drain a CDF stream with AvailableNow into a buffer; resumable. */
  private def drain(wh: String, ckpt: String, extra: (String, String)*)
      : Seq[(String, Long, Long)] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val base = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "t")
      .option("readChangeFeed", "true")
    val q = extra.foldLeft(base) { case (r, (key, v)) => r.option(key, v) }
      .load()
      .select(col("_change_type"), k().as("k"), col("_commit_version"),
        col("_commit_timestamp"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.collect().map { r =>
          assert(!r.isNullAt(3), "in-span changes carry a commit timestamp")
          (r.getString(0), r.getLong(1), r.getLong(2))
        }
        acc.synchronized { acc ++= rows }: Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive)
    acc.toSeq
  }

  test("batch readChangeFeed matches TopicHandle.changes") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 80)
    val v1 = lastVersion(topic)
    produceRange(topic, 80, 140)
    topic.deleteWhereVectored(k() % 7 === 0): Unit
    val v2 = lastVersion(topic)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_change_type"), k().as("k"), col("_commit_version"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq

    val viaSource = canon(readCdf(wh,
      "startingVersion" -> v1.toString, "endingVersion" -> v2.toString))
    val viaHandle = canon(topic.changes(v1, v2))
    assert(viaSource == viaHandle)
    assert(viaSource.nonEmpty)
    // raw inserts: vectored rows in the span still count as inserts
    assert(viaSource.count(_._1 == "insert") == 60)
    // preimages span BOTH produces (k % 7 == 0, k < 140)
    assert(viaSource.count(_._1 == "delete") == 20)
  }

  test("fresh CDF stream emits the full history: raw inserts + delete preimages") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 60)
    topic.deleteWhereVectored(k() % 10 === 0): Unit
    val vDel = lastVersion(topic)

    val got = drain(wh, Files.createTempDirectory("graft-scdf-ckpt").toString)
    val inserts = got.filter(_._1 == "insert")
    val deletes = got.filter(_._1 == "delete")
    assert(inserts.map(_._2).sorted == (0L until 60L), "inserts are the raw log")
    assert(deletes.map(_._2).sorted == (0L until 60L by 10L))
    assert(deletes.forall(_._3 == vDel), "delete preimages carry the vector commit")
  }

  test("startingVersion births the stream past that commit, deletes included") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 50)
    // pre-birth vector delete: must NOT replay
    topic.deleteWhereVectored(k() < 5): Unit
    val v1 = lastVersion(topic)
    produceRange(topic, 50, 90)
    topic.deleteWhereVectored(k() >= 40 && k() < 45): Unit // spans both produces

    val got = drain(wh, Files.createTempDirectory("graft-scdf-ckpt").toString,
      "startingVersion" -> v1.toString)
    assert(got.filter(_._1 == "insert").map(_._2).sorted == (50L until 90L))
    assert(got.filter(_._1 == "delete").map(_._2).sorted == (40L until 45L),
      "only the post-birth vector root replays; its preimages may be OLD rows")
  }

  test("checkpoint resume: each change is emitted exactly once across drains") {
    val (_, topic, wh) = newTopic()
    val ckpt = Files.createTempDirectory("graft-scdf-ckpt").toString
    produceRange(topic, 0, 40)
    val first = drain(wh, ckpt)
    assert(first.map(_._2).sorted == (0L until 40L))
    assert(first.forall(_._1 == "insert"))

    // new produce + a vector delete that hits FIRST-produce rows: the
    // version frontier (not the id cursor) must surface it
    produceRange(topic, 40, 70)
    topic.deleteWhereVectored(k() < 10): Unit
    val vDel = lastVersion(topic)
    val second = drain(wh, ckpt)
    assert(second.filter(_._1 == "insert").map(_._2).sorted == (40L until 70L))
    assert(second.filter(_._1 == "delete").map(_._2).sorted == (0L until 10L))
    assert(second.filter(_._1 == "delete").forall(_._3 == vDel))

    // third drain with nothing new: empty
    assert(drain(wh, ckpt).isEmpty)
  }

  test("a fold landing between drains: resumed stream replays folded deletes exactly") {
    val (d, topic, wh) = newTopic()
    val ckpt = Files.createTempDirectory("graft-scdf-fold-ckpt").toString
    produceRange(topic, 0, 60)
    // first drain: inserts plus ONE early delete the stream already emitted
    topic.deleteWhereVectored(k() === 0): Unit
    val vEarly = lastVersion(topic)
    val first = drain(wh, ckpt)
    assert(first.count(_._1 == "delete") == 1)
    // six more delete commits — the 5th+ cross the auto-fold bound, so the
    // EARLY root (already emitted) folds together with the new ones
    val newVers = (1 to 6).map { i =>
      topic.deleteWhereVectored(k() >= i * 5 && k() < i * 5 + 2): Unit
      lastVersion(topic)
    }
    assert(d.catalog.deleteVectorFiles("t").size <= 5, "auto-fold ran mid-stream")
    val second = drain(wh, ckpt)
    val dels = second.filter(_._1 == "delete")
    // the already-emitted early delete must NOT re-emit under a folded
    // identity; the six new commits each replay exactly their own rows
    assert(!dels.exists(_._3 == vEarly), "folded pre-frontier delete re-emitted")
    assert(dels.map(_._2).sorted ==
      (1 to 6).flatMap(i => Seq(i * 5L, i * 5L + 1)).sorted)
    newVers.zipWithIndex.foreach { case (v, idx) =>
      val i = idx + 1
      assert(dels.filter(_._3 == v).map(_._2).sorted == Seq(i * 5L, i * 5L + 1),
        s"commit $v must replay exactly its own preimages after the fold")
    }
    assert(drain(wh, ckpt).isEmpty, "third drain: nothing new")
  }

  test("admission-capped CDF stream splits inserts without losing attribution") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 30)
    val v1 = lastVersion(topic)
    produceRange(topic, 30, 60)
    val v2 = lastVersion(topic)
    topic.deleteWhereVectored(k() % 9 === 0): Unit
    val vDel = lastVersion(topic)

    val got = drain(wh, Files.createTempDirectory("graft-scdf-ckpt").toString,
      "maxEventsPerTrigger" -> "16")
    val inserts = got.filter(_._1 == "insert")
    assert(inserts.map(_._2).sorted == (0L until 60L))
    // attribution is per ROW, stable under any trigger slicing
    assert(inserts.forall { case (_, key, ver) =>
      ver == (if (key < 30) v1 else v2)
    })
    val deletes = got.filter(_._1 == "delete")
    assert(deletes.map(_._2).sorted == (0L until 60L by 9L))
    assert(deletes.forall(_._3 == vDel))
  }

  test("CDF offsets round-trip; legacy bare-map offsets still deserialize") {
    val withVer = TopicOffset(Map(0 -> 5L, 1 -> 7L), Some(3L))
    assert(TopicOffset.fromJson(withVer.json()) == withVer)
    val legacy = TopicOffset(Map(0 -> 5L, 1 -> 7L))
    assert(TopicOffset.fromJson(legacy.json()) == legacy)
    assert(!legacy.json().contains("ver"), "plain streams keep the legacy JSON")
  }

  test("option conflicts fail loudly") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 4)
    def bad(extra: (String, String)*): Unit = {
      intercept[IllegalArgumentException] {
        readCdf(wh, extra: _*).collect()
      }: Unit
    }
    bad("consumer" -> "c1")
    bad("applyDeletionVectors" -> "false")
    bad("startingTimeField" -> "$.k", "startingTimeCutoff" -> "0")
  }

  test("row tracking: _commit_version/_commit_timestamp on a NORMAL read") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 40)
    val v1 = lastVersion(topic)
    produceRange(topic, 40, 70)
    val v2 = lastVersion(topic)
    topic.deleteWhereVectored(k() % 4 === 0): Unit

    val rows = spark.read.format("graft")
      .option("warehouse", wh).option("topic", "t").load()
      .select(k().as("k"), col("_commit_version"), col("_commit_timestamp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2)))
    // normal read semantics: deletion vectors APPLY (unlike the change feed)
    assert(rows.map(_._1).sorted.toSeq ==
      (0L until 70L).filterNot(_ % 4 == 0))
    assert(rows.forall { case (key, ver, tsNull) =>
      !tsNull && ver == (if (key < 40) v1 else v2)
    }, "per-row commit attribution on a plain scan")
  }

  // Row tracking through a PLAIN stream rides the rowLineage load option:
  // Spark's DSv2 streaming path resolves metadata columns in the plan but
  // never re-prunes the scan with them (the stream's schema is fixed at
  // load), so the commit columns must be SCHEMA columns — the
  // readChangeFeed pattern minus change-type semantics.
  test("rowLineage=true: commit attribution on a PLAIN stream (vectors applied)") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 30)
    val v1 = lastVersion(topic)
    produceRange(topic, 30, 50)
    val v2 = lastVersion(topic)
    topic.deleteWhereVectored(k() % 10 === 0): Unit // plain-read semantics

    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Boolean)]
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "t")
      .option("rowLineage", "true")
      .option("maxEventsPerTrigger", "16")
      .load()
      .select(k().as("k"), col("_commit_version"), col("_commit_timestamp"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        buf ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))): Unit
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rl-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // PLAIN semantics: deletion vectors apply (the change feed would keep them)
    assert(buf.map(_._1).sorted.toSeq == (0L until 50L).filterNot(_ % 10 == 0),
      s"got ${buf.map(_._1).sorted}")
    assert(buf.forall { case (key, ver, tsNull) =>
      !tsNull && ver == (if (key < 30) v1 else v2)
    }, "per-row commit attribution must match the batch row-tracking rule")
  }

  test("row tracking on a stream: use readChangeFeed (commit columns are schema there)") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 30)
    val v1 = lastVersion(topic)
    produceRange(topic, 30, 50)
    val v2 = lastVersion(topic)

    val got = drain(wh, Files.createTempDirectory("graft-lineage-ckpt").toString,
      "maxEventsPerTrigger" -> "16")
    assert(got.map(_._2).sorted.toSeq == (0L until 50L))
    assert(got.forall { case (ct, key, ver) =>
      ct == "insert" && ver == (if (key < 30) v1 else v2)
    })
  }

  test("the frontier holds back for a committed delete whose root is not visible yet") {
    val (d, topic, wh) = newTopic()
    produceRange(topic, 0, 30)
    // simulate the commit→rename window: a delete-noted manifest commit
    // exists but its root was never renamed visible (= a delete in flight,
    // or one that crashed right after its commit)
    d.catalog.updateManifest("t", d.catalog.nextIds("t"),
      note = Some(graft.engine.Catalog.DeleteVectorNote))
    // a real delete AFTER it — blocked behind the rootless commit
    topic.deleteWhereVectored(k() < 5): Unit
    val ckpt = Files.createTempDirectory("graft-holdback-ckpt").toString
    spark.conf.set("spark.graft.stream.cdfDeleteHoldbackMs", "86400000")
    try {
      val first = drain(wh, ckpt)
      assert(first.map(_._2).sorted == (0L until 30L), "inserts flow regardless")
      assert(!first.exists(_._1 == "delete"),
        "the frontier must not pass the rootless commit while it can still be in flight")
      // past the horizon the rootless commit is an aborted delete: the
      // frontier advances and the real delete arrives exactly once
      spark.conf.set("spark.graft.stream.cdfDeleteHoldbackMs", "0")
      val second = drain(wh, ckpt)
      assert(second.filter(_._1 == "delete").map(_._2).sorted == (0L until 5L))
      assert(second.forall(_._1 == "delete"))
    } finally spark.conf.unset("spark.graft.stream.cdfDeleteHoldbackMs")
  }

  test("a torn multi-statement commit holds the frontier until decided; abort releases") {
    val (d, topic, wh) = newTopic()
    produceRange(topic, 0, 30)
    // transaction with a staged delete, crashed between rooting (phase A:
    // gated root + delete-noted commit) and the state flip
    topic.beginTransaction("torn").deleteWhere(k() < 5): Unit
    d.catalog.rootTxnDeletes("t", "torn", d.catalog.listTxns("t")("torn").deletes): Unit
    val ckpt = Files.createTempDirectory("graft-txn-holdback-ckpt").toString
    // holdback horizon ZERO: only the open-gate rule may hold the frontier
    // — an undecided transaction is evidence, not a timer
    spark.conf.set("spark.graft.stream.cdfDeleteHoldbackMs", "0")
    try {
      val first = drain(wh, ckpt)
      assert(first.map(_._2).sorted == (0L until 30L), "inserts flow regardless")
      assert(!first.exists(_._1 == "delete"),
        "the frontier must hold below an OPEN transaction's gated root " +
          "even past the horizon")
      // the decision releases it: commit → preimages arrive exactly once
      d.catalog.commitTxn("t", "torn")
      val second = drain(wh, ckpt)
      assert(second.filter(_._1 == "delete").map(_._2).sorted == (0L until 5L))
      assert(second.forall(_._1 == "delete"))
      val third = drain(wh, ckpt)
      assert(third.isEmpty, "exactly once across drains")
    } finally spark.conf.unset("spark.graft.stream.cdfDeleteHoldbackMs")

    // the ABORT side on a fresh topic: a decided-dead gate must NOT hold
    // the frontier even INSIDE the horizon, and its deletes never arrive
    val d2w = Files.createTempDirectory("graft-scdf2").toString
    val d2 = new GraftDriver(spark, d2w)
    d2.createTopic("t", partitions = 2)
    val topic2 = d2.openTopic("t")
    produceRange(topic2, 0, 20)
    topic2.beginTransaction("dead").deleteWhere(k() < 5): Unit
    d2.catalog.rootTxnDeletes("t", "dead",
      d2.catalog.listTxns("t")("dead").deletes): Unit
    d2.catalog.abortTxn("t", "dead")
    topic2.deleteWhereVectored(k() === 10): Unit // a real delete AFTER it
    spark.conf.set("spark.graft.stream.cdfDeleteHoldbackMs", "86400000")
    try {
      val ckpt2 = Files.createTempDirectory("graft-txn-abort-ckpt").toString
      val got = drain(d2w, ckpt2)
      assert(got.filter(_._1 == "delete").map(_._2) == Seq(10L),
        "the aborted gate must not hold the real delete back, and its " +
          s"own preimages must never arrive: $got")
    } finally spark.conf.unset("spark.graft.stream.cdfDeleteHoldbackMs")
  }

  test("column pruning composes: a change-type-only projection still plans") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 20)
    topic.deleteWhereVectored(k() === 3): Unit
    val counts = readCdf(wh).groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("insert" -> 20L, "delete" -> 1L))
  }
}
