package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Transactional + idempotent produce (Kafka transactions /
 * `enable.idempotence` analogs — see Transactions.scala's crash contract):
 * commit-atomic visibility under read_committed, abort invisibility, retry
 * dedup, sequence-gap and zombie-epoch fencing, and watermark-decided
 * recovery of crash-window intents.
 */
class TransactionsSpec extends SparkSpec {

  private def newTopic(partitions: Int = 2): (GraftDriver, TopicHandle) = {
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-txn-spec").toString)
    d.createTopic("t", partitions = partitions)
    (d, d.openTopic("t"))
  }

  private def batch(tag: String, n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (s"""{"tag":"$tag","i":$i}""", i % 2))
      .toDF("metadata", "partition")
  }

  private def tags(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy(get_json_object(col("metadata"), "$.tag").as("tag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("commit makes a transaction visible atomically; abort never does") {
    val (_, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))

    val ta = topic.beginTransaction("ta")
    ta.produce(batch("a1", 6))
    ta.produce(batch("a2", 4)) // multi-produce transaction
    val tb = topic.beginTransaction("tb")
    tb.produce(batch("b", 8))

    // before commit: committed view sees only the plain rows; uncommitted sees all
    assert(tags(topic.events("read_committed")) == Map("plain" -> 10L))
    assert(tags(topic.events("read_uncommitted")) ==
      Map("plain" -> 10L, "a1" -> 6L, "a2" -> 4L, "b" -> 8L))

    ta.commit()
    tb.abort()
    assert(tags(topic.events("read_committed")) ==
      Map("plain" -> 10L, "a1" -> 6L, "a2" -> 4L))
    // aborted events still exist in the log (read_uncommitted), like Kafka
    assert(tags(topic.events("read_uncommitted")).contains("b"))

    // terminal transitions are refused
    intercept[IllegalStateException](ta.commit())
    intercept[IllegalStateException](tb.commit())
    // terminal ids are not reusable
    intercept[IllegalStateException](topic.beginTransaction("ta"))
    // produce under a terminal transaction is refused
    intercept[IllegalStateException](ta.produce(batch("late", 2)))
  }

  test("purgeAborted physically reclaims aborted events, committed view unchanged") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))
    val ta = topic.beginTransaction("ta"); ta.produce(batch("a", 6)); ta.commit()
    val tb = topic.beginTransaction("tb"); tb.produce(batch("b", 8)); tb.abort()

    val before = tags(topic.events("read_committed"))
    assert(topic.purgeAborted() == 1)
    assert(tags(topic.events("read_committed")) == before)
    // physically gone: even the raw log no longer has the aborted rows
    assert(!tags(topic.events("read_uncommitted")).contains("b"))
    // the aborted record itself is cleaned; committed record remains
    assert(!d.catalog.listTxns("t").contains("tb"))
    assert(d.catalog.listTxns("t")("ta").state == "committed")
    // idempotent second call: nothing to do
    assert(topic.purgeAborted() == 0)
  }

  test("crashed transactional produce: phantom intent is truncated, never committed") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))
    d.catalog.beginTxn("t", "tx")
    // simulate a produce that died AFTER writing its intent but BEFORE its
    // id commit: the recorded range sits entirely at/above the watermark
    val wm = d.catalog.nextIds("t")
    d.catalog.appendTxnRanges("t", "tx", Map(0 -> (wm(0), 3L), 1 -> (wm(1), 2L)))
    // any later produce reconciles first — the phantom ids are re-issued
    topic.producer().produce(batch("later", 10))
    assert(d.catalog.listTxns("t")("tx").ranges.isEmpty)
    // the re-issued ids belong to 'later', not to the dead transaction
    d.catalog.commitTxn("t", "tx")
    assert(tags(topic.events("read_committed")) ==
      Map("plain" -> 10L, "later" -> 10L))
  }

  test("idempotent producer: retry dedups, gap and zombie epoch fail loudly") {
    val (_, topic) = newTopic()
    val p = topic.idempotentProducer("app1", epoch = 1L)
    val r0 = p.produce(batch("s0", 10), sequence = 0L)
    // retry of the SAME sequence: no duplicate rows, original ranges returned
    val r0retry = p.produce(batch("s0", 10), sequence = 0L)
    assert(r0retry == r0)
    assert(tags(topic.events()) == Map("s0" -> 10L))
    p.produce(batch("s1", 6), sequence = 1L)
    assert(tags(topic.events()) == Map("s0" -> 10L, "s1" -> 6L))
    // sequence gap
    intercept[IllegalStateException](p.produce(batch("s5", 2), sequence = 5L))
    // stale duplicate (older than last committed)
    intercept[IllegalStateException](p.produce(batch("s0", 2), sequence = 0L))
    // zombie fencing: an older epoch is rejected outright
    val newer = topic.idempotentProducer("app1", epoch = 2L)
    newer.produce(batch("e2", 4), sequence = 0L) // epoch bump resets sequences
    intercept[IllegalStateException](p.produce(batch("z", 2), sequence = 2L))
    assert(tags(topic.events()) == Map("s0" -> 10L, "s1" -> 6L, "e2" -> 4L))
  }

  test("idempotent crash windows: pending promotes iff the watermark covers it") {
    val (d, topic) = newTopic()
    val p = topic.idempotentProducer("app", epoch = 0L)
    p.produce(batch("s0", 10), sequence = 0L)

    // (a) died BEFORE the id commit: pending ranges reach past the watermark
    val wm = d.catalog.nextIds("t")
    d.catalog.writeProducerState("t", "app",
      d.catalog.producerState("t", "app").get.copy(
        pending = Some(1L -> Vector(TxnRange(0, wm(0), 4L)))))
    d.catalog.reconcileProduceState("t")
    val st1 = d.catalog.producerState("t", "app").get
    assert(st1.pending.isEmpty && st1.committedSeq == 0L) // discarded, seq 1 still open
    p.produce(batch("s1", 6), sequence = 1L)              // the retry lands

    // (b) died AFTER the id commit (watermark covers the pending ranges):
    // rebuild that state by hand — pending seq 2 pointing at s1's real span
    val committed = d.catalog.producerState("t", "app").get
    d.catalog.writeProducerState("t", "app", committed.copy(
      committedSeq = 1L,
      pending = Some(2L -> committed.committedRanges)))
    d.catalog.reconcileProduceState("t")
    val st2 = d.catalog.producerState("t", "app").get
    assert(st2.pending.isEmpty && st2.committedSeq == 2L) // promoted
    assert(tags(topic.events()) == Map("s0" -> 10L, "s1" -> 6L))
  }

  // -- multi-statement transactions (produce + delete, one visibility point)

  private def tag = get_json_object(col("metadata"), "$.tag")
  private def idx = get_json_object(col("metadata"), "$.i").cast("long")

  test("multi-statement txn: produces and deletes flip visible at ONE commit") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))
    val vStart = topic.history().select(max(col("version"))).head().getLong(0)

    val tx = topic.beginTransaction("up")
    tx.produce(batch("fix", 4))
    assert(tx.deleteWhere(tag === "plain" && idx < 4) == 4L)

    // BEFORE commit: neither side visible — committed view keeps every
    // plain row (deletes staged, not applied) and no produced row;
    // read_uncommitted shows the produced rows but still no deletes
    assert(tags(topic.events("read_committed")) == Map("plain" -> 10L))
    assert(tags(topic.events("read_uncommitted")) ==
      Map("plain" -> 10L, "fix" -> 4L))
    assert(d.catalog.deleteVectorFiles("t").isEmpty)

    tx.commit()
    // AFTER commit: both sides, together
    assert(tags(topic.events("read_committed")) ==
      Map("plain" -> 6L, "fix" -> 4L))
    assert(tags(topic.events("read_uncommitted")) ==
      Map("plain" -> 6L, "fix" -> 4L))
    // exact accounting: one visible root, 4 vectored rows
    assert(d.catalog.deleteVectorFiles("t").size == 1)
    assert(d.catalog.deletedCountsByPartition("t").values.sum == 4L)
    // the change feed surfaces the transaction's deletes as preimages
    val vEnd = topic.history().select(max(col("version"))).head().getLong(0)
    val byType = topic.changes(vStart, vEnd)
      .groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("delete", 0L) == 4L)
    assert(byType.getOrElse("insert", 0L) == 4L)
  }

  test("in-txn delete sees own produced rows; statements stay disjoint") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("keep", 5))
    val tx = topic.beginTransaction("own")
    tx.produce(batch("a", 6))
    // the upsert shape: a transaction can delete rows it just produced
    assert(tx.deleteWhere(tag === "a" && idx < 2) == 2L)
    // overlapping second statement: already-staged ids never re-match
    // (roots stay disjoint → deletedCountsByPartition stays exact)
    assert(tx.deleteWhere(tag === "a") == 4L)
    // zero-match statements stage nothing
    assert(tx.deleteWhere(tag === "nope") == 0L)
    tx.commit()
    assert(tags(topic.events("read_committed")) == Map("keep" -> 5L))
    assert(d.catalog.deletedCountsByPartition("t").values.sum == 6L)
  }

  test("abort discards staged deletes — no debris, views unchanged") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))
    val tx = topic.beginTransaction("nope")
    tx.produce(batch("x", 3))
    assert(tx.deleteWhere(tag === "plain") == 10L)
    tx.abort()
    assert(tags(topic.events("read_committed")) == Map("plain" -> 10L))
    assert(d.catalog.deleteVectorFiles("t").isEmpty)
    // the staging directory itself is reclaimed by the abort
    val delDir = new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("t"), "_deletes")
    val fs = delDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers =
      if (!fs.exists(delDir)) Seq.empty
      else fs.listStatus(delDir).map(_.getPath.getName).toSeq
    assert(leftovers.forall(n => !n.startsWith("txn-")),
      s"aborted staging must be reclaimed, found: $leftovers")
  }

  test("foreign row removal between statement and commit refuses the commit") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))
    val tx = topic.beginTransaction("slow")
    assert(tx.deleteWhere(tag === "plain" && idx < 3) == 3L)
    // a foreign vector delete lands after the statement's snapshot
    assert(topic.deleteWhereVectored(tag === "plain" && idx >= 8) == 2L)
    val e = intercept[IllegalStateException](tx.commit())
    assert(e.getMessage.contains("concurrent modification"))
    // the refusal left the transaction open and NOTHING of it visible
    assert(d.catalog.listTxns("t")("slow").state == "open")
    assert(tags(topic.events("read_committed")) == Map("plain" -> 8L))
    tx.abort() // the documented remedy: abort and re-run
    assert(tags(topic.events("read_committed")) == Map("plain" -> 8L))
  }

  test("TxnState JSON: deletes/offsets round-trip; legacy states parse with none") {
    val st = TxnState("open", Vector(TxnRange(0, 5L, 3L)),
      Vector(TxnDelete("/x/txn-abc", "abc", 7L, 4L)),
      Vector(TxnOffsets("src", "g", Map(0 -> 9L, 1 -> 4L))))
    assert(TxnState.fromJson(st.toJson) == st)
    // a state file written before multi-statement transactions existed
    val legacy = """{"state":"open","ranges":[]}"""
    assert(TxnState.fromJson(legacy) == TxnState("open", Vector.empty))
    val remote = RemoteTxn("coord", "tx1", Vector(TxnRange(1, 7L, 2L)))
    assert(RemoteTxn.fromJson(remote.toJson) == remote)
  }

  test("produceTo: one commit publishes rows across topics") {
    val (d, topic) = newTopic() // topic "t" = the coordinator
    d.createTopic("other", partitions = 2)
    val other = d.openTopic("other")
    topic.producer().produce(batch("base", 4))
    other.producer().produce(batch("obase", 4))
    val tx = topic.beginTransaction("span")
    tx.produce(batch("local", 6))
    tx.produceTo("other", batch("remote", 8))
    tx.produceTo("other", batch("remote2", 2)) // merges into one record
    // BEFORE: both topics' committed views unchanged; the rows are in
    // the foreign log (read_uncommitted) exactly like local txn rows
    assert(tags(topic.events("read_committed")) == Map("base" -> 4L))
    assert(tags(other.events("read_committed")) == Map("obase" -> 4L))
    assert(tags(other.events("read_uncommitted")) ==
      Map("obase" -> 4L, "remote" -> 8L, "remote2" -> 2L))
    tx.commit() // ONE flip on the coordinator publishes everywhere
    assert(tags(topic.events("read_committed")) ==
      Map("base" -> 4L, "local" -> 6L))
    assert(tags(other.events("read_committed")) ==
      Map("obase" -> 4L, "remote" -> 8L, "remote2" -> 2L))
    // unknown target refuses at statement time
    val tx2 = topic.beginTransaction("bad2")
    intercept[IllegalArgumentException](tx2.produceTo("nope", batch("x", 1)))
  }

  test("produceTo: abort hides rows everywhere; purgeAborted reclaims per topic") {
    val (d, topic) = newTopic()
    d.createTopic("other", partitions = 2)
    val other = d.openTopic("other")
    other.producer().produce(batch("keep", 4))
    val tx = topic.beginTransaction("gone")
    tx.produce(batch("l", 2))
    tx.produceTo("other", batch("r", 6))
    tx.abort()
    assert(tags(other.events("read_committed")) == Map("keep" -> 4L))
    // each participating topic reclaims its own share
    assert(other.purgeAborted() == 1)
    assert(tags(other.events("read_uncommitted")) == Map("keep" -> 4L))
    assert(topic.purgeAborted() == 1)
    assert(tags(topic.events("read_uncommitted")) == Map.empty)
    // idempotent: nothing left on either side
    assert(other.purgeAborted() == 0 && topic.purgeAborted() == 0)
  }

  test("transaction timeout: write-path entry auto-aborts an aged OPEN txn; heartbeat extends") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))
    topic.beginTransaction("hung").produce(batch("hung", 6)): Unit
    val live = topic.beginTransaction("live")
    live.produce(batch("live", 4))
    spark.conf.set("spark.graft.txn.timeoutMs", "60000")
    try {
      def backdate(id: String, ageMs: Long = 120000L): Unit = {
        val f = new java.io.File(new org.apache.hadoop.fs.Path(
          d.catalog.topicPath("t"), s"_txns/$id.json").toUri.getPath)
        assert(f.setLastModified(System.currentTimeMillis() - ageMs))
      }
      backdate("hung"); backdate("live", 30000L) // live: idle, under horizon
      live.heartbeat() // lease extended: mtime fresh again
      // ANY write-path entry reconciles — a plain produce is enough
      topic.producer().produce(batch("more", 2))
      assert(d.catalog.listTxns("t")("hung").state == "aborted")
      assert(d.catalog.listTxns("t")("live").state == "open")
      // the auto-abort is the standard one: commit refuses, rows excluded
      intercept[IllegalStateException](topic.transaction("hung").commit())
      live.commit()
      assert(tags(topic.events("read_committed")) ==
        Map("plain" -> 10L, "more" -> 2L, "live" -> 4L))
      // heartbeat on a decided transaction refuses
      intercept[IllegalStateException](live.heartbeat())
    } finally spark.conf.unset("spark.graft.txn.timeoutMs")
  }

  test("lease judge is skew-immune: local clock ahead of the store never falsely expires") {
    // Simulated deployment: the janitor's LOCAL clock runs 10 minutes
    // ahead of the store's (object-store/NFS skew). A live transaction's
    // state mtime — stamped by the store — then looks 10 minutes old to
    // a local-clock judge, far past the 60s horizon. The expiry judgment
    // compares the mtime against a just-written probe file's mtime (the
    // SAME store clock), so the live transaction survives; only the
    // cheap candidate pre-filter sees the skewed local clock.
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 4))
    val live = topic.beginTransaction("live")
    live.produce(batch("live", 4))
    spark.conf.set("spark.graft.txn.timeoutMs", "60000")
    spark.conf.set("spark.graft.txn.testLocalSkewMs", "600000")
    try {
      live.heartbeat() // freshly stamped by the store's clock
      d.catalog.maintainTopic("t"): Unit // janitor pass under skew
      assert(d.catalog.listTxns("t")("live").state == "open",
        "a heartbeating transaction must survive local-ahead clock skew")
      // the skewed local clock also must not shorten the DEBRIS retention
      // grace window: a just-aborted record is not "aged" under skew
      val ab = topic.beginTransaction("ab")
      ab.produce(batch("ab", 2)); ab.abort()
      val (aged, _) = d.catalog.agedDeadTxnRecords("t", 60000L)
      assert(aged.isEmpty, "young aborted debris must not age under skew")
      // a GENUINELY idle transaction (store-stamped mtime far in the
      // past) still expires under the same skew — liveness holds
      val f = new java.io.File(new org.apache.hadoop.fs.Path(
        d.catalog.topicPath("t"), "_txns/live.json").toUri.getPath)
      assert(f.setLastModified(System.currentTimeMillis() - 120000L))
      d.catalog.maintainTopic("t"): Unit
      assert(d.catalog.listTxns("t")("live").state == "aborted")
    } finally {
      spark.conf.unset("spark.graft.txn.timeoutMs")
      spark.conf.unset("spark.graft.txn.testLocalSkewMs")
    }
  }

  test("lease judge: forward-dated mtime (store clock ahead) never expires") {
    // The other skew direction: the store's clock is ahead of local, so
    // a live transaction's mtime sits in the local FUTURE. The local
    // pre-filter sees a negative age and never even probes — no expiry.
    val (d, topic) = newTopic()
    val live = topic.beginTransaction("live")
    live.produce(batch("live", 4))
    spark.conf.set("spark.graft.txn.timeoutMs", "60000")
    try {
      val f = new java.io.File(new org.apache.hadoop.fs.Path(
        d.catalog.topicPath("t"), "_txns/live.json").toUri.getPath)
      assert(f.setLastModified(System.currentTimeMillis() + 600000L))
      d.catalog.maintainTopic("t"): Unit
      assert(d.catalog.listTxns("t")("live").state == "open")
      live.commit() // and the transaction is still fully usable
      assert(tags(topic.events("read_committed")) == Map("live" -> 4L))
    } finally spark.conf.unset("spark.graft.txn.timeoutMs")
  }

  test("produceTo extends a fresh coordinator lease; an expired one fences uniformly") {
    val (d, topic) = newTopic()
    d.createTopic("other", partitions = 2)
    spark.conf.set("spark.graft.txn.timeoutMs", "60000")
    try {
      def backdate(id: String, ageMs: Long = 120000L): Unit = {
        val f = new java.io.File(new org.apache.hadoop.fs.Path(
          d.catalog.topicPath("t"), s"_txns/$id.json").toUri.getPath)
        assert(f.setLastModified(System.currentTimeMillis() - ageMs))
      }
      // a produceTo-only transaction outlives many sub-horizon idles:
      // every statement touches the coordinator lease (produceTo writes
      // nothing else on the coordinator)
      val tx = topic.beginTransaction("span")
      backdate("span", 30000L)
      tx.produceTo("other", batch("r", 4)) // extends
      backdate("span", 30000L)
      tx.commit() // commit's reconcile: 30s idle < 60s horizon
      assert(tags(d.openTopic("other").events("read_committed")) == Map("r" -> 4L))
      // an EXPIRED lease fences uniformly — produceTo, heartbeat, commit
      // all behave like the write-path detection they raced
      val tx2 = topic.beginTransaction("span2")
      tx2.produceTo("other", batch("r2", 2))
      backdate("span2")
      intercept[IllegalStateException](tx2.produceTo("other", batch("r3", 2)))
      assert(d.catalog.listTxns("t")("span2").state == "aborted")
      intercept[IllegalStateException](tx2.commit())
      val tx3 = topic.beginTransaction("span3")
      backdate("span3")
      intercept[IllegalStateException](tx3.heartbeat())
      assert(d.catalog.listTxns("t")("span3").state == "aborted")
      // no expired transaction's foreign rows ever became visible
      assert(tags(d.openTopic("other").events("read_committed")) == Map("r" -> 4L))
    } finally spark.conf.unset("spark.graft.txn.timeoutMs")
  }

  test("maintain-path expiry truncates a phantom tail before deciding it dead") {
    // A transactional produce that crashed mid-data-write leaves a range
    // intent at/above the watermark. If the CRON surface expired the
    // transaction without the reconcile's truncation pass, those
    // never-issued ids would freeze as decided-dead and a later produce
    // re-issuing them would have its committed rows excluded forever
    // (and eventually purged) — maintainTopic must run the full
    // reconcile, truncation before expiry.
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 6))
    d.catalog.beginTxn("t", "ph")
    val wm = d.catalog.nextIds("t")
    d.catalog.appendTxnRanges("t", "ph", Map(0 -> (wm(0), 3L), 1 -> (wm(1), 2L)))
    spark.conf.set("spark.graft.txn.timeoutMs", "60000")
    try {
      val f = new java.io.File(new org.apache.hadoop.fs.Path(
        d.catalog.topicPath("t"), "_txns/ph.json").toUri.getPath)
      assert(f.setLastModified(System.currentTimeMillis() - 120000L))
      d.catalog.maintainTopic("t"): Unit // cron pass 1: truncation
      val mid = d.catalog.listTxns("t")("ph")
      // the truncation rewrite grants a one-time grace (fresh lease) —
      // the phantom tail is gone BEFORE any pass can decide it dead
      assert(mid.state == "open" && mid.ranges.isEmpty,
        s"truncation must precede expiry: $mid")
      assert(f.setLastModified(System.currentTimeMillis() - 120000L))
      d.catalog.maintainTopic("t"): Unit // cron pass 2: expiry
      val st = d.catalog.listTxns("t")("ph")
      assert(st.state == "aborted")
      assert(st.ranges.isEmpty, s"phantom tail must truncate before the abort: ${st.ranges}")
      // the re-issued ids belong to the new produce, fully visible
      topic.producer().produce(batch("later", 6))
      assert(tags(topic.events("read_committed")) ==
        Map("plain" -> 6L, "later" -> 6L))
      // and the janitor's purge reclaims NOTHING it shouldn't
      spark.conf.set("spark.graft.txn.abortedRetainMs", "0")
      spark.conf.set("spark.graft.txn.maxAbortedRecords", "0")
      d.catalog.maintainTopic("t"): Unit
      assert(tags(topic.events("read_uncommitted")) ==
        Map("plain" -> 6L, "later" -> 6L))
    } finally {
      spark.conf.unset("spark.graft.txn.timeoutMs")
      spark.conf.unset("spark.graft.txn.abortedRetainMs")
      spark.conf.unset("spark.graft.txn.maxAbortedRecords")
    }
  }

  test("maintainTopic purges AGED aborted debris past the record threshold") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 6))
    (0 until 6).foreach { i =>
      val t = topic.beginTransaction(s"ab$i"); t.produce(batch(s"a$i", 2)); t.abort()
    }
    assert(d.catalog.uncommittedTxnRanges("t").nonEmpty)
    // young debris survives a maintain pass (the retention horizon: an
    // in-flight reader may have planned against the records)
    d.catalog.maintainTopic("t"): Unit
    assert(d.catalog.listTxns("t").count(_._2.state == "aborted") == 6)
    spark.conf.set("spark.graft.txn.abortedRetainMs", "0")
    try {
      // aged past the horizon AND over the record threshold (6 > 4):
      // rows physically reclaimed, records removed, exclusion set empty
      // — bounded by construction, no user discipline required
      d.catalog.maintainTopic("t"): Unit
      assert(d.catalog.listTxns("t").count(_._2.state == "aborted") == 0)
      assert(d.catalog.uncommittedTxnRanges("t").isEmpty)
      assert(tags(topic.events("read_uncommitted")) == Map("plain" -> 6L))
      // under the threshold, aged debris is left for purgeAborted/more
      // accumulation — maintain stays a cheap no-op
      (0 until 3).foreach { i =>
        val t = topic.beginTransaction(s"few$i"); t.produce(batch(s"f$i", 2)); t.abort()
      }
      d.catalog.maintainTopic("t"): Unit
      assert(d.catalog.listTxns("t").count(_._2.state == "aborted") == 3)
    } finally spark.conf.unset("spark.graft.txn.abortedRetainMs")
  }

  test("commit retry roots statements adopted after a crashed rooting pass") {
    // A commit that crashed between rooting and flip leaves gated roots;
    // a deleteWhere can still adopt NEW stagings before the retry. The
    // retry's verify-flip loop must root the extras too — flipping with
    // an unrooted staged delete would return a count whose deletion
    // silently never happens.
    val (d, topic) = newTopic()
    topic.producer().produce(batch("a", 6))
    topic.producer().produce(batch("b", 6))
    val tx = topic.beginTransaction("up")
    assert(tx.deleteWhere(get_json_object(col("metadata"), "$.tag") === "a") == 6L)
    // simulate the crash: root the CURRENT staged set, no flip
    d.catalog.rootTxnDeletes("t", "up", d.catalog.txnState("t", "up").get.deletes): Unit
    // a second statement lands before the commit retry
    assert(tx.deleteWhere(get_json_object(col("metadata"), "$.tag") === "b") == 6L)
    tx.commit() // re-roots the prefix (lookup), roots the extra, flips
    assert(tags(topic.events("read_committed")).isEmpty)
  }

  test("dropping a coordinator topic: open share refuses, committed share folds") {
    val (d, topic) = newTopic()
    d.createTopic("other", partitions = 2)
    val other = d.openTopic("other")
    val tx = topic.beginTransaction("span")
    tx.produceTo("other", batch("r", 4))
    // a live cross-topic transaction pins its coordinator topic
    val e = intercept[IllegalStateException](d.dropTopic("t"))
    assert(e.getMessage.contains("span"))
    tx.commit()
    // a committed share folds eagerly at drop — the rows stay visible
    // (a missing coordinator record must only ever mean "aborted")
    d.dropTopic("t")
    assert(d.catalog.listRemoteTxns("other").isEmpty) // folded BY the drop
    assert(tags(other.events("read_committed")) == Map("r" -> 4L))
    // committed records elsewhere are permanent: removeTxn refuses them
    val ok = other.beginTransaction("ok"); ok.produce(batch("k", 2)); ok.commit()
    intercept[IllegalArgumentException](d.catalog.removeTxn("other", "ok"))
  }

  test("transactions() admin listing reports state, recorded work, lease age") {
    val (_, topic) = newTopic()
    val tx = topic.beginTransaction("a")
    tx.produce(batch("x", 4)) // spans both partitions → 2 ranges
    val rows = topic.transactions().collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getString(0) == "a" && r.getString(1) == "open")
    assert(r.getLong(2) == 4L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    assert(r.getLong(6) >= 0L && r.getLong(6) < 60000L) // fresh lease
    tx.commit()
    assert(topic.transactions().collect()(0).getString(1) == "committed")
  }

  test("remoteShares() surfaces cross-topic wedges with resolved coordinator state") {
    val (d, topic) = newTopic()
    d.createTopic("other", partitions = 2)
    val other = d.openTopic("other")
    val tx = topic.beginTransaction("span")
    tx.produceTo("other", batch("r", 4))
    // the foreign topic's own transactions() is empty — the wedge shows
    // in remoteShares, pointing at the coordinator to decide
    assert(other.transactions().collect().isEmpty)
    val open = other.remoteShares().collect()
    assert(open.length == 1)
    assert(open(0).getString(0) == "t" && open(0).getString(1) == "span")
    assert(open(0).getString(2) == "open" && open(0).getLong(3) == 4L)
    tx.commit()
    // committed shares resolve (and fold away on the next committed read)
    assert(other.remoteShares().collect()(0).getString(2) == "committed")
  }

  test("dropTopic resolves a committed transaction's pending cursor floors") {
    // A commit that crashed between the state flip and the eager floor
    // apply leaves the sendOffsets pointer pending on the source topic.
    // Dropping the coordinator then would make the pointer resolve to
    // "missing ⇒ aborted" and DISCARD committed floors — the drop must
    // apply them first.
    val (d, topic) = newTopic()
    d.createTopic("s", partitions = 2)
    d.openTopic("s").producer().produce(batch("in", 10))
    val tx = topic.beginTransaction("x")
    tx.produce(batch("out", 2))
    tx.sendOffsets("s", "g", Map(0 -> 3L, 1 -> 4L))
    // simulate the crash: flip the state file to committed directly,
    // leaving the pointer unapplied (trailer-less writes still parse)
    val f = new java.io.File(new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("t"), "_txns/x.json").toUri.getPath)
    val raw = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val flipped = raw.split("\n#graft-eof:")(0)
      .replace("\"state\":\"open\"", "\"state\":\"committed\"")
    assert(flipped.contains("\"state\":\"committed\""))
    java.nio.file.Files.write(f.toPath, flipped.getBytes("UTF-8")): Unit
    // drop the local-fs checksum sidecar the raw write invalidated
    new java.io.File(f.getParentFile, ".x.json.crc").delete(): Unit
    // NO cursor read in between (it would lazily heal the pointer and
    // mask the drop path): the drop itself must apply the floors
    d.dropTopic("t")
    // the floors survived the coordinator's disappearance
    assert(d.catalog.cursor("s", "g") == Map(0 -> 4L, 1 -> 5L))
  }

  test("dropTopic REFUSES when committed floors cannot be applied") {
    // Same scenario as above, but the source topic's cursor store is
    // broken (the cursor path is occupied by a non-empty directory, so
    // the floor apply's atomic write fails). Proceeding best-effort
    // would delete the coordinator tree — the only durable copy of the
    // committed floors — and the surviving pointer would resolve
    // "missing ⇒ aborted", re-delivering already-processed rows. The
    // drop must refuse loudly instead, like the open-share guard.
    val (d, topic) = newTopic()
    d.createTopic("s", partitions = 2)
    d.openTopic("s").producer().produce(batch("in", 10))
    val tx = topic.beginTransaction("x")
    tx.produce(batch("out", 2))
    tx.sendOffsets("s", "g", Map(0 -> 3L, 1 -> 4L))
    val f = new java.io.File(new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("t"), "_txns/x.json").toUri.getPath)
    val raw = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val flipped = raw.split("\n#graft-eof:")(0)
      .replace("\"state\":\"open\"", "\"state\":\"committed\"")
    java.nio.file.Files.write(f.toPath, flipped.getBytes("UTF-8")): Unit
    new java.io.File(f.getParentFile, ".x.json.crc").delete(): Unit
    // break the source topic's cursor store: a non-empty DIRECTORY at the
    // cursor path makes writeAtomic's replace fail (non-recursive delete)
    val cursor = new java.io.File(new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("s"), "_cursors/g.json").toUri.getPath)
    assert(cursor.mkdirs())
    java.nio.file.Files.write(new java.io.File(cursor, "block").toPath,
      "x".getBytes("UTF-8")): Unit
    val e = intercept[IllegalStateException](d.dropTopic("t"))
    assert(e.getMessage.contains("could not be applied"))
    // nothing was deleted: the coordinator tree and its committed record
    // survive, so the floors stay resolvable
    assert(d.topicExists("t"))
    assert(d.catalog.txnState("t", "x").exists(_.state == "committed"))
    // heal the cursor store: the retried drop applies the floors and goes
    java.nio.file.Files.delete(new java.io.File(cursor, "block").toPath)
    java.nio.file.Files.delete(cursor.toPath)
    d.dropTopic("t")
    assert(d.catalog.cursor("s", "g") == Map(0 -> 4L, 1 -> 5L))
  }

  test("in-txn delete never matches another coordinator's OPEN remote rows") {
    // A deleteWhere on the TARGET topic must not see rows produced into it
    // by another topic's still-open cross-topic transaction: staging them
    // would surface the rows already-vectored when that coordinator later
    // commits — silent row loss with no conflict check to catch it.
    val (d, topic) = newTopic() // "t" = the foreign coordinator
    d.createTopic("other", partitions = 2)
    val other = d.openTopic("other")
    other.producer().produce(batch("keep", 4))
    val span = topic.beginTransaction("span")
    span.produceTo("other", batch("r", 6)) // open remote share on "other"
    val del = other.beginTransaction("del")
    // match EVERYTHING visible: must be the 4 committed rows only
    assert(del.deleteWhere(lit(true)) == 4L)
    span.commit() // publishes the 6 remote rows
    del.commit()  // deletes exactly the 4 it matched
    assert(tags(other.events("read_committed")) == Map("r" -> 6L))
  }

  test("produceTo crash window: phantom remote ranges truncate before id reuse") {
    val (d, topic) = newTopic()
    d.createTopic("other", partitions = 2)
    val other = d.openTopic("other")
    topic.beginTransaction("ph"): Unit // open coordinator, produce "died"
    // simulate the crash: a remote record claiming ranges at/above the
    // target's watermark (the pre-commit intent landed, the id commit
    // never did)
    val wm0 = d.catalog.nextIds("other").getOrElse(0, 0L)
    val dir = new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("other"), "_txns_remote")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val o = fs.create(new org.apache.hadoop.fs.Path(dir, "ph.json"))
    o.write(RemoteTxn("t", "ph", Vector(TxnRange(0, wm0, 3L))).toJson.getBytes)
    o.close()
    // a later plain produce reconciles first — the phantom truncates, so
    // the reissued ids are NOT hidden behind the open transaction
    other.producer().produce(batch("later", 6))
    assert(tags(other.events("read_committed")) == Map("later" -> 6L))
  }

  test("sendOffsets: cursor advances atomically with the commit") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("in", 10)) // the source rows, topic 't'
    d.createTopic("out", partitions = 2)
    val out = d.openTopic("out")
    val tx = out.beginTransaction("loop1")
    tx.produce(batch("result", 4))
    tx.sendOffsets("t", "g", Map(0 -> 4L, 1 -> 4L)) // last processed per partition
    // BEFORE commit: cursor unmoved, produced rows invisible
    assert(d.catalog.cursor("t", "g") == Map.empty)
    assert(tags(out.events("read_committed")) == Map.empty)
    tx.commit()
    // ONE visibility point: outputs appear AND the cursor is past the inputs
    assert(d.catalog.cursor("t", "g") == Map(0 -> 5L, 1 -> 5L))
    assert(tags(out.events("read_committed")) == Map("result" -> 4L))
    // floors only advance: a second loop's lower floor never regresses
    val tx2 = out.beginTransaction("loop2")
    tx2.sendOffsets("t", "g", Map(0 -> 2L))
    tx2.commit()
    assert(d.catalog.cursor("t", "g") == Map(0 -> 5L, 1 -> 5L))
    // unknown source topic refuses at statement time
    val tx3 = out.beginTransaction("loop3")
    intercept[IllegalArgumentException](tx3.sendOffsets("nope", "g", Map(0 -> 1L)))
  }

  test("sendOffsets: abort discards; a crashed commit's floors resolve lazily") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("in", 10))
    d.createTopic("out", partitions = 2)
    val out = d.openTopic("out")
    // abort: floors never apply
    val bad = out.beginTransaction("bad")
    bad.sendOffsets("t", "g", Map(0 -> 3L))
    bad.abort()
    assert(d.catalog.cursor("t", "g") == Map.empty)
    // crashed commit: the state flipped but the eager apply never ran —
    // the next cursor READ resolves the committed floors and folds them
    // (including ANOTHER consumer's floors under the same breadcrumb:
    // removing it after folding only the caller's would strand them)
    val ok = out.beginTransaction("ok")
    ok.sendOffsets("t", "g", Map(0 -> 4L, 1 -> 2L))
    ok.sendOffsets("t", "h", Map(0 -> 7L))
    val st = d.catalog.listTxns("out")("ok")
    val p = new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("out"), "_txns/ok.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(p, true)
    o.write(st.copy(state = "committed").toJson.getBytes); o.close()
    assert(d.catalog.cursor("t", "g") == Map(0 -> 5L, 1 -> 3L))
    // folded into the cursor file; the pointer breadcrumb is gone
    val pend = new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("t"), "_cursors/_txnpend")
    assert(!fs.exists(pend) || fs.listStatus(pend).isEmpty)
    assert(d.catalog.cursor("t", "g") == Map(0 -> 5L, 1 -> 3L))
    // the OTHER consumer's floors folded too (g's read was its heal)
    assert(d.catalog.cursor("t", "h") == Map(0 -> 8L))
  }

  test("vacuum keeps an open txn's adopted staging however old; reaps debris") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))
    val tx = topic.beginTransaction("live")
    assert(tx.deleteWhere(tag === "plain" && idx < 3) == 3L)
    val staged = new org.apache.hadoop.fs.Path(
      d.catalog.listTxns("t")("live").deletes.head.staged)
    val fs = staged.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // age the ADOPTED staging far past the staleness horizon — liveness
    // comes from the open transaction's adoption, never from mtime
    fs.setTimes(staged, 1000L, 1000L)
    // plant debris: an aged staging naming the same open txn that the
    // state never adopted (= a statement that crashed mid-stage)
    val orphan = new org.apache.hadoop.fs.Path(staged.getParent, "txn-orphan000000")
    fs.mkdirs(orphan)
    val out = fs.create(new org.apache.hadoop.fs.Path(orphan, "_txn"))
    out.write("live".getBytes); out.close()
    fs.setTimes(orphan, 1000L, 1000L)
    topic.vacuum(): Unit
    assert(fs.exists(staged), "adopted staging of an OPEN txn is live data")
    assert(!fs.exists(orphan), "aged unadopted staging is debris")
    tx.commit() // still commits cleanly after the vacuum
    assert(tags(topic.events("read_committed")) == Map("plain" -> 7L))
  }

  test("vacuum reaps a dead-gated root left by a crashed abort") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))
    val tx = topic.beginTransaction("crashed")
    assert(tx.deleteWhere(tag === "plain") == 10L)
    val st = d.catalog.listTxns("t")("crashed")
    val rooted = d.catalog.rootTxnDeletes("t", "crashed", st.deletes)
    // crash-simulate an abort that died before its eager reap: flip the
    // state file directly (the public abortTxn reaps)
    val txnPath = new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("t"), "_txns/crashed.json")
    val fs = txnPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = fs.create(txnPath, true)
    o.write(st.copy(state = "aborted").toJson.getBytes); o.close()
    assert(d.catalog.deleteVectorFiles("t").isEmpty) // gate fails closed
    // FRESH dead-gated roots survive vacuum: they are the CDF frontier's
    // decided-dead evidence (see abortTxn); only aged ones are debris
    topic.vacuum(): Unit
    val root = new org.apache.hadoop.fs.Path(rooted.head)
    assert(fs.exists(root), "fresh dead-gated root is frontier evidence")
    fs.setTimes(root, 1000L, 1000L)
    topic.vacuum(): Unit
    assert(!fs.exists(root), "an AGED root gated by an aborted txn is debris")
    assert(tags(topic.events("read_committed")) == Map("plain" -> 10L))
  }

  test("crash between rooting and flip: gated roots invisible, commit retry resumes") {
    val (d, topic) = newTopic()
    topic.producer().produce(batch("plain", 10))
    val tx = topic.beginTransaction("torn")
    assert(tx.deleteWhere(tag === "plain" && idx < 5) == 5L)
    // simulate the crash window: phase A ran (roots promoted, GATED),
    // the state flip never happened
    val st = d.catalog.listTxns("t")("torn")
    val rooted = d.catalog.rootTxnDeletes("t", "torn", st.deletes)
    assert(rooted.size == 1)
    // invisible everywhere: listings skip the gated root, reads unchanged
    assert(d.catalog.deleteVectorFiles("t").isEmpty)
    assert(tags(topic.events("read_committed")) == Map("plain" -> 10L))
    // other row-level operations refuse loudly while the txn is undecided
    val e = intercept[IllegalStateException](
      topic.deleteWhereVectored(tag === "plain" && idx >= 8))
    assert(e.getMessage.contains("undecided"))
    // retrying the commit resumes idempotently: no duplicate roots
    d.catalog.commitTxn("t", "torn")
    assert(d.catalog.deleteVectorFiles("t").size == 1)
    assert(tags(topic.events("read_committed")) == Map("plain" -> 5L))
    assert(d.catalog.deletedCountsByPartition("t").values.sum == 5L)
  }
}
