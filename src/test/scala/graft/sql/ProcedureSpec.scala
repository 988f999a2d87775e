package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.GraftDriver

/**
 * Maintenance as SQL stored procedures: `CALL cat.system.<op>(...)` over
 * the engine's lifecycle operations — the Iceberg CALL shape on the
 * TableCatalog plugin.
 */
class ProcedureSpec extends SparkSpec {

  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  private def newCatalog(): (String, GraftDriver) = {
    val wh = Files.createTempDirectory("graft-proc-spec").toString
    val cat = s"proccat_${n.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, new GraftDriver(spark, wh))
  }

  private def produceBatch(d: GraftDriver, topic: String, lo: Int, hi: Int): Unit = {
    val p = d.openTopic(topic).producer()
    (lo until hi).foreach(i => p.push(s"""{"i":$i}"""))
    p.flush()
  }

  test("CALL system.compact rewrites many small files into few") {
    val (cat, d) = newCatalog()
    d.createTopic("t", partitions = 1)
    (0 until 6).foreach(b => produceBatch(d, "t", b * 4, b * 4 + 4))
    def files: Long = d.catalog.readManifest("t")
      .map(m => d.catalog.manifestFileCounts("t", m).values.sum).getOrElse(0L)
    assert(files >= 6)
    val out = spark.sql(s"CALL $cat.system.compact('t')").collect()
    assert(out.length == 1 && out(0).getString(0) == "t")
    assert(out(0).getLong(1) < 6 && out(0).getLong(1) == files)
    assert(d.openTopic("t").events().count() == 24) // content preserved
  }

  test("CALL system.vacuum reports reclaimed debris; clean topic is zeros") {
    val (cat, d) = newCatalog()
    d.createTopic("t", partitions = 1)
    produceBatch(d, "t", 0, 5)
    val clean = spark.sql(s"CALL $cat.system.vacuum('t')").collect()(0)
    assert((0 to 3).forall(clean.getLong(_) == 0L))
    // plant crashed-produce debris: an unregistered chunk above the watermark
    val fs = new org.apache.hadoop.fs.Path(d.warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(d.warehouse, "t"), "log/partition=0")
    import spark.implicits._
    Seq((0, 999L, "{}", null: Array[Byte]))
      .toDF("partition", "event_id", "metadata", "data")
      .drop("partition").coalesce(1)
      .write.mode("append").parquet(log.toString + ".stage")
    val staged = fs.listStatus(new org.apache.hadoop.fs.Path(log.toString + ".stage"))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(staged, new org.apache.hadoop.fs.Path(log, "part-99999-crashed.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(log.toString + ".stage"), true)
    val dirty = spark.sql(s"CALL $cat.system.vacuum('t')").collect()(0)
    assert(dirty.getLong(0) == 1L, dirty) // uncommitted chunk reclaimed
    assert(dirty.getLong(3) > 0L)
    assert(d.openTopic("t").events().count() == 5)
  }

  test("CALL system.restore rolls back; named args and defaults work") {
    val (cat, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    produceBatch(d, "t", 0, 10)
    produceBatch(d, "t", 10, 30)
    val t = d.openTopic("t")
    val v1 = t.history().agg(min("version")).collect()(0).getLong(0)
    val out = spark.sql(
      s"CALL $cat.system.restore(topic => 't', version => $v1)").collect()(0)
    assert(out.getString(0) == "t" && out.getLong(1) == v1)
    assert(t.events().count() == 10)
    // maintain with the default max_files_per_partition is a clean no-op
    val m = spark.sql(s"CALL $cat.system.maintain('t')").collect()(0)
    assert(!m.getBoolean(0) && m.getLong(1) == 0L)
  }

  test("CALL system.history returns the commit log, oldest first") {
    val (cat, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    produceBatch(d, "t", 0, 8)
    produceBatch(d, "t", 8, 20)
    val rows = spark.sql(s"CALL $cat.system.history('t')").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSeq == Seq("snapshot", "delta"))
    assert(rows.map(_.getLong(3)).toSeq == Seq(8L, 20L))
    assert(rows(0).getLong(0) < rows(1).getLong(0))
    assert(rows.forall(_.getTimestamp(2) != null))
  }

  test("CALL system.transactions / remote_shares: SQL-only wedge diagnosis") {
    // The operator's "what wedged my read_committed stream" answer must
    // not require a Scala shell: both admin views are CALL-able, with the
    // same rows the handle API returns.
    val (cat, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    d.createTopic("feed", partitions = 2)
    import spark.implicits._
    def batch(tag: String, n: Int) =
      (0 until n).map(i => (s"""{"tag":"$tag"}""", i % 2)).toDF("metadata", "partition")
    val topic = d.openTopic("t")
    val ok = topic.beginTransaction("ok"); ok.produce(batch("ok", 4)); ok.commit()
    val op = topic.beginTransaction("op")
    op.produce(batch("op", 6))
    op.produceTo("feed", batch("share", 4))
    op.sendOffsets("t", "g", Map(0 -> 1L))
    val rows = spark.sql(s"CALL $cat.system.transactions('t')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    assert(rows.toSeq == Seq(("ok", "committed", 4L, 0L), ("op", "open", 6L, 1L)))
    // idle_ms is a live lease age — present and sane, not pinned
    val idle = spark.sql(s"CALL $cat.system.transactions('t')")
      .select("idle_ms").collect().map(_.getLong(0))
    assert(idle.forall(_ >= 0L))
    // the wedge on the FEED topic shows as an open remote share
    val shares = spark.sql(s"CALL $cat.system.remote_shares('feed')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(shares.toSeq == Seq(("t", "op", "open", 4L)))
    op.abort()
    assert(spark.sql(s"CALL $cat.system.remote_shares('feed')")
      .collect()(0).getString(2) == "aborted")
  }

  test("CALL system.produce_intents: SQL-only concurrent-ingest diagnosis") {
    // The draining refusal and blocked-commit timeout name intent ids;
    // this view is where the operator resolves them — live slow write vs
    // crashed producer — without a Scala shell.
    val (cat, d) = newCatalog()
    d.createTopic("t", partitions = 2)
    import graft.engine.IntentTestOps
    assert(spark.sql(s"CALL $cat.system.produce_intents('t')").collect().isEmpty)
    // one live intent with staged data, one bare reservation
    val (idA, _) = IntentTestOps.reserve(d, "t", Map(0 -> 5L))
    val (idB, _) = IntentTestOps.reserve(d, "t", Map(0 -> 3L))
    import spark.implicits._
    Seq((0, 0L, """{"tag":"a"}""", null: Array[Byte]))
      .toDF("partition", "event_id", "metadata", "data")
      .coalesce(1).write.partitionBy("partition")
      .parquet(IntentTestOps.stagingDir(d, "t", idA))
    val rows = spark.sql(s"CALL $cat.system.produce_intents('t')").collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows.keySet == Set(idA, idB))
    val (aEvents, aRanges, aFiles, aBytes, aIdle) = rows(idA)
    assert((aEvents, aRanges) == (5L, 1L))
    assert(aFiles > 0L && aBytes > 0L, "A's staged footprint must be visible")
    assert(aIdle >= 0L, "idle_ms present and sane")
    val (bEvents, bRanges, bFiles, bBytes, _) = rows(idB)
    assert((bEvents, bRanges, bFiles, bBytes) == (3L, 1L, 0L, 0L),
      "B reserved but staged nothing yet")
    // the draining refusal points the operator at this view
    d.catalog.setConfOverride("spark.graft.produce.commitWaitMs", "200")
    try {
      val e = intercept[graft.engine.LockConflictException](
        IntentTestOps.acquireDraining(d, "t"))
      assert(e.getMessage.contains("produce_intents"), e.getMessage)
      assert(e.getMessage.contains(idA) && e.getMessage.contains(idB))
    } finally d.catalog.clearConfOverride("spark.graft.produce.commitWaitMs")
    // the handle API returns the same rows
    val api = d.openTopic("t").produceIntents()
      .select("intent_id", "n_events").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(api.toSeq == Seq((idA, 5L), (idB, 3L)).sortBy(_._1))
  }

  test("CALL system.locks: held-lock diagnosis, and the refusal names the view") {
    // VERDICT r16 #3: transactions and produce intents have admin views;
    // the third thing an exclusive statement can block on — a held
    // produce/compact lock — surfaced only through exception text. One
    // row per held lock: owner JSON, age, heartbeat mode, pending reclaim.
    val (cat, d) = newCatalog()
    import graft.engine.IntentTestOps
    d.createTopic("t", partitions = 1)
    assert(spark.sql(s"CALL $cat.system.locks('t')").collect().isEmpty,
      "no lock held, no rows")
    IntentTestOps.acquireProduce(d, "t")
    try {
      val rows = spark.sql(s"CALL $cat.system.locks('t')").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getString(0) == "produce")
      assert(r.getString(1).contains("\"owner\""),
        s"owner JSON from the lock file expected, got: ${r.getString(1)}")
      assert(r.getLong(2) >= 0L, "age_ms present and sane")
      assert(r.getString(3).nonEmpty, "heartbeat mode reported")
      assert(!r.getBoolean(4), "no reclaim claim pending")
      // a competing produce's refusal points the operator at this view
      val e = intercept[graft.engine.LockConflictException] {
        val t2 = new Thread(() => IntentTestOps.acquireProduce(d, "t"))
        val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        t2.setUncaughtExceptionHandler((_, ex) => err.set(ex))
        t2.start(); t2.join(10000)
        if (err.get() != null) throw err.get()
      }
      assert(e.getMessage.contains("system.locks"), e.getMessage)
    } finally IntentTestOps.releaseProduce(d, "t")
    assert(spark.sql(s"CALL $cat.system.locks('t')").collect().isEmpty,
      "released lock leaves no rows")
    // the handle API returns the same shape
    IntentTestOps.acquireProduce(d, "t")
    try {
      val api = d.openTopic("t").locks()
        .select("lock", "reclaim_pending").collect()
      assert(api.map(r => (r.getString(0), r.getBoolean(1))).toSeq ==
        Seq(("produce", false)))
    } finally IntentTestOps.releaseProduce(d, "t")
  }

  test("CALL system.expire drops the prefix; unknown procedures fail loudly") {
    val (cat, d) = newCatalog()
    d.createTopic("t", partitions = 1)
    (0 until 4).foreach(b => produceBatch(d, "t", b * 5, b * 5 + 5))
    spark.sql(s"CALL $cat.system.expire('t', 10)")
    val is = d.openTopic("t").events()
      .select(get_json_object(col("metadata"), "$.i").cast("long"))
      .collect().map(_.getLong(0)).toSet
    // expire drops WHOLE chunk files below the cutoff — at least the first
    // two produces (ids 0..9) are gone, and nothing at/above the cutoff is
    assert(is.subsetOf((10 until 20).map(_.toLong).toSet), is.toString)
    val e = intercept[Exception](spark.sql(s"CALL $cat.system.frobnicate('t')"))
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    assert(chain(e).exists(m => m != null && m.contains("unknown procedure")),
      chain(e).mkString(" | "))
    val e2 = intercept[Exception](spark.sql(s"CALL $cat.system.compact('missing')"))
    assert(e2.getMessage.contains("no such topic"), e2.getMessage)
  }
}
