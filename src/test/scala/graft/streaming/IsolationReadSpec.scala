package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.GraftDriver

/**
 * `isolation=read_committed` on the DSv2 batch scan (Kafka's
 * `isolation.level` analog): excludes every id range recorded by a
 * transaction that has not committed — local records and cross-topic
 * remote shares alike — via a per-slice row filter, with the
 * watermark-arithmetic shortcuts (pushed aggregates, limit caps) disabled
 * so counts and limits stay exact.
 */
class IsolationReadSpec extends SparkSpec {

  private def tag = get_json_object(col("metadata"), "$.t")

  private def fixture(): (GraftDriver, String) = {
    val wh = Files.createTempDirectory("graft-iso").toString
    val d = new GraftDriver(spark, wh)
    d.createTopic("t", partitions = 2)
    val topic = d.openTopic("t")
    import spark.implicits._
    def rows(t: String, n: Int) =
      (0 until n).map(i => (s"""{"t":"$t","i":$i}""", i % 2)).toDF("metadata", "partition")
    topic.producer().produce(rows("plain", 10))
    topic.beginTransaction("open").produce(rows("open", 6)): Unit
    val ab = topic.beginTransaction("ab"); ab.produce(rows("ab", 4)): Unit; ab.abort()
    val ok = topic.beginTransaction("ok"); ok.produce(rows("ok", 8)): Unit; ok.commit()
    (d, wh)
  }

  private def read(wh: String, extra: (String, String)*) = {
    val base = spark.read.format("graft")
      .option("warehouse", wh).option("topic", "t")
    extra.foldLeft(base) { case (r, (key, v)) => r.option(key, v) }.load()
  }

  private def tags(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy(tag.as("t")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("read_committed excludes open and aborted transactions' rows") {
    val (_, wh) = fixture()
    // default = read_uncommitted: the raw log
    assert(tags(read(wh)) ==
      Map("plain" -> 10L, "open" -> 6L, "ab" -> 4L, "ok" -> 8L))
    val committed = read(wh, "isolation" -> "read_committed")
    assert(tags(committed) == Map("plain" -> 10L, "ok" -> 8L))
    // count() exercises the aggregate-shortcut gate: watermark arithmetic
    // would say 28 — the pushed-agg path must refuse under read_committed
    assert(committed.count() == 18L)
    // a LIMIT must deliver exactly n committed rows even though the first
    // n ids per partition contain excluded rows (cap pushdown refused)
    assert(committed.limit(15).count() == 15L)
    assert(read(wh).count() == 28L)
    // bad value refuses loudly
    val e = intercept[IllegalArgumentException](
      read(wh, "isolation" -> "serializable").count())
    assert(e.getMessage.contains("read_committed"))
  }

  test("the session conf flips catalog-table SQL reads") {
    val (d, wh) = fixture()
    val cat = s"graftiso${(System.nanoTime() % 100000)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d.warehouse)
    try {
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 28L)
      spark.conf.set("spark.graft.read.isolation", "read_committed")
      assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 18L)
      // the committed view composes with ordinary predicates
      val perTag = spark.sql(
        s"""SELECT get_json_object(metadata, '$$.t') AS t, count(*) AS n
           |FROM $cat.t GROUP BY 1 ORDER BY t""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perTag == Map("plain" -> 10L, "ok" -> 8L))
    } finally {
      spark.conf.unset("spark.graft.read.isolation")
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  test("a later commit becomes visible to the next read_committed scan") {
    val (d, wh) = fixture()
    d.openTopic("t").transaction("open").commit()
    assert(tags(read(wh, "isolation" -> "read_committed")) ==
      Map("plain" -> 10L, "open" -> 6L, "ok" -> 8L))
  }

  test("change feeds refuse the isolation combination") {
    val (_, wh) = fixture()
    val e = intercept[IllegalArgumentException](
      read(wh, "isolation" -> "read_committed",
        "readChangeFeed" -> "true").count())
    assert(e.getMessage.contains("compose"))
  }

  /** Drain a read_committed stream with AvailableNow into tag counts. */
  private def drainCommitted(wh: String, ckpt: String): Map[String, Long] = {
    val acc = scala.collection.mutable.Map.empty[String, Long]
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "t")
      .option("isolation", "read_committed")
      .option("maxEventsPerTrigger", "7") // mid-window triggers too
      .load()
      .select(tag.as("t"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.groupBy(col("t")).count()
          .collect().map(r => r.getString(0) -> r.getLong(1))
        acc.synchronized {
          rows.foreach { case (k, n) => acc(k) = acc.getOrElse(k, 0L) + n }
        }: Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive)
    acc.toMap
  }

  test("read_committed stream: LSO holds at the first open txn; decisions release") {
    val (d, wh) = fixture()
    val topic = d.openTopic("t")
    import spark.implicits._
    // plain rows produced AFTER the open transaction: their ids sit past
    // the open ranges, so the LSO must hold them back too (in-order
    // delivery — Kafka's exactly the same)
    topic.producer().produce((0 until 6)
      .map(i => (s"""{"t":"late"}""", i % 2)).toDF("metadata", "partition"))
    val ckpt = Files.createTempDirectory("iso-stream-ck").toString
    val first = drainCommitted(wh, ckpt)
    // visible: everything below the FIRST open-transaction id per
    // partition — plain and the committed txn's rows (both produced
    // before "open"); held: the open txn's rows AND everything after
    // (aborted "ab", committed-later "ok", late plain rows)
    assert(first == Map("plain" -> 10L),
      s"LSO must hold at the first open range: $first")
    // deciding the transaction releases the log in order: open commits →
    // its rows AND everything stable behind it flow, aborted stays out
    topic.transaction("open").commit()
    val second = drainCommitted(wh, ckpt)
    assert(second == Map("open" -> 6L, "ok" -> 8L, "late" -> 6L),
      s"decision must release exactly the stable suffix, aborted filtered: $second")
    // exactly once across drains
    assert(drainCommitted(wh, ckpt).isEmpty)
  }

  test("isolation switch on a live checkpoint: LSO below the delivered offset never inverts") {
    // A checkpoint written under read_uncommitted has delivered rows past
    // an open transaction's first id. Restarting it with
    // isolation=read_committed puts the LSO clamp BELOW the committed end
    // offset — latestOffset must floor at the checkpointed start (empty
    // batch, no inverted [start, end) window, no manifest-plan
    // IOException), and already-delivered rows are never re-delivered.
    val wh = Files.createTempDirectory("graft-iso-switch").toString
    val d = new GraftDriver(spark, wh)
    d.createTopic("t", partitions = 2)
    val topic = d.openTopic("t")
    import spark.implicits._
    def rows(t: String, n: Int) =
      (0 until n).map(i => (s"""{"t":"$t","i":$i}""", i % 2)).toDF("metadata", "partition")
    topic.producer().produce(rows("plain", 10))
    topic.beginTransaction("open").produce(rows("open", 6)): Unit
    topic.producer().produce(rows("late", 4))
    val ckpt = Files.createTempDirectory("iso-switch-ck").toString
    def drain(iso: Option[String]): Map[String, Long] = {
      val acc = scala.collection.mutable.Map.empty[String, Long]
      val base = spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "t")
      val q = iso.foldLeft(base)((r, v) => r.option("isolation", v)).load()
        .select(tag.as("t"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.groupBy(col("t")).count().collect()
            .foreach(r => acc.synchronized {
              acc(r.getString(0)) = acc.getOrElse(r.getString(0), 0L) + r.getLong(1)
            }): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
      acc.toMap
    }
    // uncommitted drain delivers EVERYTHING, including the open txn's rows
    assert(drain(None) == Map("plain" -> 10L, "open" -> 6L, "late" -> 4L))
    // switch to read_committed on the SAME checkpoint: the clamp sits
    // below the delivered end — must complete cleanly with nothing new
    assert(drain(Some("read_committed")).isEmpty)
    // new rows past the checkpoint stay held while the txn is open...
    topic.producer().produce(rows("fresh", 4))
    assert(drain(Some("read_committed")).isEmpty)
    // ...and flow once it decides
    topic.transaction("open").commit()
    assert(drain(Some("read_committed")) == Map("fresh" -> 4L))
  }

  test("abandoned open txn: timeout auto-abort releases a stalled committed stream") {
    val wh = Files.createTempDirectory("graft-iso-timeout").toString
    val d = new GraftDriver(spark, wh)
    d.createTopic("t", partitions = 2)
    val topic = d.openTopic("t")
    import spark.implicits._
    def rows(t: String, n: Int) =
      (0 until n).map(i => (s"""{"t":"$t","i":$i}""", i % 2)).toDF("metadata", "partition")
    topic.producer().produce(rows("plain", 10))
    topic.beginTransaction("hung").produce(rows("hung", 6)): Unit
    topic.producer().produce(rows("late", 4))
    val ckpt = Files.createTempDirectory("iso-timeout-ck").toString
    // stalled: the LSO holds at the hung transaction's first ids
    assert(drainCommitted(wh, ckpt) == Map("plain" -> 10L))
    // the client died — nothing will ever decide "hung". Age it past the
    // timeout and run the cron surface: the auto-abort releases the
    // stream with NO manual intervention (the r13 liveness gap).
    spark.conf.set("spark.graft.txn.timeoutMs", "60000")
    try {
      val state = new java.io.File(new org.apache.hadoop.fs.Path(
        d.catalog.topicPath("t"), "_txns/hung.json").toUri.getPath)
      assert(state.setLastModified(System.currentTimeMillis() - 120000L))
      d.catalog.maintainTopic("t"): Unit
      assert(d.catalog.listTxns("t")("hung").state == "aborted")
      // released: the late rows flow; the aborted rows never appear
      assert(drainCommitted(wh, ckpt) == Map("late" -> 4L))
    } finally spark.conf.unset("spark.graft.txn.timeoutMs")
  }
}
