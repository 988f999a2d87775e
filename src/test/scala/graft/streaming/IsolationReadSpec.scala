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

  test("streams refuse read_committed; change feeds refuse the combination") {
    val (_, wh) = fixture()
    // the scan materializes inside the stream thread — the refusal
    // surfaces through the query, not from start()
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "t")
      .option("isolation", "read_committed").load()
      .writeStream.format("memory").queryName("iso_refuse")
      .option("checkpointLocation",
        Files.createTempDirectory("iso-ck").toString)
      .start()
    val e1 = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination(60000))
    assert(e1.getMessage.contains("batch-read option"))
    val e2 = intercept[IllegalArgumentException](
      read(wh, "isolation" -> "read_committed",
        "readChangeFeed" -> "true").count())
    assert(e2.getMessage.contains("don't compose") ||
      e2.getMessage.contains("compose"))
  }
}
