package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Model-based property check of the transaction lifecycle: random
 * interleavings of plain produces, transactional statements, decisions
 * (commit/abort), and TIMEOUT EXPIRIES (backdated lease + the
 * maintainTopic janitor) are replayed against a trivial reference model,
 * and the isolation contract is asserted after EVERY op:
 *
 *  - `read_committed` == plain rows + committed transactions' rows,
 *    exactly (nothing leaks early, nothing vanishes);
 *  - `read_uncommitted` == everything ever produced (the raw log);
 *  - after the scenario, `purgeAborted` removes exactly the decided-dead
 *    rows from the raw log and changes nothing in the committed view.
 *
 * Deterministic seeds; scenarios draw only model-valid ops, so every
 * engine call is expected to succeed — any throw is itself a failure.
 */
class TxnLifecyclePropertySpec extends SparkSpec {

  private def batch(tag: String, n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (s"""{"tag":"$tag","i":$i}""", i % 2))
      .toDF("metadata", "partition")
  }

  private def tags(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy(get_json_object(col("metadata"), "$.tag").as("tag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("random statement/decide/expire interleavings preserve the isolation contract") {
    spark.conf.set("spark.graft.txn.timeoutMs", "60000")
    // no mid-scenario debris purge: the final purge is asserted explicitly
    spark.conf.set("spark.graft.txn.abortedRetainMs", "3600000")
    try {
      (1 to 10).foreach { scenario =>
        val rnd = new scala.util.Random(7100L + scenario)
        val d = new GraftDriver(spark,
          Files.createTempDirectory("graft-txn-prop").toString)
        d.createTopic("t", partitions = 2)
        val topic = d.openTopic("t")
        var opened = Vector.empty[String]
        var committed = Map.empty[String, Long] // model: committed-visible tags
        var inLog = Map.empty[String, Long]     // model: raw-log tags
        var txnTags = Map.empty[String, Vector[(String, Long)]]
        var openTags = Set.empty[String]        // tags of still-open txns
        var counter = 0
        def fresh(p: String): String = { counter += 1; s"$p$counter" }
        def backdate(id: String): Unit = {
          val f = new java.io.File(new org.apache.hadoop.fs.Path(
            d.catalog.topicPath("t"), s"_txns/$id.json").toUri.getPath)
          assert(f.setLastModified(System.currentTimeMillis() - 120000L))
        }
        (0 until 8).foreach { _ =>
          val choices = Seq("plain", "begin") ++ (if (opened.nonEmpty)
            Seq("produce", "produce", "commit", "abort", "expire") else Nil)
          choices(rnd.nextInt(choices.size)) match {
            case "plain" =>
              val t = fresh("p"); val n = 2 + rnd.nextInt(4)
              topic.producer().produce(batch(t, n))
              committed += t -> n.toLong; inLog += t -> n.toLong
            case "begin" =>
              val id = fresh("tx")
              topic.beginTransaction(id): Unit
              opened :+= id; txnTags += id -> Vector.empty
            case "produce" =>
              val id = opened(rnd.nextInt(opened.size))
              val t = fresh("r"); val n = 2 + rnd.nextInt(4)
              topic.transaction(id).produce(batch(t, n))
              txnTags += id -> (txnTags(id) :+ (t -> n.toLong))
              inLog += t -> n.toLong; openTags += t
            case "commit" =>
              val id = opened(rnd.nextInt(opened.size))
              topic.transaction(id).commit()
              opened = opened.filterNot(_ == id)
              txnTags(id).foreach { case (t, n) =>
                committed += t -> n; openTags -= t }
            case "abort" =>
              val id = opened(rnd.nextInt(opened.size))
              topic.transaction(id).abort()
              opened = opened.filterNot(_ == id)
              txnTags(id).foreach { case (t, _) => openTags -= t }
            case "expire" =>
              // the abandoned-client path: stale lease, janitor aborts
              val id = opened(rnd.nextInt(opened.size))
              backdate(id)
              d.catalog.maintainTopic("t"): Unit
              assert(d.catalog.listTxns("t")(id).state == "aborted",
                s"scenario $scenario: expiry must abort '$id'")
              opened = opened.filterNot(_ == id)
              txnTags(id).foreach { case (t, _) => openTags -= t }
          }
          val seen = tags(topic.events("read_committed"))
          assert(seen == committed,
            s"scenario $scenario: read_committed $seen != model $committed")
        }
        assert(tags(topic.events("read_uncommitted")) == inLog,
          s"scenario $scenario: raw log diverged")
        // decided-dead rows = in the log, not committed, not still-open
        val dead = inLog.keySet -- committed.keySet -- openTags
        topic.purgeAborted(): Unit
        assert(tags(topic.events("read_committed")) == committed,
          s"scenario $scenario: purge changed the committed view")
        assert(tags(topic.events("read_uncommitted")) == (inLog -- dead),
          s"scenario $scenario: purge must reclaim exactly $dead")
      }
    } finally {
      spark.conf.unset("spark.graft.txn.timeoutMs")
      spark.conf.unset("spark.graft.txn.abortedRetainMs")
    }
  }
}
