package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.engine._

/**
 * DSv2 source/sink over topic logs: batch read parity with the engine view,
 * column pruning + id/partition pushdown, Trigger.AvailableNow drain +
 * checkpointed resume (the MicroBatchStream port of `feedConsumer`,
 * SURVEY §2.1 S8), admission control, and the foreachBatch producer sink.
 */
class StreamingSpec extends SparkSpec {

  private def newTopic(partitions: Int = 2): (GraftDriver, TopicHandle, String) = {
    val wh = Files.createTempDirectory("graft-stream-spec").toString
    val d = new GraftDriver(spark, wh)
    d.createTopic("stream_topic", partitions = partitions)
    (d, d.openTopic("stream_topic"), wh)
  }

  private def produceRange(topic: TopicHandle, from: Int, until: Int): Unit = {
    val producer = topic.producer()
    (from until until).foreach { i =>
      producer.push(s"""{"i":$i}""", s"payload-$i".getBytes("UTF-8"),
        partition = Some(i % 2))
    }
    producer.flush()
  }

  private def read(wh: String, extra: (String, String)*) = {
    val base = spark.read.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("batch read matches the engine's events() view") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 40)
    val viaSource = read(wh)
      .select("partition", "event_id", "metadata")
      .orderBy("partition", "event_id").collect().toSeq
    val viaEngine = topic.events()
      .select("partition", "event_id", "metadata")
      .orderBy("partition", "event_id").collect().toSeq
    assert(viaSource == viaEngine)
    assert(viaSource.size == 40)
  }

  test("SQL DDL surface: CREATE TABLE ... USING graft, queried via spark.sql") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 40)
    spark.sql("DROP TABLE IF EXISTS graft_sql_events")
    spark.sql(
      s"""CREATE TABLE graft_sql_events USING graft
         |OPTIONS (warehouse '$wh', topic 'stream_topic')""".stripMargin)
    try {
      val n = spark.sql("SELECT count(*) AS n FROM graft_sql_events")
        .collect()(0).getLong(0)
      assert(n == 40)
      // predicate + projection through the SQL path, same pushdown plumbing
      val agg = spark.sql(
        """SELECT partition, count(*) AS c, max(event_id) AS mx
          |FROM graft_sql_events WHERE event_id >= 10
          |GROUP BY partition ORDER BY partition""".stripMargin).collect()
      assert(agg.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq((0, 10L, 19L), (1, 10L, 19L)))
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_events"): Unit
  }

  test("payload bytes round-trip through the source") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 4)
    val rows = read(wh).orderBy("partition", "event_id").collect()
    val byMeta = rows.map(r => r.getAs[String]("metadata") ->
      new String(r.getAs[Array[Byte]]("data"), "UTF-8")).toMap
    assert(byMeta("""{"i":3}""") == "payload-3")
  }

  test("column pruning reaches the scan; pushed id range prunes row groups") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 40)
    val plan = read(wh).filter(col("event_id") >= 10 && col("partition") === 1)
      .select("event_id", "metadata")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftScan"), plan)
    // pruned: no data column in the scan's read schema
    assert(plan.contains("cols=partition,event_id,metadata") ||
      !plan.contains("data"), plan)
    val rows = read(wh).filter(col("event_id") >= 10 && col("partition") === 1)
      .select("event_id").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (10L until 20L))
  }

  test("AvailableNow drains the topic and terminates; checkpoint resumes incrementally") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 30)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "stream_topic")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = batch.select("partition", "event_id").collect()
            .map(r => (r.getInt(0), r.getLong(1)))
          seen.synchronized { seen ++= rows }: Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }

    runOnce()
    assert(seen.size == 30)

    produceRange(topic, 30, 50)
    runOnce() // resumes from the checkpointed offset: only the 20 new events
    assert(seen.size == 50)
    assert(seen.toSet == (for (p <- 0 until 2; i <- 0L until 25L) yield (p, i)).toSet)
  }

  test("streaming exact-dedup: dropDuplicates over the source keeps one row per content") {
    // the streaming-ingest dedup shape: duplicates arriving across separate
    // produces (and thus separate micro-batches) collapse to one survivor
    // via Spark's stateful dropDuplicates — state carries across batches
    val (_, topic, wh) = newTopic()
    val producer = topic.producer()
    (0 until 30).foreach(i => producer.push(s"""{"k":${i % 10}}""")) // 3 copies each
    producer.flush()
    (0 until 10).foreach(i => producer.push(s"""{"k":$i}"""))        // 4th copy
    producer.flush()
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .option("maxEventsPerTrigger", "16") // force multiple micro-batches
      .load()
      .dropDuplicates("metadata")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = batch.select("metadata").collect().map(_.getString(0))
        seen.synchronized { seen ++= rows }: Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive)
    assert(seen.size == 10, s"expected 10 distinct metadata values, got ${seen.size}")
    assert(seen.toSet == (0 until 10).map(i => s"""{"k":$i}""").toSet)
  }

  test("maxEventsPerTrigger bounds each micro-batch (admission control)") {
    val (_, topic, wh) = newTopic()
    produceRange(topic, 0, 40)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val outName = s"stream_bounded_${System.nanoTime()}"
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .option("maxEventsPerTrigger", "15")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }: Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(batchSizes.sum == 40, batchSizes)
    assert(batchSizes.forall(_ <= 15), batchSizes)
    assert(batchSizes.size >= 3, batchSizes)
  }

  test("maxBytesPerTrigger admits whole chunk files against a byte budget") {
    val (_, topic, wh) = newTopic()
    // 4 produces × 2 partitions → 8 immutable chunk files of 5 events each
    (0 until 4).foreach(i => produceRange(topic, i * 10, (i + 1) * 10))
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    // a 1-byte budget admits exactly one file per trigger (the at-least-one
    // guarantee): every micro-batch is one 5-event chunk, 8 triggers total
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .option("maxBytesPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }: Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(batchSizes.sum == 40, batchSizes)
    assert(batchSizes.filter(_ > 0).forall(_ <= 5), batchSizes)
    assert(batchSizes.count(_ > 0) >= 8, batchSizes)

    // composite: a byte budget large enough for everything defers to the
    // row cap — both limits apply, the tighter one binds
    val ckpt2 = Files.createTempDirectory("graft-ckpt").toString
    val sizes2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .option("maxBytesPerTrigger", s"${64L * 1024 * 1024}")
      .option("maxEventsPerTrigger", "15")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sizes2.synchronized { sizes2 += batch.count() }: Unit
      }
      .option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    assert(sizes2.sum == 40, sizes2)
    assert(sizes2.forall(_ <= 15), sizes2)
  }

  test("byte admission plans O(admitted) entries, not O(backlog)") {
    // Parquet-backed manifest (threshold 0) + plan windows smaller than the
    // backlog: a byte-budgeted drain over many chunk files must plan only
    // the files near each trigger's cursor. An O(backlog) admission path
    // (plan [cursor, target) every trigger) would count ~triggers x files/2
    // entries; the windowed path stays near 3 entries per trigger.
    spark.conf.set("spark.graft.manifest.driverMaxEntries", "0")
    spark.conf.set("spark.graft.stream.bytesPlanWindowIds", "8")
    try {
      val (_, topic, wh) = newTopic()
      // 20 produces x 2 partitions -> 40 chunk files of 5 events each
      (0 until 20).foreach(i => produceRange(topic, i * 10, (i + 1) * 10))
      val ckpt = Files.createTempDirectory("graft-ckpt").toString
      val before = GraftPartitions.probePlannedEntries.get()
      val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "stream_topic")
        .option("maxBytesPerTrigger", "1")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batchSizes.synchronized { batchSizes += batch.count() }: Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
      assert(!q.isActive)
      assert(batchSizes.sum == 200, batchSizes)
      assert(batchSizes.filter(_ > 0).forall(_ <= 5), batchSizes)
      val triggers = batchSizes.count(_ > 0)
      assert(triggers >= 40, s"expected >=40 one-file triggers, got $triggers")
      val probed = GraftPartitions.probePlannedEntries.get() - before
      // O(backlog) admission (plan [cursor, target) each trigger) probes
      // ~sum_{k=40..1} k ~ 860 entries over the drain (~21/trigger); the
      // windowed path probes the few files near each cursor.
      assert(probed <= triggers * 6L,
        s"probed $probed file entries over $triggers triggers - admission is re-planning the backlog")
    } finally {
      spark.conf.unset("spark.graft.manifest.driverMaxEntries")
      spark.conf.unset("spark.graft.stream.bytesPlanWindowIds")
    }
  }

  test("consumer option starts the stream at the acknowledge cursor") {
    val (d, topic, wh) = newTopic()
    produceRange(topic, 0, 20)
    // ack first 5 per partition → cursor 5
    (0 until 2).foreach(p => d.catalog.acknowledge("stream_topic", "walker", p, 4L))
    val rows = read(wh, "consumer" -> "walker").collect()
    assert(rows.length == 20) // batch read ignores cursor (full log)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val outName = s"stream_cursor_${System.nanoTime()}"
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .option("consumer", "walker")
      .load()
      .writeStream.format("memory").queryName(outName)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table(outName).select("partition", "event_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == (for (p <- 0 until 2; i <- 5L until 10L) yield (p, i)).toSet)
  }

  test("startingTime options begin a fresh stream at the time floor; checkpoints take precedence") {
    val (_, topic, wh) = newTopic()
    // metadata carries ts = 100·(i+1); per partition, ts >= 1100 first
    // holds at the 6th event (local id 5)
    val producer = topic.producer()
    (0 until 20).foreach { i =>
      producer.push(s"""{"i":$i,"ts":${(i + 1) * 100}}""", partition = Some(i % 2))
    }
    producer.flush()
    val ckpt = Files.createTempDirectory("graft-ckpt-time").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "stream_topic")
        .option("startingTimeField", "$.ts")
        .option("startingTimeCutoff", "1100")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = batch.select("partition", "event_id").collect()
            .map(r => (r.getInt(0), r.getLong(1)))
          seen.synchronized { seen ++= rows }: Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000): Unit
    }
    run()
    assert(seen.toSet == (for (p <- 0 until 2; i <- 5L until 10L) yield (p, i)).toSet)
    // restart on the SAME checkpoint after more (old-timestamped!) data:
    // the cutoff must NOT re-apply — the checkpoint's offsets win, so the
    // new events arrive even though their ts is below the cutoff
    (20 until 24).foreach { i =>
      producer.push(s"""{"i":$i,"ts":1}""", partition = Some(i % 2))
    }
    producer.flush()
    run()
    assert(seen.toSet == (for (p <- 0 until 2; i <- 5L until 12L) yield (p, i)).toSet,
      "a restart must continue from the checkpoint, not re-pin by time")
    // misuse fails loudly
    intercept[Exception] {
      spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "stream_topic")
        .option("startingTimeField", "$.ts").load()
    }
    intercept[Exception] {
      spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "stream_topic")
        .option("consumer", "c").option("startingTimeField", "$.ts")
        .option("startingTimeCutoff", "5").load()
    }
  }

  test("event-time windows with watermark over the graft source (R7 extension)") {
    val (_, topic, wh) = newTopic(partitions = 1)
    val producer = topic.producer()
    // event times 0..99s; 30s tumbling windows; 10s watermark → with max
    // event time 99s the watermark lands at 89s; a window emits once the
    // watermark passes its END, so [0,30) and [30,60) emit while [60,90)
    // (end 90 > 89) and [90,120) are withheld as potentially-late.
    (0 until 100).foreach(i => producer.push(s"""{"sec":$i}"""))
    producer.flush()

    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val results = scala.collection.mutable.Map.empty[Long, Long]
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .load()
      .withColumn("event_time",
        timestamp_seconds(get_json_object(col("metadata"), "$.sec").cast("long")))
      .withWatermark("event_time", "10 seconds")
      .groupBy(window(col("event_time"), "30 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("n"))
      .writeStream
      .outputMode("append") // only closed (below-watermark) windows emit
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach(r => results.synchronized {
          results(r.getLong(0)) = r.getLong(1)
        }): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(results.toMap == Map(0L -> 30L, 30L -> 30L))
  }

  test("stream-static join: graft stream enriched by a broadcast dimension table") {
    import org.apache.spark.sql.functions.broadcast
    val (_, topic, wh) = newTopic(partitions = 1)
    val p = topic.producer()
    (0 until 30).foreach(i => p.push(s"""{"uid":${i % 3},"v":$i}"""))
    p.flush()
    val spark2 = spark
    import spark2.implicits._
    val dim = Seq((0L, "gold"), (1L, "silver"), (2L, "bronze")).toDF("uid", "tier")
    val ckpt = Files.createTempDirectory("graft-ssd-ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic").load()
      .select(get_json_object(col("metadata"), "$.uid").cast("long").as("uid"))
      .join(broadcast(dim), "uid")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach(r => seen.synchronized {
          seen += (r.getLong(0) -> r.getString(1))
        }): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val byTier = seen.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byTier == Map("gold" -> 10, "silver" -> 10, "bronze" -> 10))
    assert(seen.forall { case (uid, tier) =>
      tier == Seq("gold", "silver", "bronze")(uid.toInt) })
  }

  test("stream-stream join: two graft topics join on key within a time bound") {
    // clicks in topic A, purchases in topic B (separate warehouses); the
    // inner event-time join must pair each purchase with the one click of
    // the same key whose time window contains it — the Structured Streaming
    // two-source state-store join running entirely over graft sources
    val whA = Files.createTempDirectory("graft-ssj-a").toString
    val whB = Files.createTempDirectory("graft-ssj-b").toString
    val dA = new GraftDriver(spark, whA); dA.createTopic("t", partitions = 1)
    val dB = new GraftDriver(spark, whB); dB.createTopic("t", partitions = 1)
    // times sit 1h past the epoch: Spark's global watermark starts AT the
    // epoch, and a row whose event time equals that initial watermark can
    // be judged late by the join's state-eviction bound — a real pipeline
    // never has epoch-0 event times, so keep the fixture off the boundary
    val base = 3600L
    val pA = dA.openTopic("t").producer()
    // clicks: key i%5 at second base+i (keys recur every 5s)
    (0 until 20).foreach(i => pA.push(s"""{"k":${i % 5},"sec":${base + i}}"""))
    pA.flush()
    val pB = dB.openTopic("t").producer()
    // purchases: every even i, same key, 500ms after its click
    (0 until 20 by 2).foreach(i =>
      pB.push(s"""{"k":${i % 5},"ms":${(base + i) * 1000 + 500}}"""))
    pB.flush()

    def src(wh: String) = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "t").load()
    val clicks = src(whA)
      .select(get_json_object(col("metadata"), "$.k").cast("long").as("ck"),
        timestamp_seconds(get_json_object(col("metadata"), "$.sec").cast("long")).as("ct"))
      .withWatermark("ct", "1 minute")
    val purchases = src(whB)
      .select(get_json_object(col("metadata"), "$.k").cast("long").as("pk"),
        timestamp_millis(get_json_object(col("metadata"), "$.ms").cast("long")).as("pt"))
      .withWatermark("pt", "1 minute")

    val ckpt = Files.createTempDirectory("graft-ssj-ckpt").toString
    val pairs = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = clicks.join(purchases,
        expr("ck = pk AND pt >= ct AND pt <= ct + interval 2 seconds"))
      .select(col("ck"), unix_timestamp(col("ct")).as("cs"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach(r => pairs.synchronized {
          pairs += (r.getLong(0) -> r.getLong(1))
        }): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // each purchase (even i) pairs with exactly the click at base+i: the
    // next click of the same key is 5s away, outside the 2s bound
    val expected = (0 until 20 by 2).map(i => (i % 5).toLong -> (base + i)).toSet
    assert(pairs.toSet == expected)
  }

  test("custom state: mapGroupsWithState carries per-user counts across micro-batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val (_, topic, wh) = newTopic(partitions = 2)
    val producer = topic.producer()
    (0 until 40).foreach(i => producer.push(s"""{"u":${i % 5}}"""))
    producer.flush()

    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val finalCounts = scala.collection.mutable.Map.empty[Long, Long]
    var batches = 0
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .option("maxEventsPerTrigger", "10") // force several batches → state must carry
      .load()
      .select(get_json_object(col("metadata"), "$.u").cast("long").as("u"))
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (u: Long, events: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          (u, total)
      }
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Long)], _: Long) =>
        val rows = batch.collect()
        finalCounts.synchronized {
          batches += 1
          rows.foreach { case (u, c) => finalCounts(u) = c }
        }: Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(batches >= 3, s"expected several bounded batches, got $batches")
    assert(finalCounts.toMap == (0L until 5L).map(_ -> 8L).toMap)
  }

  test("tail reads prune non-overlapping chunk files at plan time") {
    val (d, topic, wh) = newTopic(partitions = 1)
    val producer = topic.producer(chunkMaxRecords = 10)
    (0 until 45).foreach(i => producer.push(s"""{"i":$i}"""))
    producer.flush()
    val all = GraftPartitions.plan(d.catalog, "stream_topic", None,
      from = _ => 0L, until = _ => 45L, Some(new FileStatsCache))
    val tail = GraftPartitions.plan(d.catalog, "stream_topic", None,
      from = _ => 40L, until = _ => 45L, Some(new FileStatsCache))
    val allFiles = all.head.asInstanceOf[GraftInputPartition].files
    val tailFiles = tail.head.asInstanceOf[GraftInputPartition].files
    assert(allFiles.size >= 5)
    assert(tailFiles.size < allFiles.size,
      s"tail slice should not carry every chunk: $tailFiles")
    // pruned slice still reads the right rows
    val got = read(wh).filter(col("event_id") >= 40).count()
    assert(got == 5)
  }

  test("manifest: trigger planning needs no directory listing; heals and survives compaction") {
    val (d, topic, _) = newTopic(partitions = 2)
    produceRange(topic, 0, 20)
    produceRange(topic, 20, 40)

    // produce committed a manifest covering the watermark, with real ranges
    val m = d.catalog.readManifest("stream_topic").get
    assert(m.watermarks == Map(0 -> 20L, 1 -> 20L))
    assert(m.files(0).size >= 2, "each produce registers its own chunk files")
    assert(m.files(0).map(_.lo).min == 0L && m.files(0).map(_.hi).max == 19L)

    val planned = GraftPartitions.plan(d.catalog, "stream_topic", None,
      from = _ => 0L, until = _ => 20L)
    // PROOF of no re-listing: delete the log directory out from under the
    // planner — manifest-covered planning must return identical slices
    // because it never touches the directory
    val logDir = new org.apache.hadoop.fs.Path(d.catalog.logPath("stream_topic"))
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hidden = new org.apache.hadoop.fs.Path(logDir.getParent, "log.hidden")
    assert(fs.rename(logDir, hidden))
    try {
      val replanned = GraftPartitions.plan(d.catalog, "stream_topic", None,
        from = _ => 0L, until = _ => 20L)
      assert(planned.toSeq == replanned.toSeq, "manifest planning re-listed the directory")
    } finally assert(fs.rename(hidden, logDir))

    // manifest ranges prune tail reads without a FileStatsCache
    val tail = GraftPartitions.plan(d.catalog, "stream_topic", None,
      from = _ => 15L, until = _ => 20L)
    val full = planned.map(_.asInstanceOf[GraftInputPartition].files.size).sum
    assert(tail.map(_.asInstanceOf[GraftInputPartition].files.size).sum < full)

    // lost manifest → listing fallback still plans; next produce heals it
    val manifestDir = new org.apache.hadoop.fs.Path(
      d.catalog.topicPath("stream_topic"), "_manifest")
    fs.delete(manifestDir, true)
    assert(d.catalog.readManifest("stream_topic").isEmpty)
    val fallback = GraftPartitions.plan(d.catalog, "stream_topic", None,
      from = _ => 0L, until = _ => 20L, Some(new FileStatsCache))
    assert(fallback.map(_.asInstanceOf[GraftInputPartition].files.toSet).toSet ==
      planned.map(_.asInstanceOf[GraftInputPartition].files.toSet).toSet)
    produceRange(topic, 40, 44)
    val healed = d.catalog.readManifest("stream_topic").get
    assert(healed.watermarks == Map(0 -> 22L, 1 -> 22L))
    // the heal re-registers every pre-manifest file plus the new produce's
    val oldP0 = planned.head.asInstanceOf[GraftInputPartition].files
      .map(f => f.substring(f.indexOf("partition="))).toSet
    assert(oldP0.subsetOf(healed.files(0).map(_.path).toSet),
      "heal must re-register pre-manifest files")
    assert(healed.files(0).map(_.path).toSet.size > oldP0.size)

    // compaction replaces every chunk → manifest rebuilt, still covering
    topic.compact()
    val compacted = d.catalog.readManifest("stream_topic").get
    assert(compacted.watermarks == Map(0 -> 22L, 1 -> 22L))
    assert(compacted.files(0).size == 1 && compacted.files(1).size == 1)
    assert(compacted.files(0).head.lo == 0L && compacted.files(0).head.hi == 21L)
    // and planning from the rebuilt manifest reads the right rows
    val total = spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "stream_topic")
      .load().count()
    assert(total == 44)
  }

  test("sink replay idempotence: a re-delivered micro-batch is produced once") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-sink-idem").toString
    val d = new GraftDriver(spark, wh)
    d.createTopic("idem_topic")
    val topic = d.openTopic("idem_topic")
    val batch = (0 until 10).map(i => s"""{"i":$i}""").toDF("metadata")
    GraftSink.produceBatch(topic, "s1")(batch, batchId = 0L)
    GraftSink.produceBatch(topic, "s1")(batch, batchId = 0L) // checkpoint replay
    assert(topic.events().count() == 10)
    GraftSink.produceBatch(topic, "s1")(batch, batchId = 1L) // genuinely new batch
    assert(topic.events().count() == 20)
    // a different sink id has its own marker
    GraftSink.produceBatch(topic, "s2")(batch, batchId = 0L)
    assert(topic.events().count() == 30)
    // sink ids become catalog path components — traversal is rejected
    intercept[IllegalArgumentException] {
      GraftSink.produceBatch(topic, "../_ids")(batch, batchId = 0L)
    }
  }

  test("admission control splits the budget fairly across partition backlogs") {
    val (_, topic, wh) = newTopic(partitions = 2)
    val producer = topic.producer()
    (0 until 30).foreach(i => producer.push(s"""{"i":$i}""", partition = Some(0)))
    (0 until 5).foreach(i => producer.push(s"""{"j":$i}""", partition = Some(1)))
    producer.flush()
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val firstBatch = scala.collection.mutable.Map.empty[Int, Long]
    var first = true
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .option("maxEventsPerTrigger", "10")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val counts = batch.groupBy("partition").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        firstBatch.synchronized {
          if (first) { firstBatch ++= counts; first = false }
        }: Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // fair split of the 10-row budget: the small partition is fully served
    // in the first batch instead of being starved by partition 0's backlog
    assert(firstBatch.getOrElse(1, 0L) == 5L, firstBatch)
    assert(firstBatch.getOrElse(0, 0L) == 5L, firstBatch)
  }

  test("streaming ingestion with cross-batch dedup via incrementalExact") {
    // the streaming-corpus curation composition: each micro-batch dedups
    // against the persisted fingerprint store of everything already seen;
    // duplicates planted across DIFFERENT micro-batches must be suppressed
    val (_, topic, wh) = newTopic(partitions = 1)
    val producer = topic.producer()
    // 12 events over >=3 micro-batches (budget 4): texts repeat mod 5, so
    // every text after the first five is a cross- or in-batch duplicate
    (0 until 12).foreach(i => producer.push(s"""{"text":"doc body ${i % 5}"}"""))
    producer.flush()
    val storeDir = Files.createTempDirectory("graft-dedup-store").toString
    spark.emptyDataset[String](org.apache.spark.sql.Encoders.STRING)
      .toDF("content_hash").write.mode("overwrite").parquet(storeDir)
    val survivors = scala.collection.mutable.ArrayBuffer.empty[String]
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val q = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .option("maxEventsPerTrigger", "4")
      .load()
      .select(col("event_id").as("id"),
        get_json_object(col("metadata"), "$.text").as("text"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val store = spark.read.parquet(storeDir)
        val (surv, nextStore) = graft.llm.Dedup.incrementalExact(
          batch.toDF(), "id", "text", store)
        val texts = surv.join(batch.toDF().withColumnRenamed("id", "keep_id"), "keep_id")
          .select("text").collect().map(_.getString(0))
        survivors.synchronized { survivors ++= texts }: Unit
        // store update: overwrite via a staged write (parquet can't
        // self-overwrite its own input in one job)
        val staged = nextStore.collect().map(_.getString(0)).toSeq
        import spark.implicits._
        staged.toDF("content_hash").write.mode("overwrite").parquet(storeDir)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // exactly the five distinct texts survive, each exactly once, despite
    // duplicates arriving in later micro-batches
    assert(survivors.sorted.toSeq == (0 until 5).map(i => s"doc body $i"))
  }

  test("streaming sink: graft source -> foreachBatch produce keeps ids dense") {
    val (_, src, wh) = newTopic()
    produceRange(src, 0, 30)
    val whB = Files.createTempDirectory("graft-stream-sink").toString
    val dB = new GraftDriver(spark, whB)
    dB.createTopic("sink_topic", partitions = 3)
    val sink = dB.openTopic("sink_topic")

    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val stream = spark.readStream.format("graft")
      .option("warehouse", wh).option("topic", "stream_topic")
      .load()
      .select(col("metadata")) // re-produce metadata into the sink topic
      .writeStream
    val q = GraftSink.toTopic(stream, sink, sinkId = "relay_1")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val stats = sink.events().groupBy("partition")
      .agg(count(lit(1)).as("n"), min("event_id").as("lo"), max("event_id").as("hi"))
      .collect()
    assert(stats.map(_.getAs[Long]("n")).sum == 30)
    stats.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
  }

  test("writeStream.format(graft): native sink keeps ids dense, replay idempotent") {
    val (_, src, wh) = newTopic()
    produceRange(src, 0, 30)
    val whB = Files.createTempDirectory("graft-fmt-sink").toString
    val dB = new GraftDriver(spark, whB)
    dB.createTopic("fmt_topic", partitions = 3)
    val sink = dB.openTopic("fmt_topic")
    val ckpt = Files.createTempDirectory("graft-fmt-ckpt").toString

    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "stream_topic")
        .load()
        .select(col("metadata"))
        .writeStream.format("graft")
        .option("warehouse", whB).option("topic", "fmt_topic")
        .option("checkpointLocation", ckpt) // sinkId defaults from this
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000): Unit
    }
    run()
    assert(sink.events().count() == 30)

    // restart on the same checkpoint with nothing new: no duplicates
    run()
    assert(sink.events().count() == 30)

    // new upstream events flow incrementally through the same checkpoint
    produceRange(src, 30, 40)
    run()
    val stats = sink.events().groupBy("partition")
      .agg(count(lit(1)).as("n"), min("event_id").as("lo"), max("event_id").as("hi"))
      .collect()
    assert(stats.map(_.getAs[Long]("n")).sum == 40)
    stats.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }

    // sinkId normalization: every spelling of one checkpoint lineage must
    // map to ONE idempotence marker (else a respelled crash-restart
    // re-produces the replayed batch)
    val conf = spark.sparkContext.hadoopConfiguration
    val canonical = GraftTopicProvider.checkpointSinkId(ckpt, conf)
    assert(GraftTopicProvider.checkpointSinkId("file:" + ckpt, conf) == canonical)
    assert(GraftTopicProvider.checkpointSinkId(ckpt + "/", conf) == canonical)

    // non-append output modes are rejected up front
    val err = intercept[Exception] {
      spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "stream_topic").load()
        .groupBy(lit(1)).count()
        .writeStream.format("graft")
        .option("warehouse", whB).option("topic", "fmt_topic")
        .option("checkpointLocation", Files.createTempDirectory("graft-cm").toString)
        .outputMode("complete")
        .start()
    }
    assert(err.getMessage.toLowerCase.contains("append"))
  }
}
