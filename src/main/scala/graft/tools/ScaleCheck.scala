package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.GraftDriver
import graft.streaming.GraftPartitions

/**
 * Committed scale harness (VERDICT r14 #5): the empirical backing for the
 * engine's 100-TB design claims. Two axes:
 *
 *  1. DATA-PLANE 10x: build the same topic shape at 1x (60k rows) and 10x
 *     (600k rows) — 8 bulk commits, one FIXED 5k-row tail commit, one open
 *     transaction — and measure every incremental surface. The contract:
 *     version-diff reads, streaming tail drains, transaction-exclusion
 *     planning, and maintenance cost O(new work), independent of topic
 *     size; only the deliberately full-scan operations may grow.
 *  2. METADATA-PLANE 100x: a topic whose manifest holds thousands of file
 *     entries IN RELATION MODE (`spark.graft.manifest.driverMaxEntries=0`,
 *     the posture a 100k-file topic is forced into) plus ~1k transaction
 *     records, asserting the produce path stays O(new files) and
 *     exclusion resolution O(records).
 *
 * Counter-based invariants are hard asserts (planned exclusion ranges,
 * streaming probePlannedEntries, version-diff row counts); wall-clock
 * numbers are REPORTED as a STATUS-ready markdown table (they vary with
 * machine load — the counters are the scale proof, the times the color).
 *
 * Run: `sbt -batch "runMain graft.tools.ScaleCheck"` (~4 min, local[32]).
 * Naming axes limits the run: `... 1 10 data` (data axis only, which also
 * runs the concurrent-ingest axis), `... meta`, `... mixed` (the
 * mixed-workload soak alone), or any combination.
 */
object ScaleCheck {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  final case class Row(surface: String, value: String, seconds: Double)

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate()
    val scales = args.toSeq.filter(_.forall(_.isDigit)).map(_.toInt) match {
      case Nil => Seq(1, 10)
      case s => s
    }
    val axes = {
      val named = Seq("data", "meta", "mixed").filter(args.contains)
      if (named.isEmpty) Seq("data", "meta", "mixed") else named
    }

    // deep warm-up: JIT + codegen + parquet paths, outside every timing
    spark.range(100000).selectExpr("sum(id)").collect(): Unit

    if (axes.contains("data")) {
      val results: Seq[(Int, Seq[Row])] = scales.map(s => s -> dataAxis(spark, s))
      println("\n## ScaleCheck: data-plane " +
        scales.map(s => s"${s}x").mkString(" vs "))
      val surfaces = results.head._2.map(_.surface)
      println("| surface | " + scales.map(s => s"${s}x").mkString(" | ") + " |")
      println("|---|" + scales.map(_ => "---").mkString("|") + "|")
      surfaces.foreach { sf =>
        val cells = results.map { case (_, rows) =>
          val r = rows.find(_.surface == sf).get
          f"${r.seconds}%.2fs (${r.value})"
        }
        println(s"| $sf | " + cells.mkString(" | ") + " |")
      }
      // hard invariants: the incremental surfaces must be scale-FREE
      def row(scale: Int, sf: String): Row =
        results.find(_._1 == scale).get._2.find(_.surface == sf).get
      for (s <- scales.drop(1); sf <- Seq("exclusion ranges planned",
          "version-diff rows", "stream probed entries")) {
        val (a, b) = (row(scales.head, sf), row(s, sf))
        assert(a.value == b.value,
          s"NOT FLAT at ${s}x: $sf was ${a.value} at ${scales.head}x, ${b.value} at ${s}x")
      }
      println("data-plane invariants hold: exclusion planning, version-diff " +
        "rows, and streaming probe counts are identical across scales")
    }

    if (axes.contains("meta")) metaAxis(spark)
    if (axes.contains("data")) concurrentAxis(spark)
    if (axes.contains("mixed")) mixedAxis(spark)
    spark.stop()
  }

  /** Mixed-workload protocol soak (VERDICT r16 #5): steady writers + ONE
    * exclusive statement (transactional produce) + a continuous streaming
    * reader, concurrently on one topic. The writers run WITHOUT PAUSE
    * through the exclusive statement's whole attempt and stop only after
    * it returns — so what the admission assert probes is draining-gate
    * starvation against a steady intent stream, not merely contention
    * that resolves when the writers happen to finish. Hard asserts:
    *  - the exclusive statement is admitted within its (compressed)
    *    patience while writers keep reserving;
    *  - every mid-flight read_committed batch read is
    *    watermark-consistent: per partition, count == distinct ids ==
    *    max+1 (a dense committed prefix — never a torn commit, never a
    *    half-visible reservation);
    *  - the streaming reader delivers every committed row EXACTLY once
    *    (no duplicates across micro-batches, final count exact);
    *  - final ids are dense per partition and no gap marker is left. */
  private def mixedAxis(spark: org.apache.spark.sql.SparkSession): Unit = {
    val partitions = 4
    val wh = java.nio.file.Files.createTempDirectory("graft-scale-mixed").toString
    val d = new GraftDriver(spark, wh)
    d.createTopic("m", partitions = partitions)
    val topic = d.openTopic("m")
    def batch(n: Long, tag: String) = spark.range(n)
      .select(to_json(struct(col("id").as("eid"), lit(tag).as("t"))).as("metadata"),
        pmod(col("id"), lit(partitions)).cast("int").as("partition"))
    topic.producer().produce(batch(1000L, "warm")): Unit // JIT/codegen warm
    val exclusivePatienceMs = 45000L
    d.catalog.setConfOverride("spark.graft.produce.commitWaitMs",
      exclusivePatienceMs.toString)
    try {
      val stopWriters = new java.util.concurrent.atomic.AtomicBoolean(false)
      val writerBatches = new java.util.concurrent.atomic.AtomicLong(0L)
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val writers = (0 until 3).map { w =>
        val t = new Thread(() => {
          try while (!stopWriters.get()) {
            topic.producer().produce(batch(6000L, s"w$w")): Unit
            writerBatches.incrementAndGet(): Unit
          } catch { case t: Throwable => err.compareAndSet(null, t): Unit }
        }, s"mixed-writer-$w")
        t.setDaemon(true); t
      }
      // continuous streaming reader: exactly-once delivery across batches
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Long)]()
      val dupes = new java.util.concurrent.atomic.AtomicLong(0L)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-mixed-ckpt").toString
      val q = spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "m").load()
        .select(col("partition"), col("event_id"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         _: Long) =>
          b.collect().foreach { r =>
            if (!seen.add((r.getInt(0), r.getLong(1))))
              dupes.incrementAndGet(): Unit
          }
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .start()
      // watermark-consistency poller on the batch read path
      val pollErr = new java.util.concurrent.atomic.AtomicReference[String]()
      val polls = new java.util.concurrent.atomic.AtomicLong(0L)
      val stopPoll = new java.util.concurrent.atomic.AtomicBoolean(false)
      val poller = new Thread(() => {
        try while (!stopPoll.get() && pollErr.get() == null) {
          topic.events("read_committed").groupBy(col("partition"))
            .agg(count(lit(1)).as("cnt"),
              countDistinct(col("event_id")).as("ids"),
              max(col("event_id")).as("hi"))
            .collect().foreach { r =>
              val (cnt, ids, hi) = (r.getAs[Long]("cnt"),
                r.getAs[Long]("ids"), r.getAs[Long]("hi"))
              if (!(cnt == ids && hi == cnt - 1))
                pollErr.compareAndSet(null, s"partition ${r.get(0)}: torn " +
                  s"committed read (cnt=$cnt ids=$ids hi=$hi)"): Unit
            }
          polls.incrementAndGet(): Unit
          Thread.sleep(400)
        } catch {
          case _: InterruptedException => ()
          case t: Throwable =>
            pollErr.compareAndSet(null, s"poller died: ${t.getMessage}"): Unit
        }
      }, "mixed-poller")
      poller.setDaemon(true)
      writers.foreach(_.start()); poller.start()
      Thread.sleep(2500) // writers provably mid-stream
      val (_, exclusiveWall) = time {
        val x = topic.beginTransaction("x")
        x.produce(batch(4000L, "x")): Unit
        x.commit()
      }
      Thread.sleep(1500) // writers keep going after the exclusive, too
      stopWriters.set(true)
      writers.foreach(_.join(120000))
      if (err.get() != null) throw err.get()
      val total = 1000L + writerBatches.get() * 6000L + 4000L
      // let the stream drain to the final watermark, then stop everything
      val drainDeadline = System.currentTimeMillis() + 120000L
      while (seen.size() < total && System.currentTimeMillis() < drainDeadline)
        Thread.sleep(250)
      q.stop(); stopPoll.set(true); poller.join(30000)
      if (pollErr.get() != null)
        throw new AssertionError("mixed axis: " + pollErr.get())
      println("\n## ScaleCheck: mixed workload (3 steady writers + exclusive txn + streaming reader)")
      println("| metric | value |")
      println("|---|---|")
      println(f"| exclusive admission + commit under steady writers | $exclusiveWall%.2fs (patience ${exclusivePatienceMs / 1000}s) |")
      println(s"| writer batches committed | ${writerBatches.get()} (x6000 rows) |")
      println(s"| consistency polls, all dense | ${polls.get()} |")
      println(s"| stream rows delivered | ${seen.size()} of $total (dupes=${dupes.get()}) |")
      assert(exclusiveWall < exclusivePatienceMs / 1000.0,
        f"exclusive statement starved: $exclusiveWall%.1fs under steady writers")
      assert(polls.get() >= 5L, "the poller must have sampled mid-flight states")
      assert(dupes.get() == 0L, s"stream delivered ${dupes.get()} duplicate rows")
      assert(seen.size() == total,
        s"stream delivered ${seen.size()} of $total committed rows")
      val ev = topic.events()
      assert(ev.count() == total, "final count")
      val perPart = ev.groupBy(col("partition"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("event_id")).as("ids"),
          max(col("event_id")).as("hi")).collect()
      perPart.foreach { r =>
        assert(r.getAs[Long]("cnt") == r.getAs[Long]("ids") &&
          r.getAs[Long]("hi") == r.getAs[Long]("cnt") - 1,
          s"final ids not dense on partition ${r.get(0)}")
      }
      assert(!d.catalog.mayHaveIdGaps("m"),
        "all-committed mixed workload must leave no gap marker")
      println("mixed-workload invariants hold: bounded exclusive admission, " +
        "dense committed reads throughout, exactly-once stream delivery")
    } finally d.catalog.clearConfOverride("spark.graft.produce.commitWaitMs")
  }

  /** N writers ≈ parallel, not N× serial: the same N batches produced
    * back-to-back by one writer vs concurrently by N threads (fresh
    * topics, same shape), at N = 2 / 4 / 8 — the axis where head-of-line
    * blocking in the ORDERED commit would first show (a slow predecessor
    * stalls every later reservation's commit; the data phases must still
    * overlap). Wall-clock is REPORTED (machine-load dependent); the HARD
    * asserts are the q_producer_multi invariants at every N: exact row
    * count, per-partition ids dense from 0 (distinct = count = max+1),
    * zero duplicates, and no gap marker (every commit applied, none
    * gap-advanced). */
  private def concurrentAxis(spark: org.apache.spark.sql.SparkSession): Unit = {
    val rows = 75000L // per batch; each writer produces exactly one batch
    val partitions = 4
    def batch(n: Long) = spark.range(n)
      .select(to_json(struct(col("id").as("eid"))).as("metadata"),
        pmod(col("id"), lit(partitions)).cast("int").as("partition"))
    def topic() = {
      val wh = java.nio.file.Files.createTempDirectory("graft-scale-conc").toString
      val d = new GraftDriver(spark, wh)
      d.createTopic("c", partitions = partitions)
      (d, d.openTopic("c"))
    }
    // warm both paths once (JIT/codegen outside the timings)
    { val (_, t) = topic(); t.producer().produce(batch(rows)): Unit }
    println("\n## ScaleCheck: concurrent ingest (N writers vs one writer, same N batches)")
    println("| writers | serial wall | concurrent wall | ratio | rows |")
    println("|---|---|---|---|---|")
    Seq(2, 4, 8).foreach { n =>
      val (_, tS) = topic()
      val (_, serialT) = time {
        (0 until n).foreach(_ => tS.producer().produce(batch(rows)): Unit)
      }
      val (dC, tC) = topic()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val (_, parallelT) = time {
        (0 until n).map { _ =>
          pool.submit(new Runnable {
            override def run(): Unit =
              try tC.producer().produce(batch(rows)): Unit
              catch { case t: Throwable => failed.compareAndSet(null, t): Unit }
          })
        }.foreach(_.get(600, java.util.concurrent.TimeUnit.SECONDS))
      }
      pool.shutdown(): Unit
      if (failed.get() != null) throw failed.get()
      println(f"| $n | $serialT%.2fs | $parallelT%.2fs " +
        f"| ${parallelT / serialT}%.2f | ${n * rows} |")
      // dense gap-free ids — the protocol invariants, not just row count
      val ev = dC.openTopic("c").events()
      val total = n * rows
      assert(ev.count() == total, s"$n writers lost rows")
      val perPart = ev.groupBy(col("partition"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("event_id")).as("n_ids"),
          min(col("event_id")).as("lo"),
          max(col("event_id")).as("hi"))
        .collect()
      assert(perPart.length == partitions)
      perPart.foreach { r =>
        val (cnt, ids, lo, hi) = (r.getAs[Long]("cnt"), r.getAs[Long]("n_ids"),
          r.getAs[Long]("lo"), r.getAs[Long]("hi"))
        assert(cnt == total / partitions && ids == cnt && lo == 0L && hi == cnt - 1,
          s"$n writers: partition ${r.get(0)} ids not dense " +
          s"(cnt=$cnt ids=$ids lo=$lo hi=$hi)")
      }
      assert(!dC.catalog.mayHaveIdGaps("c"),
        s"$n all-committed writers must leave no gap marker")
      if (parallelT >= serialT)
        println(f"WARNING: $n writers were no faster than serial " +
          f"($parallelT%.2fs vs $serialT%.2fs) — machine load, or overlap broke")
    }
  }

  /** One data-axis topic at `scale` (scale=1 → 60k bulk rows): returns the
    * measured surfaces. */
  private def dataAxis(spark: org.apache.spark.sql.SparkSession,
                       scale: Int): Seq[Row] = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-scale-$scale").toString
    val d = new GraftDriver(spark, wh)
    d.createTopic("scale", partitions = 2)
    val topic = d.openTopic("scale")
    def batch(n: Long, tag: String) = spark.range(n)
      .select(to_json(struct(col("id").as("eid"), lit(tag).as("t"))).as("metadata"),
        pmod(col("id"), lit(2)).cast("int").as("partition"))
    (0 until 8).foreach(_ => topic.producer().produce(batch(7500L * scale, "bulk")): Unit)
    val wmBefore = topic.snapshot()
    val vBefore = d.catalog.versionHistory("scale").map(_.version).max
    topic.producer().produce(batch(5000L, "tail")): Unit
    val wmAfter = topic.snapshot()
    // one OPEN transaction: read_committed planning must exclude its ranges
    val open = topic.beginTransaction("open")
    open.produce(batch(100L, "open")): Unit

    val rows = Seq.newBuilder[Row]
    val (n1, t1) = time(topic.events("read_committed").count())
    rows += Row("full read_committed scan", s"n=$n1", t1)
    val (ex, t2) = time(d.catalog.uncommittedTxnRanges("scale").size)
    rows += Row("exclusion ranges planned", ex.toString, t2)
    val (n3, t3) = time(topic.events(wmBefore, wmAfter).count())
    rows += Row("version-diff rows", n3.toString, t3)

    // streaming tail drain: start at the pre-tail version, AvailableNow —
    // planning must touch the TAIL's manifest entries, not the backlog's
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scale-ckpt").toString
    val before = GraftPartitions.probePlannedEntries.get()
    val counted = new java.util.concurrent.atomic.AtomicLong
    val (_, t4) = time {
      val q = spark.readStream.format("graft")
        .option("warehouse", wh).option("topic", "scale")
        .option("startingVersion", vBefore)
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         _: Long) => counted.addAndGet(b.count()): Unit }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(300000)
    }
    rows += Row("streaming tail drain", s"n=${counted.get()}", t4)
    rows += Row("stream probed entries",
      (GraftPartitions.probePlannedEntries.get() - before).toString, 0.0)

    val eid = get_json_object(col("metadata"), "$.eid").cast("long")
    val (matched, t5) = time(topic.deleteWhereVectored(
      eid < 1000L && get_json_object(col("metadata"), "$.t") === "bulk"))
    rows += Row("deleteWhere fixed slice (full-scan match by design)",
      s"matched=$matched", t5)
    val (n6, t6) = time(topic.events("read_committed").count())
    rows += Row("vectored re-read", s"n=$n6", t6)
    val (_, t7) = time(d.catalog.maintainTopic("scale"))
    rows += Row("maintainTopic no-op", "", t7)
    open.abort()
    rows.result()
  }

  /** Metadata-plane axis: relation-mode manifest with thousands of file
    * entries + ~1k transaction records. The at-scale posture is forced
    * (`driverMaxEntries=0`) so every planner runs the relation path a
    * 100k-file topic would. */
  private def metaAxis(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set("spark.graft.manifest.driverMaxEntries", "0")
    try {
      val wh = java.nio.file.Files.createTempDirectory("graft-scale-meta").toString
      val d = new GraftDriver(spark, wh)
      d.createTopic("meta", partitions = 2)
      val topic = d.openTopic("meta")
      def batch(n: Long) = spark.range(n)
        .select(to_json(struct(col("id").as("eid"))).as("metadata"),
          pmod(col("id"), lit(2)).cast("int").as("partition"))
      // ~8k file entries: 4 commits x 16k rows at 8 rows/file
      val (_, tBuild) = time(
        (0 until 4).foreach(_ =>
          topic.producer(chunkMaxRecords = 8).produce(batch(16000L)): Unit))
      val files = d.catalog.readManifest("meta")
        .map(m => d.catalog.manifestFileCounts("meta", m).values.sum).getOrElse(0L)
      // ~1k transaction records: 500 aborted (the exclusion-set worst
      // case), 8 open
      val (_, tTxns) = time {
        (0 until 500).foreach { i =>
          val t = topic.beginTransaction(s"ab$i"); t.abort()
        }
        (0 until 8).foreach { i =>
          topic.beginTransaction(s"op$i").produce(batch(16L)): Unit
        }
      }
      val wmBefore = topic.snapshot()
      // the O(new work) claims, measured against the big-metadata topic:
      val (_, tTail) = time(topic.producer().produce(batch(5000L)))
      val wmAfter = topic.snapshot()
      val (nDiff, tDiff) = time(topic.events(wmBefore, wmAfter).count())
      val (ex, tEx) = time(d.catalog.uncommittedTxnRanges("meta").size)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-meta-ckpt").toString
      val before = GraftPartitions.probePlannedEntries.get()
      val counted = new java.util.concurrent.atomic.AtomicLong
      val (_, tDrain) = time {
        val q = spark.readStream.format("graft")
          .option("warehouse", wh).option("topic", "meta")
          .option("startingVersion",
            d.catalog.versionHistory("meta").map(_.version).sorted.takeRight(2).head)
          .load()
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                           _: Long) => counted.addAndGet(b.count()): Unit }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination(300000)
      }
      val probed = GraftPartitions.probePlannedEntries.get() - before
      println("\n## ScaleCheck: metadata-plane (relation-mode manifest)")
      println("| metric | value |")
      println("|---|---|")
      println(f"| manifest file entries | $files (built in $tBuild%.1fs) |")
      println(f"| transaction records | 508 (built in $tTxns%.1fs) |")
      println(f"| tail produce (5k rows) | $tTail%.2fs |")
      println(f"| version-diff read of the tail | $tDiff%.2fs (n=$nDiff) |")
      println(f"| exclusion resolution | $tEx%.3fs ($ex ranges from 508 records) |")
      println(f"| streaming tail drain | $tDrain%.2fs (n=${counted.get()}, probed=$probed) |")
      assert(files >= 4000L, s"metadata axis built only $files file entries")
      assert(nDiff == 5000L, s"version-diff read returned $nDiff rows, not 5000")
      assert(ex == 16, s"expected 16 open-txn exclusion ranges (8 txns x 2 partitions), got $ex")
      // O(new-files) plan proof: the drain probed the tail's entries, not
      // the thousands of backlog entries
      assert(probed < 200L,
        s"streaming drain probed $probed manifest entries — O(backlog), not O(new)")
    } finally spark.conf.unset("spark.graft.manifest.driverMaxEntries")
  }
}
