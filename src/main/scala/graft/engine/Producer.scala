package graft.engine

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Producer write path (reference S1-S6): validate → select partition →
 * assign dense per-partition EventIDs → append Parquet.
 *
 * ID assignment is the port of the reference's linearization contract
 * (`/root/reference/src/DefaultPartitionManager.cpp:398-409`: ids assigned
 * under a queue lock, appends serialized by one write loop per partition):
 * here every event of a partition flows through ONE window task
 * (`row_number` over a hash-partitioned window), so ids are dense and
 * ordered by producer push order within the partition. N CONCURRENT
 * producers per topic are supported (the reference's many-clients shape,
 * `ProviderImpl.hpp:137-160`): ids are reserved under a brief lock, data
 * writes run unlocked into private staging, and commits apply in
 * reservation order — see Catalog's "concurrent produce intents" section.
 *
 * Scale shape (100 TB): exactly one shuffle of the incoming batch (by target
 * partition — unavoidable: that IS the partitioning operator), plus a cheap
 * map-side-combined count pass to advance the id watermark. Files are
 * bounded via `maxRecordsPerFile` — the analog of the reference's 64 MiB /
 * 1M-event chunk rotation (`DefaultPartitionManager.hpp:29-30`).
 *
 * @param ordering "strict" | "loose" — carried for API parity with the
 *        reference (`include/mofka/MofkaProducer.hpp:37`); both modes funnel
 *        through the same per-partition linearization there
 *        (`MofkaProducer.cpp:72-96`) and here, so behavior is identical.
 */
final class Producer(
    spark: SparkSession,
    catalog: Catalog,
    config: TopicConfig,
    chunkMaxRecords: Long = 1000000L,
    batchSize: Option[Int] = None,
    val ordering: String = "strict") {

  require(ordering == "strict" || ordering == "loose",
    s"ordering must be 'strict' or 'loose', got '$ordering'")

  /** Label the jobs an engine phase launches (guide §1.5) — thread-local,
    * restored so caller descriptions are preserved. */
  private def described[T](desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** Phase wall-clock prints for the dev profiling loop (GRAFT_PROF=1). */
  private val prof = sys.env.contains("GRAFT_PROF")
  private def timed[T](what: String)(body: => T): T =
    if (!prof) body
    else {
      val t0 = System.nanoTime()
      try body
      finally Console.err.println(
        f"[prof] produce.$what ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    }

  private val validator = Validator.fromDescriptor(config.validator)
  private val selector = PartitionSelector.fromDescriptor(config.selector)
  private val serializer = Serializer.fromDescriptor(config.serializer)
  private val n = config.partitions

  /** Per-partition (firstId, count) ranges assigned by a produce call. */
  type ProduceResult = Map[Int, (Long, Long)]

  /**
   * Batch produce. `df` must have a `metadata` string column; optional
   * `data` binary column; optional `partition` int column (explicit request,
   * honored modulo the partition count); optional `__order` long column —
   * when present, per-partition id assignment follows it instead of input
   * row order, so a caller with a natural order key can pass the batch
   * UNSORTED and skip a global sort exchange (see stageAndCount). `__order`
   * is consumed by the produce and never written to the log.
   *
   * Invalid metadata (validator predicate false) aborts the job via
   * `raise_error` — the Spark analog of `Producer.push` throwing
   * (`MofkaProducer.cpp:69`).
   */
  def produce(df: DataFrame): ProduceResult = {
    // CONCURRENT-SAFE plain produce (the reservation-intent protocol —
    // see Catalog's "concurrent produce intents" section): the produce
    // lock is held only for the id reservation and the ordered commit;
    // the expensive phases (validation/checkpoint/count, then the data
    // write into a private staging dir) run unlocked, so N producers
    // ingest one topic in parallel — the reference's many-clients-per-
    // partition shape (ProviderImpl.hpp:137-160).
    val (staged, counts) = timed("stageAndCount")(stageAndCount(df))
    // drain courtesy: an exclusive statement actively draining pauses
    // this produce's NEW reservation (liveness only — see
    // [[Catalog.awaitDrainRequestClear]]; commits never pause, so
    // in-flight intents finish and the drain completes in ~1 batch).
    // An empty batch reserves nothing and cannot starve the gate — no
    // reason to make it wait out a drain.
    if (counts.nonEmpty) catalog.awaitDrainRequestClear(config.name)
    // phase 1 (brief lock): entry hygiene + id reservation
    val reserved: Option[(String, Map[Int, Long])] = timed("reserve") {
      catalog.acquireProduceLock(config.name, catalog.briefLockWaitMs)
      try {
        // decide any crashed transactional/idempotent/concurrent intent
        // before this produce can re-issue ids
        catalog.reconcileProduceState(config.name): Unit
        catalog.failIfCompacting(config.name)
        catalog.purgeUncommitted(config.name)
        if (counts.isEmpty) None else Some(catalog.reserveProduce(config.name, counts))
      } finally catalog.releaseProduceLock(config.name)
    }
    reserved match {
      case None => Map.empty
      case Some((intentId, firstIds)) =>
        try {
          // phase 2 (no lock): the data write, into this intent's private
          // staging dir; a heartbeat keeps the lease fresh however long
          // the Spark job runs
          val hb = catalog.startIntentHeartbeat(config.name, intentId)
          try timed("write")(writeEvents(staged, firstIds,
            catalog.produceStagingDir(config.name, intentId).toString))
          finally { hb.interrupt(); hb.join(1000) }
          // phase 3 (brief lock, ordered): rename into the log + commit
          timed("commit")(
            catalog.commitProduceIntent(config.name, intentId, firstIds, counts))
          counts.map { case (p, c) => p -> (firstIds(p), c) }
        } catch {
          case t: Throwable =>
            // leave nothing behind: staging + intent go (idempotent
            // against a janitor rollback racing this)
            try catalog.abandonProduceIntent(config.name, intentId)
            catch { case scala.util.control.NonFatal(_) => () }
            throw t
        }
    }
  }

  /** Produce while the CALLER holds the produce lock (and has already
    * reconciled) — the transactional/idempotent surfaces' entry point.
    * `preCommit` fires once this produce's id ranges are fixed but before
    * any data or watermark write: the intent write of the exactly-once
    * crash contract (see [[graft.engine.TxnRange]]'s file Scaladoc). */
  private[engine] def produceHeld(df: DataFrame,
                                  preCommit: ProduceResult => Unit): ProduceResult =
    produceLocked(df, Some(preCommit))

  /** Phase shared by both produce paths (no lock needed): validate,
    * assign partitions, checkpoint the assignment, count per partition. */
  private def stageAndCount(df: DataFrame): (DataFrame, Map[Int, Long]) = {
    require(df.columns.contains("metadata"), "produce() input needs a 'metadata' column")
    val withData =
      if (df.columns.contains("data")) df
      else df.withColumn("data", lit(null).cast(BinaryType))
    val requested =
      if (df.columns.contains("partition")) col("partition").cast("int")
      else lit(null).cast("int")

    // Validation is fused into the partition expression so it cannot be
    // pruned away and costs no extra pass.
    val valid = validator.predicate(col("metadata"))
    val assigned = coalesce(
      selector.assign(col("metadata"), requested, n),
      pmod(monotonically_increasing_id(), lit(n)).cast("int"))
    val partitionExpr = when(valid, assigned).otherwise(
      raise_error(concat(lit("Invalid metadata rejected by validator: "),
        col("metadata"))).cast("int"))

    // __ord and the round-robin fallback in __p embed
    // monotonically_increasing_id, which is non-deterministic across jobs:
    // the count pass and the write pass MUST observe identical assignments
    // or id ranges gap/collide. localCheckpoint materializes the assignment
    // exactly once and truncates lineage, so re-evaluation (AQE re-plan,
    // task retry against a shuffled/sampled upstream) is impossible; a lost
    // cached block fails the job loudly instead of silently corrupting the
    // id space. Batches are micro-batch sized, so the cached copy is bounded.
    //
    // Explicit push order (r17, guide §2.4 "remove shuffles outright"): a
    // caller column named `__order` (cast to long) REPLACES input row order
    // as the id-assignment order. Without it, a caller that needs
    // deterministic ids must globally SORT its batch — a range exchange
    // (plus its sample pass) per produce whose only purpose is to define
    // `__ord`; with it, the unsorted batch flows straight into staging and
    // the per-partition write window orders by the column instead. Values
    // should be unique per target partition for a well-defined order (ties
    // fall back to the checkpointed block order, which the eager
    // localCheckpoint pins — still deterministic for this produce's two
    // passes). The column is consumed here: it never reaches the log.
    val ordExpr =
      if (withData.columns.contains("__order")) {
        // Fail fast on a misused `__order` (ADVICE r17): a non-numeric
        // column would cast to null long and silently scramble id order
        // (nulls-first, tie-arbitrary) — require a numeric type, and raise
        // on a null value (a null has no defined position).
        val dt = withData.schema("__order").dataType
        require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
          s"produce() column '__order' must be numeric (it defines " +
          s"id-assignment order); got ${dt.simpleString}")
        coalesce(col("__order").cast("long"),
          raise_error(lit("produce() column '__order' must not be null: " +
            "it defines id-assignment order")).cast("long"))
      } else monotonically_increasing_id()
    val pre = withData
      .withColumn("__ord", ordExpr)
      .withColumn("__p", partitionExpr)

    // Pass 1 fused into the checkpoint (guide §1.2 "don't compute things
    // twice" / §2.4 "remove passes outright"): the per-partition incoming
    // counts ride the checkpoint materialization as OBSERVED metrics
    // (`__p` is always in [0, n), so n conditional counts cover the space),
    // instead of a second job over the checkpointed blocks. Observed
    // metrics only aggregate successfully-completed tasks, so a task retry
    // cannot double-count. The eager checkpoint stays the validation
    // barrier: bad rows throw there. Topics wide enough that n conditional
    // aggregates per row would outweigh a cheap map-side-combined second
    // pass keep the two-job path.
    // second-pass fallback (wide topics, or an observation the listener bus
    // failed to deliver): the original map-side-combined count job
    def countPass(staged: DataFrame): Map[Int, Long] =
      described(s"graft produce ${config.name}: count") {
        timed("stage.count") {
          staged.groupBy(col("__p")).count()
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        }
      }
    if (n <= Producer.FusedCountMaxPartitions) {
      val obs = org.apache.spark.sql.Observation()
      val aggs = (0 until n).map(i =>
        count(when(col("__p") === i, 1)).as(s"p$i"))
      val staged = described(s"graft produce ${config.name}: stage+count (checkpoint)") {
        timed("stage.checkpoint") {
          graft.Checkpoints.local(
            pre.observe(obs, aggs.head, aggs.tail: _*), eager = true)
        }
      }
      // Bounded wait on the listener bus (it delivers the observed row
      // asynchronously, normally within ms of the checkpoint action); an
      // undelivered observation (bus overflow — never seen in practice)
      // degrades to the second-pass count job rather than blocking the
      // produce.
      val m: Map[String, Any] = timed("stage.count") {
        val rowOpt =
          try {
            scala.concurrent.Await.ready(obs.future,
              scala.concurrent.duration.Duration(10, "s")): Unit
            obs.future.value.flatMap(_.toOption)
          } catch { case _: java.util.concurrent.TimeoutException => None }
        rowOpt.map(r => r.schema.fieldNames.zip(r.toSeq).toMap)
          .getOrElse(Map.empty)
      }
      val counts: Map[Int, Long] =
        if (m.isEmpty) countPass(staged)
        else (0 until n).flatMap { i =>
          val c = m(s"p$i").asInstanceOf[Long]
          if (c > 0) Some(i -> c) else None
        }.toMap
      (staged, counts)
    } else {
      val staged = described(s"graft produce ${config.name}: stage (checkpoint)") {
        timed("stage.checkpoint")(graft.Checkpoints.local(pre, eager = true))
      }
      (staged, countPass(staged))
    }
  }

  /** Pass 2: one shuffle by target partition; a single window task per
    * partition linearizes id assignment (dense, push-order). `dest` is the
    * live log (lock-held path) or a private staging dir (concurrent path).
    *
    * Single-job shape (r18, guide §1.2 — fewer driver plan/submit cycles):
    * the write runs as ONE classic pipelined shuffle job on a cached
    * AQE-free child session, with the exchange width pinned to the topic's
    * partition count by an explicit `repartition(n, __p)`. Under AQE this
    * exact query cost TWO jobs (exchange materialization, then the re-planned
    * write) plus a re-optimization cycle per produce — pure per-produce
    * overhead at any batch size, since AQE has nothing to decide here: the
    * exchange is by `__p` and the linearization contract already fixes the
    * layout at one writer task per topic partition (AQE skew-splitting
    * cannot apply under a window partitioned by the same key, and coalescing
    * tiny partitions only re-merges what `n` already bounds). The window
    * reuses the explicit exchange (ClusteredDistribution(__p) is satisfied
    * by hashpartitioning(__p, n)), so the whole query is map-stage →
    * sorted-write-stage in a single job submission. */
  private def writeEvents(staged: DataFrame, firstIds: Map[Int, Long],
                          dest: String): Unit = {
    val baseMap = typedLit(firstIds)
    val w = Window.partitionBy(col("__p")).orderBy(col("__ord"))
    // `staged` is an eagerly checkpointed LogicalRDD: re-wrapping its RDD in
    // the write session triggers no job and no recompute, and the id
    // assignment stays pinned to the checkpointed blocks either way.
    val events = Producer.inWriteSession(spark, staged)
      .repartition(n, col("__p"))
      .withColumn("event_id",
        element_at(baseMap, col("__p")) + row_number().over(w) - 1)
      .select(col("__p").as("partition"), col("event_id"),
        serializer.serialize(col("metadata")).cast(StringType).as("metadata"),
        col("data").cast(BinaryType))
    described(s"graft produce ${config.name}: write") {
      events.write
        .mode("append")
        .option("maxRecordsPerFile", chunkMaxRecords)
        .partitionBy("partition")
        .parquet(dest)
    }
  }

  private def produceLocked(df: DataFrame,
                            preCommit: Option[ProduceResult => Unit]): ProduceResult = {
    // refuse to append while a live compaction holds the topic — a produce
    // racing the swap window would land in the moved-aside log (data loss)
    catalog.failIfCompacting(config.name)
    // crash hygiene: a previous produce that died between its parquet write
    // and its id commit left files above the watermark — delete them before
    // this produce re-assigns those ids (see Catalog.purgeUncommitted)
    catalog.purgeUncommitted(config.name)
    val (staged, counts) = stageAndCount(df)
    val base = catalog.nextIds(config.name)
    val firstIds: Map[Int, Long] =
      counts.map { case (p, _) => p -> base.getOrElse(p, 0L) }
    val ranges: ProduceResult = counts.map { case (p, c) => p -> (firstIds(p), c) }

    // intent write for the exactly-once surfaces: ranges are fixed, nothing
    // is committed yet — a crash from here on is decidable against the
    // watermark (Catalog.reconcileProduceState)
    preCommit.foreach(_(ranges))

    if (counts.nonEmpty) {
      writeEvents(staged, firstIds, catalog.logPath(config.name))

      // The write job above may have run for minutes — re-check the compact
      // lock before committing, so a compaction that started mid-produce
      // fails this commit loudly (the written files may sit in the
      // moved-aside log) instead of advancing watermarks over lost data.
      catalog.failIfCompacting(config.name)

      // Manifest BEFORE the id-watermark commit: register this produce's new
      // chunk files (+footer ranges) so trigger planning is O(new files),
      // never a full directory re-list. The manifest write is the COMMIT
      // POINT: a crash between the two writes leaves the manifest watermark
      // ahead of _ids.json, and the next write-path entry heals the id
      // watermark forward to it (reconcileProduceState) so the committed
      // ids are never re-issued.
      val advanced = base ++ counts.map { case (p, c) => p -> (firstIds(p) + c) }
      catalog.updateManifest(config.name,
        counts.map { case (p, _) => p -> advanced(p) })
      catalog.writeNextIds(config.name, advanced)
    }
    // (the checkpointed blocks are released by the ContextCleaner once this
    // frame goes out of scope — no explicit unpersist hook exists for
    // localCheckpoint, and batches are bounded anyway)
    ranges
  }

  // -- buffered push/flush (reference S1/S2 parity surface) -----------------

  /** A pushed event whose id resolves at the next flush (the reference's
    * `Future<EventID>`, `MofkaProducer.cpp:54-67`). */
  final class PendingEvent private[Producer] (
      private[Producer] val partition: Int,
      private[Producer] val seqInPartition: Long) {
    private[Producer] var assigned: Option[Long] = None
    def isCompleted: Boolean = assigned.isDefined
    /** The assigned EventID; throws if flush() has not run yet. */
    def eventId: Long = assigned.getOrElse(
      throw new IllegalStateException("event id not assigned yet — call flush()"))
  }

  private val buffer = ArrayBuffer.empty[(String, Array[Byte], Int, PendingEvent)]

  private var rrCounter = 0L
  private val perPartitionSeq = scala.collection.mutable.Map.empty[Int, Long]

  /** S1 `push` — buffers locally; partition chosen eagerly client-side
    * (explicit request honored mod n, else round-robin / metadata hash). */
  def push(metadata: String, data: Array[Byte] = null,
           partition: Option[Int] = None): PendingEvent = synchronized {
    val p = partition match {
      case Some(req) => math.floorMod(req, n)
      case None => selector match {
        case mh: PartitionSelector.MetadataHash =>
          // same partition as produce()'s distributed assign — co-location
          // holds across both API surfaces
          mh.partitionFor(metadata, n)
        case fm: PartitionSelector.FieldMod =>
          // same catalyst extraction+cast as produce()'s distributed path;
          // missing/malformed key → the SAME round-robin fallback produce()
          // applies to null assignments
          fm.keyFor(metadata, n).getOrElse {
            val p = (rrCounter % n).toInt; rrCounter += 1; p
          }
        case _ =>
          val p = (rrCounter % n).toInt; rrCounter += 1; p
      }
    }
    val seq = perPartitionSeq.getOrElse(p, 0L)
    perPartitionSeq(p) = seq + 1
    val pending = new PendingEvent(p, seq)
    buffer += ((metadata, data, p, pending))
    // S3 micro-batching: a fixed batch size auto-flushes a full buffer (the
    // reference's ActiveProducerBatchQueue fixed mode); None = adaptive —
    // everything goes out on the next explicit flush(), like BatchSize::
    // Adaptive funneling into whatever batch is open.
    batchSize.foreach { n => if (buffer.size >= n) flush() }
    pending
  }

  /** S2 `flush` — drains the buffer as one produce() batch and resolves all
    * pending EventIDs. */
  def flush(): Unit = synchronized {
    if (buffer.isEmpty) return
    val rows = buffer.toSeq.map { case (md, data, p, _) => (md, data, p) }
    import spark.implicits._
    val df = rows.toDF("metadata", "data", "partition")
    val ranges = produce(df)
    buffer.foreach { case (_, _, p, pending) =>
      pending.assigned = Some(ranges(p)._1 + pending.seqInPartition)
    }
    buffer.clear()
    perPartitionSeq.clear()
  }

}

object Producer {
  /**
   * One AQE-free child session per engine session, for the produce WRITE
   * query only (see writeEvents). `newSession()` shares the SparkContext,
   * cached blocks and extensions; only the SQL conf is isolated — adaptive
   * execution off so the bounded write query plans and submits exactly once.
   * Cached weakly per parent session: the session-state build is paid once
   * per engine session, not once per produce, and entries die with their
   * parent. Thread-safe: concurrent produces run concurrent queries on the
   * shared child, which Spark sessions support by design.
   */
  private val writeSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]()
  private def writeSession(parent: SparkSession): SparkSession =
    writeSessions.synchronized {
      var ws = writeSessions.get(parent)
      if (ws == null) {
        ws = parent.newSession()
        ws.conf.set("spark.sql.adaptive.enabled", "false")
        // runtime conf set on the parent post-creation is not inherited;
        // restate the one conf the engine requires everywhere (hygiene —
        // the write plan itself is timezone-free)
        ws.conf.set("spark.sql.session.timeZone", "UTC")
        writeSessions.put(parent, ws)
      }
      ws
    }

  /** Re-bind a (checkpointed) frame to the write session — same RDD, same
    * schema, no job. */
  private[engine] def inWriteSession(parent: SparkSession,
                                     df: DataFrame): DataFrame =
    org.apache.spark.sql.graftshim.Shims.asBatchDataFrame(
      writeSession(parent), df)

  /** Widest topic for which the fused observed-metrics count pass is used:
    * the fused path evaluates one conditional count per topic partition per
    * row DURING the checkpoint, which beats a whole second job/pass over
    * the staged blocks for any realistic partition count; far past this
    * width the per-row branch chain would dominate and the map-side-
    * combined second pass wins. */
  private[engine] val FusedCountMaxPartitions = 256
}
