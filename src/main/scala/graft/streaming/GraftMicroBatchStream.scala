package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types.StructType

import graft.engine.Catalog

/**
 * Streaming offset: next-unread EventID per partition — exactly the
 * reference's per-consumer cursor state
 * (`/root/reference/src/DefaultPartitionManager.hpp:214-215`).
 */
final case class TopicOffset(next: Map[Int, Long]) extends Offset {
  override def json(): String = Catalog.idMapToJson(next)
}

object TopicOffset {
  def fromJson(json: String): TopicOffset = TopicOffset(Catalog.idMapFromJson(json))
}

/**
 * The `feedConsumer` cursor walk (`DefaultPartitionManager.cpp:415-504`) as
 * a `MicroBatchStream`:
 *
 *  - offsets = per-partition next id; each micro-batch covers
 *    `[start(p), end(p))` per partition;
 *  - admission control (`SupportsAdmissionControl`) bounds a batch to
 *    `maxEventsPerTrigger` events, advancing partitions round-robin-fairly —
 *    the reference's adaptive feed batch (S3/S8);
 *  - `Trigger.AvailableNow` (`SupportsTriggerAvailableNow`) latches the
 *    watermark at start and terminates when drained — the NoMoreEvents
 *    end-of-stream contract (D5) for completed topics.
 */
final class GraftMicroBatchStream(
    catalog: Catalog, topic: String, consumer: Option[String],
    targets: Option[Set[Int]], requiredSchema: StructType,
    maxEventsPerTrigger: Option[Long],
    serializerJson: String = """{"type":"json"}""")
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private var availableNowTarget: Option[TopicOffset] = None
  /** chunk files are immutable — footer ranges cached for the stream's life */
  private val fileStats = new FileStatsCache

  private def currentNext(): Map[Int, Long] = {
    val next = catalog.nextIds(topic)
    targets match {
      case Some(t) => next.view.filterKeys(t.contains).toMap
      case None => next
    }
  }

  override def initialOffset(): Offset = {
    val acked = consumer.map(c => catalog.cursor(topic, c)).getOrElse(Map.empty)
    TopicOffset(currentNext().keys.map(p => p -> acked.getOrElse(p, 0L)).toMap)
  }

  override def deserializeOffset(json: String): Offset = TopicOffset.fromJson(json)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(TopicOffset(currentNext()))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    maxEventsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.map(_.next).getOrElse(currentNext())
    val from = start.asInstanceOf[TopicOffset].next
    val capped = limit match {
      case rows: ReadMaxRows =>
        // fair budget split: rounds of equal chunks over partitions that
        // still have backlog, with the visit order ROTATED per batch (keyed
        // off the advancing start offsets) — so even a budget smaller than
        // the partition count cannot starve high-id partitions forever
        var budget = rows.maxRows()
        val parts = target.keys.toSeq.sorted
        val rotation =
          if (parts.isEmpty) 0
          else math.floorMod(from.values.sum, parts.size.toLong).toInt
        val visitOrder = parts.drop(rotation) ++ parts.take(rotation)
        val backlog = scala.collection.mutable.Map(
          target.toSeq.map { case (p, end) =>
            p -> math.max(end - from.getOrElse(p, 0L), 0L)
          }: _*)
        val taken = scala.collection.mutable.Map(backlog.keys.map(_ -> 0L).toSeq: _*)
        while (budget > 0 && backlog.values.exists(_ > 0)) {
          val active = backlog.count(_._2 > 0)
          val chunk = math.max(budget / active, 1L)
          visitOrder.foreach { p =>
            val rem = backlog(p)
            if (rem > 0 && budget > 0) {
              val take = math.min(math.min(rem, chunk), budget)
              taken(p) += take
              backlog(p) = rem - take
              budget -= take
            }
          }
        }
        taken.map { case (p, t) => p -> (from.getOrElse(p, 0L) + t) }.toMap
      case _ => target
    }
    TopicOffset(capped.map { case (p, v) => p -> math.max(v, from.getOrElse(p, 0L)) })
  }

  override def reportLatestOffset(): Offset = TopicOffset(currentNext())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TopicOffset].next
    val e = end.asInstanceOf[TopicOffset].next
    GraftPartitions.plan(catalog, topic, targets,
      from = p => s.getOrElse(p, 0L),
      until = p => e.getOrElse(p, 0L),
      Some(fileStats))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(requiredSchema, catalog.hadoopConf, serializerJson)

  /** Offsets are checkpoint-managed by Spark; the engine-level acknowledge
    * cursor stays an explicit consumer API call (at-least-once contract). */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/**
 * Driver-side cache of per-file `event_id` footer ranges. Chunk files are
 * immutable once written, so a range read once is valid forever; a stream
 * pays one footer read per NEW file per lifetime, and fully-acked tail-read
 * slices ship only the files that overlap the cursor range — the file-level
 * analog of the reference's chunk index
 * (`/root/reference/src/DefaultPartitionManager.cpp:682-735`).
 */
final class FileStatsCache {
  private val ranges = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** (min, max) event_id of the file, from its footer. The cache is
    * size-bounded: past the cap it resets and repopulates on demand (a
    * months-long stream over millions of rotated chunks must not grow
    * driver heap without bound). */
  def range(path: String, conf: org.apache.hadoop.conf.Configuration): (Long, Long) = {
    if (ranges.size() > FileStatsCache.MaxEntries) ranges.clear()
    ranges.computeIfAbsent(path, { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(p), conf))
      try {
        var lo = Long.MaxValue
        var hi = Long.MinValue
        reader.getRowGroups.forEach { block =>
          block.getColumns.forEach { c =>
            if (c.getPath.toDotString == "event_id") c.getStatistics match {
              case ls: org.apache.parquet.column.statistics.LongStatistics
                if ls.hasNonNullValue =>
                lo = math.min(lo, ls.getMin); hi = math.max(hi, ls.getMax)
              case _ =>
            }
          }
        }
        if (lo > hi) (Long.MinValue, Long.MaxValue) // no stats: never prune
        else (lo, hi)
      } finally reader.close()
    })
  }
}

object FileStatsCache {
  val MaxEntries = 200000
}

/** Shared partition planning: one input slice per topic partition holding
  * the partition's OVERLAPPING chunk files (file-level pruning via the
  * footer-stats cache; the reader then prunes at row-group granularity). */
object GraftPartitions {
  /** @param stats when set, prune files by footer event_id ranges; pass
    *        None when nothing can be pruned (e.g. unbounded batch scans) —
    *        footer reads on the driver are not free. */
  def plan(catalog: Catalog, topic: String, targets: Option[Set[Int]],
           from: Int => Long, until: Int => Long,
           stats: Option[FileStatsCache] = None): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val logPath = new Path(catalog.logPath(topic))
    val fs = logPath.getFileSystem(conf)
    if (!fs.exists(logPath)) {
      // A missing log dir is only legitimate when the id watermark says no
      // events were ever committed. Otherwise fail LOUDLY: silently planning
      // zero slices would let a streaming checkpoint commit past events that
      // were never read (e.g. a reader racing compactTopic's rename window,
      // or an accidentally deleted log) — permanent data loss.
      val expected = (0 until catalog.openTopic(topic).partitions)
        .filter(p => targets.forall(_.contains(p)))
        .exists(p => until(p) > math.max(from(p), 0L))
      if (expected) throw new java.io.IOException(
        s"topic '$topic': log directory missing but the id watermark expects " +
        s"events ($logPath) — log deleted, or read raced a compactTopic swap")
      return Array.empty
    }
    val partDirs = fs.listStatus(logPath).filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { dir =>
        dir.getName.split('=') match {
          case Array("partition", p) => Some(p.toInt -> dir)
          case _ => None
        }
      }
      .filter { case (p, _) => targets.forall(_.contains(p)) }
    partDirs.flatMap { case (p, dir) =>
      val lo = from(p); val hi = until(p)
      if (hi <= lo) None
      else {
        val files = fs.listStatus(dir)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString).sorted
          .filter { f =>
            stats.forall { cache =>
              val (fLo, fHi) = cache.range(f, conf)
              fHi >= lo && fLo < hi
            }
          }
        if (files.isEmpty) None
        else Some(GraftInputPartition(p, lo, hi, files))
      }
    }.sortBy(_.partition).toArray
  }
}

final case class GraftInputPartition(
    partition: Int, fromId: Long, untilId: Long, files: Seq[String])
  extends InputPartition
