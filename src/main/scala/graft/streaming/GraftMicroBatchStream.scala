package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.engine.Catalog

/**
 * Streaming offset: next-unread EventID per partition — exactly the
 * reference's per-consumer cursor state
 * (`/root/reference/src/DefaultPartitionManager.hpp:214-215`).
 */
final case class TopicOffset(next: Map[Int, Long]) extends Offset {
  override def json(): String = JsonMethods.compact(JsonMethods.render(JObject(
    next.toSeq.sortBy(_._1).map { case (k, v) => k.toString -> (JLong(v): JValue) }: _*)))
}

object TopicOffset {
  def fromJson(json: String): TopicOffset = JsonMethods.parse(json) match {
    case JObject(fields) => TopicOffset(fields.map {
      case (k, JInt(v)) => k.toInt -> v.toLong
      case (k, JLong(v)) => k.toInt -> v
      case (k, other) => throw new IllegalStateException(
        s"bad offset entry $k: ${JsonMethods.compact(other)}")
    }.toMap)
    case other => throw new IllegalStateException(
      s"bad offset json: ${JsonMethods.compact(other)}")
  }
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
    maxEventsPerTrigger: Option[Long])
  extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private var availableNowTarget: Option[TopicOffset] = None

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
        // advance partitions fairly until the row budget is spent
        var budget = rows.maxRows()
        target.toSeq.sortBy(_._1).map { case (p, end) =>
          val lo = from.getOrElse(p, 0L)
          val take = math.min(math.max(end - lo, 0L), budget)
          budget -= take
          p -> (lo + take)
        }.toMap
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
      until = p => e.getOrElse(p, 0L))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(requiredSchema)

  /** Offsets are checkpoint-managed by Spark; the engine-level acknowledge
    * cursor stays an explicit consumer API call (at-least-once contract). */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Shared partition planning: one input slice per topic partition holding
  * the partition's file list (with sizes, for future balancing). */
object GraftPartitions {
  def plan(catalog: Catalog, topic: String, targets: Option[Set[Int]],
           from: Int => Long, until: Int => Long): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val logPath = new Path(catalog.logPath(topic))
    val fs = logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logPath)) return Array.empty
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
        val files = fs.listStatus(dir).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString).sorted
        if (files.isEmpty) None
        else Some(GraftInputPartition(p, lo, hi, files))
      }
    }.sortBy(_.partition).toArray
  }
}

final case class GraftInputPartition(
    partition: Int, fromId: Long, untilId: Long, files: Seq[String])
  extends InputPartition
