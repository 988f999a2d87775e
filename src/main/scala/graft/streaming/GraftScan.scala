package graft.streaming

import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType

import graft.engine.Catalog

/**
 * Scan builder with the two pushdowns that carry the reference's physical
 * ideas (SURVEY §4):
 *
 *  - column pruning (`SupportsPushDownRequiredColumns`): the metadata/data
 *    split — a metadata-only consumer never reads payload pages (P1);
 *  - filter pushdown (`SupportsPushDownFilters`) on `partition` (F5
 *    targeting → whole directories skipped) and `event_id` (cursor ranges →
 *    row groups skipped via footer statistics).
 *
 * Pushed filters are used for skipping only; Spark re-applies every filter
 * on the surfaced rows, so acceptance is never a correctness risk.
 */
final class GraftScanBuilder(
    catalog: Catalog, topic: String, consumer: Option[String],
    targets: Option[Seq[Int]], maxEventsPerTrigger: Option[Long],
    startingTime: Option[(String, Long)] = None,
    maxBytesPerTrigger: Option[Long] = None,
    asOfIds: Option[Map[Int, Long]] = None,
    startingIds: Option[Map[Int, Long]] = None)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = GraftTopicTable.EventSchema
  private var pushed: Array[Filter] = Array.empty

  // narrowed by pushed filters
  private var partitionSubset: Option[Set[Int]] = None
  private var idLo: Option[Long] = None // inclusive
  private var idHi: Option[Long] = None // exclusive

  override def pruneColumns(required: StructType): Unit = {
    requiredSchema = StructType(
      GraftTopicTable.EventSchema.filter(f => required.fieldNames.contains(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
      case EqualTo("partition", v: Int) =>
        partitionSubset = Some(intersect(Set(v))); true
      case In("partition", vs) if vs.forall(_.isInstanceOf[Int]) =>
        partitionSubset = Some(intersect(vs.map(_.asInstanceOf[Int]).toSet)); true
      case GreaterThanOrEqual("event_id", v: Long) => idLo = Some(max(idLo, v)); true
      case GreaterThan("event_id", v: Long) => idLo = Some(max(idLo, satInc(v))); true
      case LessThan("event_id", v: Long) => idHi = Some(min(idHi, v)); true
      case LessThanOrEqual("event_id", v: Long) => idHi = Some(min(idHi, satInc(v))); true
      case EqualTo("event_id", v: Long) =>
        idLo = Some(max(idLo, v)); idHi = Some(min(idHi, satInc(v))); true
      case _ => false
    }
    pushed = accepted
    filters // Spark re-evaluates everything; we only skip data
  }

  private def intersect(s: Set[Int]): Set[Int] =
    partitionSubset.map(_.intersect(s)).getOrElse(s)
  private def max(a: Option[Long], b: Long): Long = math.max(a.getOrElse(Long.MinValue), b)
  private def min(a: Option[Long], b: Long): Long = math.min(a.getOrElse(Long.MaxValue), b)
  /** Saturating +1: `event_id <= Long.MaxValue` must not wrap to MinValue
    * and skip-everything. */
  private def satInc(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val explicitTargets = targets.map(_.toSet)
    val effective = (explicitTargets, partitionSubset) match {
      case (Some(a), Some(b)) => Some(a.intersect(b))
      case (a, b) => a.orElse(b)
    }
    new GraftScan(catalog, topic, consumer, effective, requiredSchema,
      idLo, idHi, maxEventsPerTrigger, startingTime, maxBytesPerTrigger,
      asOfIds, startingIds)
  }
}

final class GraftScan(
    catalog: Catalog, topic: String, consumer: Option[String],
    targets: Option[Set[Int]], requiredSchema: StructType,
    idLo: Option[Long], idHi: Option[Long], maxEventsPerTrigger: Option[Long],
    startingTime: Option[(String, Long)] = None,
    maxBytesPerTrigger: Option[Long] = None,
    asOfIds: Option[Map[Int, Long]] = None,
    startingIds: Option[Map[Int, Long]] = None)
  extends Scan {

  override def readSchema(): StructType = requiredSchema

  /** The topic's persisted serializer descriptor (compact JSON) — shipped to
    * executor readers so they decode the stored metadata form (Z1). */
  private val serializerJson = org.json4s.jackson.JsonMethods.compact(
    org.json4s.jackson.JsonMethods.render(catalog.openTopic(topic).serializer))

  override def description(): String = {
    val pins = (startingIds.map(w => s", after=$w") ++
      asOfIds.map(w => s", asOf=$w")).mkString
    s"GraftScan(topic=$topic, cols=${requiredSchema.fieldNames.mkString(",")}, " +
      s"targets=$targets, idRange=[${idLo.getOrElse(0L)}, ${idHi.getOrElse("∞")})$pins)"
  }

  /** Batch read: the whole log (within pushed ranges) as of planning time —
    * or, with a pinned `asOfIds` watermark (VERSION/TIMESTAMP AS OF), the
    * immutable prefix below the pin: file entries past the pin never plan
    * (same id-range pruning as cursor reads), and partitions absent from
    * the pin — created after that commit — are excluded entirely. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val next = catalog.nextIds(topic)
      // footer-based file pruning only pays off when an id bound was pushed;
      // an unbounded scan keeps every file, so skip the driver-side footer reads
      val stats = if (idLo.isDefined || idHi.isDefined) Some(new FileStatsCache) else None
      def hi(p: Int): Long = {
        val live = math.min(idHi.getOrElse(Long.MaxValue), next.getOrElse(p, 0L))
        asOfIds.fold(live)(wm => math.min(live, wm.getOrElse(p, 0L)))
      }
      // startingVersion is the EXCLUSIVE lower pin (events produced AFTER
      // that commit — the incremental-export resume semantic of
      // events(from, to)); partitions created after the pin start at 0
      def lo(p: Int): Long = {
        val base = math.max(idLo.getOrElse(0L), 0L)
        startingIds.fold(base)(wm => math.max(base, wm.getOrElse(p, 0L)))
      }
      GraftPartitions.plan(catalog, topic, targets,
        from = lo,
        until = hi,
        stats)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      GraftReaderFactory(requiredSchema, catalog.hadoopConf, serializerJson)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    if (asOfIds.isDefined) throw new IllegalArgumentException(
      s"topic '$topic': an upper time-travel pin (VERSION/TIMESTAMP AS OF, " +
      "asOfVersion, endingVersion) is a batch read — a stream follows the " +
      "live log; use 'consumer', 'startingVersion' or startingTime* to " +
      "choose where it begins")
    new GraftMicroBatchStream(catalog, topic, consumer, targets, requiredSchema,
      maxEventsPerTrigger, serializerJson, startingTime, maxBytesPerTrigger,
      startingIds)
  }
}
