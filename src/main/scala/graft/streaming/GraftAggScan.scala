package graft.streaming

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType

import graft.engine.Catalog

/**
 * Complete aggregate pushdown (`SupportsPushDownAggregates`): COUNT(*),
 * COUNT(event_id/partition), MIN(event_id), MAX(event_id) — optionally
 * grouped by `partition` — answered from WATERMARK ARITHMETIC alone.
 *
 * Event ids are dense `[0, watermark)` per partition unless a
 * row-dropping operation ran ([[Catalog.mayHaveIdGaps]] — expire,
 * compliance delete, key compaction, restore set a permanent marker), so
 * on an unmarked topic `SELECT count(*) FROM topic` is two small metadata
 * reads — O(1) whether the log holds one megabyte or 100 TB. The builder
 * refuses the pushdown (and Spark falls back to a real scan) the moment
 * the invariant is not PROVABLE: gap marker present, pushed id filters,
 * unsupported aggregates. Version pins (`asOfIds`/`startingIds`) clamp
 * the same arithmetic and stay exact.
 *
 * Layout note: Spark builds pushed-aggregate scan relations WITHOUT the
 * reported partitioning, so a grouped pushdown joined downstream may
 * shuffle its result — acceptable, because that result is one summary row
 * per partition, not the log. When the co-partitioned layout matters more
 * than the O(1) answer (joining two per-partition aggregates), include a
 * non-pushable aggregate (e.g. SUM) and the real scan's
 * `KeyGroupedPartitioning` carries the query instead (PartitioningSpec).
 */
final class GraftAggScan(
    catalog: Catalog, topic: String, schema: StructType,
    grouped: Boolean, aggs: Seq[GraftAggScan.Agg],
    targets: Option[Set[Int]],
    asOfIds: Option[Map[Int, Long]], startingIds: Option[Map[Int, Long]])
  extends Scan {

  override def readSchema(): StructType = schema

  override def description(): String =
    s"GraftAggScan(topic=$topic, grouped=$grouped, aggs=${aggs.mkString(",")}, " +
      s"targets=$targets) [watermark arithmetic, no file IO]"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      // re-check the gap invariant at PLAN time: a purge that ran between
      // pushdown and execution must fail the shortcut, not serve stale math
      if (catalog.mayHaveIdGaps(topic))
        throw new IllegalStateException(
          s"topic '$topic': a row-dropping operation ran after this aggregate " +
          "was pushed down — re-plan the query")
      val next = catalog.nextIds(topic)
      val parts = (0 until catalog.openTopic(topic).partitions)
        .filter(p => targets.forall(_.contains(p)))
      def hi(p: Int): Long = {
        val live = next.getOrElse(p, 0L)
        asOfIds.fold(live)(wm => math.min(live, wm.getOrElse(p, 0L)))
      }
      def lo(p: Int): Long =
        startingIds.fold(0L)(wm => math.max(0L, wm.getOrElse(p, 0L)))
      val spans = parts.map(p => (p, lo(p), hi(p)))
        .filter { case (_, l, h) => h > l }
      def aggValues(l: Long, h: Long): Seq[Any] = aggs.map {
        case GraftAggScan.CountAgg => h - l
        case GraftAggScan.MinIdAgg => l
        case GraftAggScan.MaxIdAgg => h - 1
      }
      val rows: Seq[Array[Any]] =
        if (grouped) spans.map { case (p, l, h) => (Seq[Any](p) ++ aggValues(l, h)).toArray }
        else if (spans.isEmpty)
          // empty relation: global COUNT is 0, MIN/MAX are NULL
          Seq(aggs.map {
            case GraftAggScan.CountAgg => 0L: Any
            case _ => null: Any
          }.toArray)
        else {
          val total = spans.map { case (_, l, h) => h - l }.sum
          Seq(aggs.map {
            case GraftAggScan.CountAgg => total: Any
            case GraftAggScan.MinIdAgg => spans.map(_._2).min: Any
            case GraftAggScan.MaxIdAgg => spans.map { case (_, _, h) => h - 1 }.max: Any
          }.toArray)
        }
      Array(GraftRowsPartition(rows.toArray))
    }
    override def createReaderFactory(): PartitionReaderFactory = GraftRowsReaderFactory
  }
}

object GraftAggScan {
  sealed trait Agg
  case object CountAgg extends Agg
  case object MinIdAgg extends Agg
  case object MaxIdAgg extends Agg
}

/** Driver-computed result rows shipped to one executor task. */
final case class GraftRowsPartition(rows: Array[Array[Any]]) extends InputPartition

object GraftRowsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[GraftRowsPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i))
      override def close(): Unit = ()
    }
  }
}
