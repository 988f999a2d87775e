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
    startingIds: Option[Map[Int, Long]] = None,
    deleteMode: GraftDeleteMode = GraftDeleteMode.Apply,
    cdf: Boolean = false,
    startingVerNum: Option[Long] = None,
    endingVerNum: Option[Long] = None,
    lineage: Boolean = false,
    readCommitted: Boolean = false)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with SupportsPushDownLimit with SupportsPushDownTopN {

  // the initial value must be the TABLE's full schema: streaming plans
  // execute without a pruneColumns pass (batch pushdown narrows it)
  private var requiredSchema: StructType =
    if (cdf) GraftTopicTable.CdfSchema
    else if (lineage) GraftTopicTable.LineageSchema
    else GraftTopicTable.EventSchema
  private var pushed: Array[Filter] = Array.empty

  // narrowed by pushed filters
  private var partitionSubset: Option[Set[Int]] = None
  private var idLo: Option[Long] = None // inclusive
  private var idHi: Option[Long] = None // exclusive
  // narrowed by pushed `_commit_version` filters on a change-feed scan
  // (the `t$changes` SQL surface): verLo EXCLUSIVE (the startingVersion
  // semantic), verHi INCLUSIVE (endingVersion). Spark re-applies the
  // predicates on surfaced rows, so the translation only needs to keep a
  // SUPERSET of the matching span — and a bounded span plans only the
  // files its version diff touches, identical to readChangeFeed options.
  private var verLo: Option[Long] = startingVerNum
  private var verHi: Option[Long] = endingVerNum
  // pushed `_commit_timestamp` bounds (epoch ms) — translated to the same
  // version window as `_commit_version` bounds at build() (Delta users
  // overwhelmingly address a change feed by time, not version number)
  private var tsLoMs: Option[Long] = None // versionAtTimestamp arg: excl-lower version = verBefore(this)
  private var tsHiMs: Option[Long] = None // versionAtTimestamp arg: incl-upper version = verBefore(this)

  override def pruneColumns(required: StructType): Unit = {
    // the event schema (on a change-feed read: plus the CDF columns) plus
    // the metadata columns — `_file`, and on normal reads the row-tracking
    // commit pair (appended by Spark to `required` only when referenced)
    import org.apache.spark.sql.types._
    val metaCols =
      Seq(StructField(GraftTopicTable.FileColumn, StringType, nullable = false),
        StructField(GraftTopicTable.RowPartitionColumn, IntegerType, nullable = false)) ++
        (if (cdf) Seq.empty[StructField] else Seq(
          StructField(GraftCdf.CommitVersionColumn, LongType, nullable = true),
          StructField(GraftCdf.CommitTimestampColumn, TimestampType, nullable = true)))
    val selectable = (if (cdf) GraftTopicTable.CdfSchema
                      else GraftTopicTable.EventSchema) ++ metaCols
    requiredSchema = StructType(
      selectable.filter(f => required.fieldNames.contains(f.name)))
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
      case GreaterThan(a, v: Long) if cdf && a == GraftCdf.CommitVersionColumn =>
        verLo = Some(max(verLo, v)); true
      case GreaterThanOrEqual(a, v: Long) if cdf && a == GraftCdf.CommitVersionColumn =>
        verLo = Some(max(verLo, if (v == Long.MinValue) v else v - 1)); true
      case LessThanOrEqual(a, v: Long) if cdf && a == GraftCdf.CommitVersionColumn =>
        verHi = Some(min(verHi, v)); true
      case LessThan(a, v: Long) if cdf && a == GraftCdf.CommitVersionColumn =>
        verHi = Some(min(verHi, if (v == Long.MinValue) v else v - 1)); true
      case EqualTo(a, v: Long) if cdf && a == GraftCdf.CommitVersionColumn =>
        verLo = Some(max(verLo, if (v == Long.MinValue) v else v - 1))
        verHi = Some(min(verHi, v)); true
      // `_commit_timestamp` bounds translate, STRICTNESS PRESERVED, to
      // the argument later handed to Catalog.versionAtTimestamp (commit
      // times are ms-resolution FS mtimes, lock-serialized hence monotone
      // per topic). Lower side (exclusive-lower version = verBefore(arg)):
      // `> v` excludes times <= v, so arg = floor(v); `>= v` excludes
      // times < v, i.e. <= ceil(v)-1, so arg = ceil(v)-1. Upper side
      // (inclusive-upper version = verBefore(arg)): `< v` keeps times
      // <= ceil(v)-1; `<= v` keeps times <= floor(v). The translation is
      // a SUPERSET either way (Spark re-applies the exact predicate on
      // surfaced rows), so any residual slack only costs pruning, never
      // correctness — but at exact-ms bounds (the common case: values read
      // from history()) the window is now TIGHT, where the former
      // floor/ceil conflation planned the full feed.
      case GreaterThan(a, v) if cdf && a == GraftCdf.CommitTimestampColumn &&
          tsFloorMs(v).isDefined =>
        tsLoMs = Some(max(tsLoMs, tsFloorMs(v).get)); true
      case GreaterThanOrEqual(a, v) if cdf && a == GraftCdf.CommitTimestampColumn &&
          tsCeilMs(v).isDefined =>
        tsLoMs = Some(max(tsLoMs, satDec(tsCeilMs(v).get))); true
      case LessThan(a, v) if cdf && a == GraftCdf.CommitTimestampColumn &&
          tsCeilMs(v).isDefined =>
        tsHiMs = Some(min(tsHiMs, satDec(tsCeilMs(v).get))); true
      case LessThanOrEqual(a, v) if cdf && a == GraftCdf.CommitTimestampColumn &&
          tsFloorMs(v).isDefined =>
        tsHiMs = Some(min(tsHiMs, tsFloorMs(v).get)); true
      case EqualTo(a, v) if cdf && a == GraftCdf.CommitTimestampColumn &&
          tsFloorMs(v).isDefined =>
        tsLoMs = Some(max(tsLoMs, satDec(tsCeilMs(v).get)))
        tsHiMs = Some(min(tsHiMs, tsFloorMs(v).get)); true
      case _ => false
    }
    pushed = accepted
    filters // Spark re-evaluates everything; we only skip data
  }

  /** A pushed timestamp literal's epoch millis, floored / ceiled across
    * the sub-millisecond tail (commit times are FS mtimes — millisecond
    * resolution). Spark hands `java.sql.Timestamp` by default and
    * `java.time.Instant` under the java8 datetime API; anything else is
    * simply not pushed. */
  private def tsFloorMs(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(t.getTime)
    case i: java.time.Instant => Some(i.toEpochMilli)
    case _ => None
  }
  private def tsCeilMs(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(t.getTime + (if (t.getNanos % 1000000 != 0) 1L else 0L))
    case i: java.time.Instant =>
      Some(i.toEpochMilli + (if (i.getNano % 1000000 != 0) 1L else 0L))
    case _ => None
  }

  private def intersect(s: Set[Int]): Set[Int] =
    partitionSubset.map(_.intersect(s)).getOrElse(s)
  private def max(a: Option[Long], b: Long): Long = math.max(a.getOrElse(Long.MinValue), b)
  private def min(a: Option[Long], b: Long): Long = math.min(a.getOrElse(Long.MaxValue), b)
  /** Saturating +1: `event_id <= Long.MaxValue` must not wrap to MinValue
    * and skip-everything. */
  private def satInc(v: Long): Long = if (v == Long.MaxValue) v else v + 1
  /** Saturating -1 for timestamp-bound translation at the MinValue edge. */
  private def satDec(v: Long): Long = if (v == Long.MinValue) v else v - 1

  override def pushedFilters(): Array[Filter] = pushed

  // -- limit / top-N pushdown -----------------------------------------------
  //
  // Dense per-partition ids make LIMIT a WINDOW, not a scan: capping each
  // partition's id range at `limit` always leaves at least
  // min(limit, total) rows, so a `LIMIT 10` on a 100 TB topic plans at
  // most 10 ids per partition — file pruning does the rest. Always
  // PARTIAL: Spark re-applies the exact limit (and the sort, for top-N)
  // on the surfaced rows, so correctness never rides on the cap.
  //
  // The window IS the rows only while ids are provably dense: after a
  // row-dropping operation (expire, compliance delete, key compaction,
  // restore — [[Catalog.mayHaveIdGaps]]) the first `n` ids of a partition
  // may hold FEWER than n surviving rows, and a capped scan would
  // under-deliver a LIMIT the full log could satisfy. Gap-marked topics
  // refuse the pushdown (and the scan re-checks at plan time, like the
  // aggregate path, so a purge landing between pushdown and execution
  // can't resurrect the cap).

  private var limit: Option[Int] = None

  override def pushLimit(n: Int): Boolean =
    // read_committed: excluded transaction rows inside the first n ids
    // would make a capped window under-deliver — no cap, like id gaps
    if (cdf || readCommitted || catalog.mayHaveIdGaps(topic) ||
        deleteMode != GraftDeleteMode.Apply)
      false
    else { limit = Some(n); true }

  /** Top-N pushes only for `ORDER BY event_id ASC`: the reader surfaces
    * each partition's rows in ascending id order by construction (files
    * sorted by id range, rows id-sorted within), so the first `n` ids per
    * partition are a superset of the global top-N. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    val ascById = orders.length == 1 && (orders.head.expression match {
      case f: NamedReference =>
        f.fieldNames.sameElements(Array("event_id")) &&
          orders.head.direction == SortDirection.ASCENDING
      case _ => false
    })
    if (ascById && !cdf && !readCommitted && !catalog.mayHaveIdGaps(topic) &&
        deleteMode == GraftDeleteMode.Apply) { limit = Some(n); true }
    else false
  }

  /** The cap is a pruning hint, never the final answer. */
  override def isPartiallyPushed: Boolean = true

  // -- aggregate pushdown (see GraftAggScan's Scaladoc for the contract) ----

  private var pushedAgg: Option[(Boolean, Seq[GraftAggScan.Agg], StructType)] = None

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    translateAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    translateAgg(agg) match {
      case s @ Some(_) => pushedAgg = s; true
      case None => false
    }

  /** COUNT(*)/COUNT(non-null col)/MIN/MAX(event_id), optionally grouped by
    * `partition`, on a topic whose ids are PROVABLY dense (no gap marker,
    * no pushed id window). Anything else falls back to a real scan. */
  private def translateAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    : Option[(Boolean, Seq[GraftAggScan.Agg], StructType)] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (idLo.isDefined || idHi.isDefined || partitionSubset.isDefined) return None
    if (catalog.mayHaveIdGaps(topic)) return None
    // a change feed surfaces raw inserts PLUS delete preimages — watermark
    // arithmetic counts neither
    if (cdf) return None
    // read_committed: watermark arithmetic counts rows the exclusion
    // filter drops — the shortcut would over-count
    if (readCommitted) return None
    // watermark arithmetic counts LIVE rows under the normal read
    // semantics only — a raw or delete-preimage scan must really scan
    if (deleteMode != GraftDeleteMode.Apply) return None
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: org.apache.spark.sql.connector.expressions.NamedReference
            if f.fieldNames.length == 1 => Some(f.fieldNames.head)
        case _ => None
      }
    val grouped = agg.groupByExpressions.toSeq match {
      case Seq() => Some(false)
      case Seq(g) if fieldOf(g).contains("partition") => Some(true)
      case _ => None
    }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(GraftAggScan.CountAgg)
      case c: Count if !c.isDistinct &&
          fieldOf(c.column).exists(Set("event_id", "partition")) =>
        Some(GraftAggScan.CountAgg) // both columns are never null
      case m: Min if fieldOf(m.column).contains("event_id") => Some(GraftAggScan.MinIdAgg)
      case m: Max if fieldOf(m.column).contains("event_id") => Some(GraftAggScan.MaxIdAgg)
      case _ => None
    }
    (grouped, specs) match {
      case (Some(g), s) if s.nonEmpty && s.forall(_.isDefined) =>
        import org.apache.spark.sql.types._
        val aggFields = s.flatten.zipWithIndex.map {
          case (GraftAggScan.CountAgg, i) => StructField(s"agg_$i", LongType, nullable = !g)
          case (a, i) => StructField(s"agg_$i", LongType, nullable = true)
        }
        val fields =
          if (g) StructField("partition", IntegerType, nullable = false) +: aggFields
          else aggFields
        Some((g, s.flatten, StructType(fields)))
      case _ => None
    }
  }

  override def build(): Scan = {
    val explicitTargets = targets.map(_.toSet)
    val effective = (explicitTargets, partitionSubset) match {
      case (Some(a), Some(b)) => Some(a.intersect(b))
      case (a, b) => a.orElse(b)
    }
    pushedAgg match {
      case Some((grouped, specs, schema)) =>
        new GraftAggScan(catalog, topic, schema, grouped, specs,
          effective, asOfIds, startingIds)
      case None =>
        // a pushed _commit_version bound also clamps the INSERT side's id
        // window to the bound's watermark — the same files-pruned plan as
        // the equivalent startingVersion/endingVersion options. Lenient:
        // an unresolvable pushed version (folded out of retention, beyond
        // history) skips the clamp — Spark re-applies the predicate on
        // surfaced rows, so only pruning is lost, never correctness.
        def wmOf(v: Long): Option[Map[Int, Long]] =
          try Some(catalog.watermarkAsOf(topic, v))
          catch { case scala.util.control.NonFatal(_) => None }
        // pushed `_commit_timestamp` bounds resolve to the SAME version
        // window (commit times are lock-serialized, hence monotone per
        // topic — Catalog.versionAtTimestamp): pushFilters already
        // translated each bound's strictness into the verBefore ARGUMENT
        // (`> t` → t, `>= t` → t-1 at ms resolution), so both sides call
        // verBefore directly. Same leniency as the version clamp: an
        // unresolvable bound (predates the retained log) skips its side
        // of the clamp — for the lower side that is also vacuous (every
        // retained version already satisfies it), so no pruning is lost.
        def verBefore(tsMs: Long): Option[Long] =
          try Some(catalog.versionAtTimestamp(topic, tsMs))
          catch { case scala.util.control.NonFatal(_) => None }
        val effVerLo =
          (verLo.toSeq ++ (if (cdf) tsLoMs.flatMap(verBefore) else None).toSeq)
            .reduceOption(_ max _)
        val effVerHi =
          (verHi.toSeq ++ (if (cdf) tsHiMs.flatMap(verBefore) else None).toSeq)
            .reduceOption(_ min _)
        val effStartingIds =
          if (cdf && startingIds.isEmpty) effVerLo.flatMap(wmOf) else startingIds
        val effAsOfIds =
          if (cdf && asOfIds.isEmpty) effVerHi.flatMap(wmOf) else asOfIds
        new GraftScan(catalog, topic, consumer, effective, requiredSchema,
          idLo, idHi, maxEventsPerTrigger, startingTime, maxBytesPerTrigger,
          effAsOfIds, effStartingIds, perPartitionCap = limit, deleteMode = deleteMode,
          cdf = cdf, startingVerNum = effVerLo, endingVerNum = effVerHi,
          readCommitted = readCommitted)
    }
  }
}

final class GraftScan(
    catalog: Catalog, topic: String, consumer: Option[String],
    targets: Option[Set[Int]], requiredSchema: StructType,
    idLo: Option[Long], idHi: Option[Long], maxEventsPerTrigger: Option[Long],
    startingTime: Option[(String, Long)] = None,
    maxBytesPerTrigger: Option[Long] = None,
    asOfIds: Option[Map[Int, Long]] = None,
    startingIds: Option[Map[Int, Long]] = None,
    perPartitionCap: Option[Int] = None,
    deleteMode: GraftDeleteMode = GraftDeleteMode.Apply,
    cdf: Boolean = false,
    startingVerNum: Option[Long] = None,
    endingVerNum: Option[Long] = None,
    readCommitted: Boolean = false)
  extends Scan
  with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  // Narrowed further by runtime filters (SupportsRuntimeFiltering): Spark
  // re-plans input partitions after `filter(...)`, so batch planning reads
  // these instead of the constructor values. Planning-time pushdown and
  // runtime narrowing share one representation — the runtime path can only
  // shrink what static pushdown kept.
  @volatile private var effTargets: Option[Set[Int]] = targets
  @volatile private var effIdLo: Option[Long] = idLo
  @volatile private var effIdHi: Option[Long] = idHi

  /** Test/diagnostic hooks: the post-runtime-filter narrowed state. */
  private[graft] def narrowedTargets: Option[Set[Int]] = effTargets
  private[graft] def narrowedIdRange: (Option[Long], Option[Long]) = (effIdLo, effIdHi)

  override def readSchema(): StructType = requiredSchema

  /**
   * Join-driven pruning (the DSv2 analog of dynamic partition pruning):
   * Spark's `PartitionPruning` rule plants a runtime subquery on scans
   * that expose filterable attributes, and `BatchScanExec` delivers the
   * realized values here before re-planning. A join on `partition` prunes
   * whole topic-partition directories; a join on `event_id` (after a
   * selective build side) narrows the id window so only overlapping chunk
   * files plan. Filters are used for SKIPPING only — Spark re-evaluates
   * every predicate on surfaced rows — so over-acceptance is impossible
   * and unknown filter shapes are simply ignored.
   */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // only columns that survived pruning: Spark resolves these against the
    // scan's OUTPUT and fails the query on a miss, not skips it
    Array("partition", "event_id").filter(requiredSchema.fieldNames.contains)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case EqualTo("partition", v: Int) =>
      effTargets = Some(effTargets.fold(Set(v))(_.intersect(Set(v))))
    case In("partition", vs) if vs.forall(_.isInstanceOf[Int]) =>
      val s = vs.map(_.asInstanceOf[Int]).toSet
      effTargets = Some(effTargets.fold(s)(_.intersect(s)))
    case In("event_id", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Long]) =>
      // realized id values from the build side: keep the covering range
      // (file pruning is range-based; rows are re-filtered by Spark)
      val ls = vs.map(_.asInstanceOf[Long])
      val lo = ls.min; val hi = ls.max
      effIdLo = Some(math.max(effIdLo.getOrElse(Long.MinValue), lo))
      effIdHi = Some(math.min(effIdHi.getOrElse(Long.MaxValue),
        if (hi == Long.MaxValue) hi else hi + 1))
    case GreaterThanOrEqual("event_id", v: Long) =>
      effIdLo = Some(math.max(effIdLo.getOrElse(Long.MinValue), v))
    case LessThan("event_id", v: Long) =>
      effIdHi = Some(math.min(effIdHi.getOrElse(Long.MaxValue), v))
    case _ => // skipping-only contract: unknown shapes are safely ignored
  }

  /**
   * Physical layout (`SupportsReportPartitioning`): the scan plans exactly
   * one input slice per topic partition, each keyed by its partition id
   * ([[GraftInputPartition.partitionKey]]), so the output is
   * `KeyGroupedPartitioning(partition)`. With
   * `spark.sql.sources.v2.bucketing.enabled`, Spark then runs
   * partition-keyed aggregations WITHOUT an exchange and joins two
   * co-partitioned topics as a storage-partitioned join — at 100 TB the
   * difference between a full shuffle of the log and none. Reported only
   * when the `partition` column survived pruning (Spark resolves the key
   * expression against the scan output).
   */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val nParts = (0 until catalog.openTopic(topic).partitions)
      .count(p => effTargets.forall(_.contains(p)))
    // a change feed plans several slices per topic partition (insert +
    // one per in-span vector root) — not a key-grouped layout
    if (!cdf && requiredSchema.fieldNames.contains("partition") && nParts > 0)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.identity("partition")),
        nParts)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(nParts)
  }

  /**
   * Plan-time statistics (`SupportsReportStatistics`) — what lets Catalyst
   * auto-broadcast a small topic (or a small pushed slice of a huge one)
   * without user hints, the decision that matters most at 100 TB:
   *
   *  - `numRows` is EXACT, and free: event ids are dense per partition
   *    (the engine's linearized-id invariant), so the row count of any id
   *    window is watermark arithmetic — no file IO, no sampling error.
   *  - `sizeInBytes` = rows × bytes-per-row from ONE sampled chunk footer
   *    (column-chunk compressed sizes), restricted to the PRUNED columns —
   *    a metadata-only projection of a payload-heavy topic reports the
   *    small scan it will actually perform. O(1) footer read, cached by
   *    immutable file path.
   */
  override def estimateStatistics(): Statistics = {
    val next = catalog.nextIds(topic)
    val parts = (0 until catalog.openTopic(topic).partitions)
      .filter(p => effTargets.forall(_.contains(p)))
    val cap = effCap
    // vector-deleted rows: subtract EXACT per-partition counts (footer
    // sums, cached by immutable vector path) when the scan covers each
    // partition's full id space — every vectored id then lies inside the
    // window. With a bounded window (pushed/runtime id filters, version
    // pins, a limit cap) the overlap is unknown, so skip the subtraction:
    // over-reporting rows is the conservative direction (it can only
    // suppress an auto-broadcast, never cause one).
    // read_committed keeps the raw numbers: excluded transaction rows are
    // an unknown-overlap subtraction, and over-reporting is the
    // conservative direction (suppresses an auto-broadcast, never causes
    // one — same rule as the bounded-window vector case below)
    val deleted: Map[Int, Long] =
      if (!cdf && deleteMode == GraftDeleteMode.Apply &&
          effIdLo.isEmpty && effIdHi.isEmpty && asOfIds.isEmpty &&
          startingIds.isEmpty && cap.isEmpty)
        catalog.deletedCountsByPartition(topic)
      else Map.empty
    // change feed: raw insert window (no vector subtraction) PLUS the
    // in-span delete preimages (footer-exact per root)
    val cdfDeleteRows: Long =
      if (!cdf) 0L
      else {
        val history = catalog.versionHistory(topic)
        val fromVer = startingVerNum.getOrElse(0L)
        val toVer = endingVerNum.getOrElse(
          history.lastOption.map(_.version).getOrElse(0L))
        GraftCdf.attributedSources(catalog, topic, history, fromVer, toVer)
          .map { case (_, src, _, _) => src.bounds
            .filter { case (p, _) => parts.contains(p) }
            .valuesIterator.map(_.rows).sum }.sum
      }
    val rows = cdfDeleteRows + (deleteMode match {
      case GraftDeleteMode.Only(root, source) =>
        // a delete-preimage scan surfaces exactly the root's (or, source-
        // narrowed, the folded commit's) vectored rows — footer-exact,
        // which lets Catalyst broadcast the (small) delete side of a
        // change feed against a huge insert side
        val stats = source.flatMap { case (v, ms) =>
          catalog.vectorRootSources(root)
            .find(s => s.version == v && s.ms == ms).map(_.bounds)
        }.getOrElse(catalog.deleteVectorRootStats(root))
        parts.map(p => stats.get(p).fold(0L)(_.rows)).sum
      case _ => parts.map(p => math.max(0L,
        batchHi(p, next, cap) - batchLo(p) - deleted.getOrElse(p, 0L))).sum
    })
    val physicalCols = requiredSchema.fieldNames
      .filter(n => n != "partition" && n != GraftTopicTable.FileColumn &&
        n != GraftTopicTable.RowPartitionColumn &&
        !GraftCdf.Columns.contains(n))
    val bytes =
      if (rows == 0L) 0L
      else sampleBytesPerRow(physicalCols) match {
        case Some(bpr) => math.max(1L, math.ceil(rows * bpr).toLong)
        case None => // no committed file to sample: schema default widths
          math.max(1L, rows * math.max(4, requiredSchema.defaultSize).toLong)
      }
    val (r, b) = (rows, bytes)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(b)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(r)
    }
  }

  /** Compressed bytes/row over `cols` from one committed chunk file:
    * manifest head first (no listing), directory-listing head otherwise.
    * Samples are cached by path — chunk files are immutable. */
  private def sampleBytesPerRow(cols: Array[String]): Option[Double] = {
    if (cols.isEmpty) return Some(4.0) // virtual-only projection (partition/_file)
    val conf = catalog.hadoopConf
    val logPath = new org.apache.hadoop.fs.Path(catalog.logPath(topic))
    val fromManifest: Option[org.apache.hadoop.fs.Path] =
      catalog.readManifest(topic).flatMap(_.files.valuesIterator
        .flatMap(_.headOption).toSeq.headOption)
        .map(f => new org.apache.hadoop.fs.Path(logPath, f.path))
    val sampled: Option[org.apache.hadoop.fs.Path] = fromManifest.orElse {
      val fs = logPath.getFileSystem(conf)
      if (!fs.exists(logPath)) None
      else fs.listStatus(logPath).filter(_.isDirectory).sortBy(_.getPath.getName)
        .iterator.flatMap { dir =>
          fs.listStatus(dir.getPath)
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName).headOption
        }.nextOption().map(_.getPath)
    }
    sampled.flatMap { p =>
      val s = GraftScan.sampleCached(p.toString, conf)
      if (s.rows <= 0) None
      else Some(cols.map(c => s.columnBytes.getOrElse(c, 0L)).sum.toDouble / s.rows)
    }
  }

  /** The pushed LIMIT/top-N cap, re-validated at EVERY plan (a `def`, not
    * a memoized val — runtime filtering re-plans the same scan instance,
    * and a vectored delete landing between plans must drop the cap on the
    * re-plan too): a row-dropping operation sets the permanent gap marker,
    * and a capped id window over gapped ids could surface fewer rows than
    * the limit — so the cap silently widens back to a full scan (unlike
    * the aggregate shortcut, which must fail loudly, a wider window only
    * surfaces MORE rows for Spark's re-applied limit). One marker probe
    * per evaluation; callers evaluate once per plan, not per partition. */
  private def effCap: Option[Int] =
    perPartitionCap.filter(_ => !catalog.mayHaveIdGaps(topic))

  /** Shared per-partition batch window: pushed/runtime id bounds clamped
    * by the live watermark and any version pins (see [[toBatch]] doc). */
  private def batchHi(p: Int, next: Map[Int, Long], cap: Option[Int]): Long = {
    val live = math.min(effIdHi.getOrElse(Long.MaxValue), next.getOrElse(p, 0L))
    val pinned = asOfIds.fold(live)(wm => math.min(live, wm.getOrElse(p, 0L)))
    // pushed LIMIT/top-N: at most `cap` ids per partition plan (a partial
    // pushdown — Spark re-applies the exact limit on the surfaced rows)
    cap.fold(pinned)(n => math.min(pinned, batchLo(p) + n))
  }
  private def batchLo(p: Int): Long = {
    val base = math.max(effIdLo.getOrElse(0L), 0L)
    startingIds.fold(base)(wm => math.max(base, wm.getOrElse(p, 0L)))
  }

  /** The topic's persisted serializer descriptor (compact JSON) — shipped to
    * executor readers so they decode the stored metadata form (Z1). */
  private val serializerJson = org.json4s.jackson.JsonMethods.compact(
    org.json4s.jackson.JsonMethods.render(catalog.openTopic(topic).serializer))

  override def description(): String = {
    val pins = (startingIds.map(w => s", after=$w") ++
      asOfIds.map(w => s", asOf=$w") ++
      effCap.map(n => s", cap=$n") ++
      (if (cdf) Seq(", changeFeed") else Nil) ++
      (if (readCommitted) Seq(", readCommitted") else Nil)).mkString
    s"GraftScan(topic=$topic, cols=${requiredSchema.fieldNames.mkString(",")}, " +
      s"targets=$effTargets, idRange=[${effIdLo.getOrElse(0L)}, ${effIdHi.getOrElse("∞")})$pins)"
  }

  /** Batch read: the whole log (within pushed ranges) as of planning time —
    * or, with a pinned `asOfIds` watermark (VERSION/TIMESTAMP AS OF), the
    * immutable prefix below the pin: file entries past the pin never plan
    * (same id-range pruning as cursor reads), and partitions absent from
    * the pin — created after that commit — are excluded entirely. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val next = catalog.nextIds(topic)
      val cap = effCap // fresh gap-marker probe per plan (see effCap doc)
      // footer-based file pruning only pays off when an id bound was pushed
      // (statically, by a runtime filter, or by a limit cap); an unbounded
      // scan keeps every file, so skip the driver-side footer reads
      val stats =
        if (effIdLo.isDefined || effIdHi.isDefined || cap.isDefined)
          Some(new FileStatsCache)
        else None
      // startingVersion is the EXCLUSIVE lower pin (events produced AFTER
      // that commit — the incremental-export resume semantic of
      // events(from, to)); partitions created after the pin start at 0.
      // A delete-preimage scan (deleteMode Only) additionally clamps each
      // partition's window to the root's footer id bounds, so extracting a
      // sliver of vectored rows from a huge log plans O(root id-span)
      // chunk files, not the whole partition.
      val rootBounds: Map[Int, (Long, Long)] = deleteMode match {
        case GraftDeleteMode.Only(root, source) =>
          val stats = source.flatMap { case (v, ms) =>
            catalog.vectorRootSources(root)
              .find(s => s.version == v && s.ms == ms).map(_.bounds)
          }.getOrElse(catalog.deleteVectorRootStats(root))
          stats.view.mapValues(s =>
            (s.minId, if (s.maxId == Long.MaxValue) Long.MaxValue else s.maxId + 1L)).toMap
        case _ => Map.empty
      }
      def clampLo(p: Int): Long = deleteMode match {
        case GraftDeleteMode.Only(_, _) =>
          rootBounds.get(p).fold(Long.MaxValue)(b => math.max(batchLo(p), b._1))
        case _ => batchLo(p)
      }
      def clampHi(p: Int): Long = deleteMode match {
        case GraftDeleteMode.Only(_, _) =>
          rootBounds.get(p).fold(Long.MinValue)(b =>
            math.min(batchHi(p, next, cap), b._2))
        case _ => batchHi(p, next, cap)
      }
      if (cdf) {
        // batch change feed (readChangeFeed=true): inserts over the
        // version-diff id window (startingVersion watermarks → batchLo,
        // endingVersion pin → batchHi via asOfIds) + one bounded
        // delete-preimage scan per in-span vector root — the scan-level
        // form of TopicHandle.changes (shared planner: GraftCdf)
        val history = catalog.versionHistory(topic)
        GraftCdf.planChanges(catalog, topic, effTargets,
          fromVer = startingVerNum.getOrElse(0L),
          toVer = endingVerNum.getOrElse(
            history.lastOption.map(_.version).getOrElse(0L)),
          from = clampLo, until = clampHi,
          stats.orElse(Some(new FileStatsCache)), history)
      } else {
        // read_committed (Kafka isolation.level analog): resolve the
        // uncommitted-transaction id ranges ONCE at plan time (metadata-
        // sized — local txn records plus remote shares) and ship each
        // slice its window-overlapping share; readers drop those rows
        // exactly like vector-deleted ids. Resolution is current-state:
        // a transaction committed by plan time is visible even under a
        // version pin (same retroactivity rule as deletion vectors).
        val exclude: Map[Int, Seq[(Long, Long)]] =
          if (!readCommitted) Map.empty
          else catalog.uncommittedTxnRanges(topic)
            .groupBy(_.partition).view
            .mapValues(_.map(r => (r.first, r.first + r.count))
              .sortBy(_._1).toSeq).toMap
        val planned = GraftPartitions.plan(catalog, topic, effTargets,
          from = clampLo,
          until = clampHi,
          stats,
          deleteMode = deleteMode,
          exclude = exclude)
        // row tracking: _commit_version/_commit_timestamp were projected —
        // ship the attribution span; the read semantics stay a normal read
        if (GraftCdf.wantsLineage(requiredSchema))
          GraftCdf.attachLineage(planned, catalog.versionHistory(topic))
        else planned
      }
    }
    override def createReaderFactory(): PartitionReaderFactory =
      // columnar handoff for default-serializer topics: ColumnarBatches →
      // ColumnarToRow codegen, the built-in parquet scan's path (the id
      // window — watermark / cursor / version pin — is enforced per batch
      // by the columnar reader, so eligibility is a serializer question
      // only; see GraftColumnarPartitionReader)
      GraftReaderFactory(requiredSchema, catalog.hadoopConf, serializerJson,
        // CDF/row-tracking rows carry per-row commit attribution — a row
        // path by design
        columnar = !cdf && !GraftCdf.wantsLineage(requiredSchema) &&
          graft.engine.Serializer.fromDescriptorJson(serializerJson) ==
            graft.engine.Serializer.Json)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    if (deleteMode != GraftDeleteMode.Apply) throw new IllegalArgumentException(
      s"topic '$topic': change-data-feed delete modes are batch reads — " +
      "a stream always applies the live deletion vectors")
    // read_committed streams ride the last-stable-offset clamp (Kafka
    // LSO): offsets never pass an OPEN transaction's first id, so a
    // window only ever contains plain, committed, or decided-dead rows —
    // the dead ones filtered per slice (see GraftMicroBatchStream)
    if (asOfIds.isDefined) throw new IllegalArgumentException(
      s"topic '$topic': an upper time-travel pin (VERSION/TIMESTAMP AS OF, " +
      "asOfVersion, endingVersion) is a batch read — a stream follows the " +
      "live log; use 'consumer', 'startingVersion' or startingTime* to " +
      "choose where it begins")
    new GraftMicroBatchStream(catalog, topic, consumer, targets, requiredSchema,
      maxEventsPerTrigger, serializerJson, startingTime, maxBytesPerTrigger,
      startingIds, cdf = cdf, startingVersionNum = startingVerNum,
      readCommitted = readCommitted)
  }
}

object GraftScan {
  /** Footer size samples keyed by (immutable) chunk-file path — LRU-bounded
    * like [[FileStatsCache]], shared across scans so repeated planning of
    * one topic costs one footer read, not one per query. */
  private val samples =
    new java.util.LinkedHashMap[String, Catalog.FileScanSample](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Catalog.FileScanSample]): Boolean =
        size() > 4096
    }

  private[streaming] def sampleCached(
      path: String, conf: org.apache.hadoop.conf.Configuration): Catalog.FileScanSample =
    samples.synchronized {
      val cached = samples.get(path)
      if (cached != null) cached
      else {
        val s = Catalog.fileScanSample(new org.apache.hadoop.fs.Path(path), conf)
        samples.put(path, s)
        s
      }
    }
}
