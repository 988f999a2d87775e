package graft.streaming

import org.apache.spark.sql.connector.read.InputPartition

import graft.engine.{Catalog, TopicVersion}

/**
 * Per-slice change-data-feed metadata, shipped to executor readers
 * ([[GraftInputPartition.cdf]]). Exactly one of the two shapes:
 *
 *  - insert slice: `changeType = "insert"`, `span` holds this PARTITION's
 *    in-span commits as (version, id-watermark, commitTimeMs) ascending by
 *    version — the reader attributes each row to the FIRST commit whose
 *    watermark covers its id (exact: ids are dense, watermarks monotone;
 *    the same rule as [[graft.engine.TopicHandle.changes]]);
 *  - delete slice: `changeType = "delete"`, `version`/`tsMillis` are the
 *    vector root's commit — constants for every row the slice surfaces.
 */
final case class CdfSlice(
    changeType: String, version: Long, tsMillis: Long,
    span: Seq[(Long, Long, Long)] = Nil,
    /** Delete slices over a FOLD root with SEVERAL in-span sources: one
      * entry per source as (rawVersion, rawMs, attributedVersion,
      * attributedTsMillis) — the reader loads per-id source ordinals and
      * fills the commit columns per ROW, so the whole root costs ONE scan
      * however many folded commits the span covers. Empty = constant
      * attribution from `version`/`tsMillis` (plain roots, single-source
      * folds). */
    sources: Seq[(Long, Long, Long, Long)] = Nil)

/**
 * Shared change-feed planning for the batch scan (`spark.read.format
 * ("graft").option("readChangeFeed", "true")`) and the streaming source
 * (`readStream` + the same option): the scan-level form of
 * [[graft.engine.TopicHandle.changes]], emitting the topic schema plus
 * `_change_type` / `_commit_version` / `_commit_timestamp`
 * ([[GraftTopicTable.CdfSchema]]).
 *
 * The plan is the union of two pure scans, no joins:
 *
 *  - INSERT slices: the raw log ([[GraftDeleteMode.Ignore]] — a row
 *    inserted in the span is an insert even if vector-deleted later) over
 *    the id window `[from, until)` per partition; per-row commit
 *    attribution rides as the slice's watermark span.
 *  - DELETE slices: one [[GraftDeleteMode.Only]] scan per vector root
 *    attributed to a version in `(fromVer, toVer]` — the root's footer id
 *    bounds clamp each partition's window, so extracting a sliver of
 *    preimages from a huge log plans O(root id-span) files.
 *
 * Honest limits are those of the underlying mechanisms (documented on
 * `TopicHandle.changes`): physically purged rows do not replay, and a
 * rewrite that folds vectors consumes the delete preimages with them —
 * read the feed before maintenance folds it.
 */
object GraftCdf {
  val ChangeTypeColumn = "_change_type"
  val CommitVersionColumn = "_commit_version"
  val CommitTimestampColumn = "_commit_timestamp"
  val Columns: Set[String] =
    Set(ChangeTypeColumn, CommitVersionColumn, CommitTimestampColumn)

  /** Row tracking on NORMAL reads (`SELECT _commit_version, ...`): attach
    * the insert-attribution span to already-planned slices — the reader
    * fills the commit columns per row exactly as on a change feed, but the
    * read semantics (deletion vectors, id windows) stay untouched: no
    * `_change_type` is in the schema, so only attribution ordinals fill. */
  def attachLineage(planned: Array[InputPartition],
                    history: Vector[TopicVersion]): Array[InputPartition] =
    planned.map {
      case ip: GraftInputPartition => ip.copy(cdf = Some(CdfSlice("insert",
        -1L, -1L, history.map(v =>
          (v.version, v.watermarks.getOrElse(ip.partition, 0L), v.commitTimeMs)))))
      case other => other
    }

  /** Did the pruned schema keep a row-tracking column? */
  def wantsLineage(requiredSchema: org.apache.spark.sql.types.StructType): Boolean =
    requiredSchema.fieldNames.exists(n =>
      n == CommitVersionColumn || n == CommitTimestampColumn)

  /** The root's commit (single rule, shared by `TopicHandle.changes` and
    * the scan-level feed): the seq embedded in the root name when that
    * version is still retained (every vectored delete commits its own
    * version); otherwise — untagged legacy roots, fold-rewritten roots,
    * or a tagged version that FELL OUT of manifest retention — the first
    * retained commit at/after the root's timestamp. The retention
    * fallback matters: a root whose exact version was folded away still
    * applies to every read, so silently dropping it from the feed would
    * desynchronize feed-replay from the table; attributing it to the
    * oldest retained commit covering it keeps the feed conservative and
    * complete. */
  def attributeRoot(root: String, history: Vector[TopicVersion]): Option[TopicVersion] = {
    def byTimestamp: Option[TopicVersion] = {
      val ms = Catalog.vectorRootMillis(root)
      history.find(_.commitTimeMs >= ms)
    }
    Catalog.vectorRootVersion(root) match {
      case Some(v) => history.find(_.version == v).orElse(byTimestamp)
      case None => byTimestamp
    }
  }

  /** Per-SOURCE form of [[attributeRoot]] — the same rule applied to one
    * folded delete commit: exact when its version is tagged and retained,
    * first retained commit at/after its millis otherwise. A fold merges
    * roots but persists each source's (version, ms), so folded preimages
    * keep replaying under their ORIGINAL commits. */
  def attributeSource(src: graft.engine.VectorSource,
                      history: Vector[TopicVersion]): Option[TopicVersion] = {
    def byTimestamp: Option[TopicVersion] = history.find(_.commitTimeMs >= src.ms)
    if (src.version >= 0L) history.find(_.version == src.version).orElse(byTimestamp)
    else byTimestamp
  }

  /** Every (root, source, attributed commit) of the topic's delete
    * commits that lands in `(fromVer, toVer]` — one entry per plain root,
    * one per folded commit on fold roots, REPLICA-deduped by
    * [[Catalog.dedupedVectorSources]] (the single crashed-fold
    * supersession rule) so a fold that died between committing its merged
    * root and marking an input can never double-emit. The fourth element
    * says whether the root needs reader-side source narrowing (it carries
    * OTHER sources too). */
  def attributedSources(catalog: Catalog, topic: String,
                        history: Vector[TopicVersion], fromVer: Long, toVer: Long):
      Seq[(String, graft.engine.VectorSource, TopicVersion, Boolean)] = {
    val multiByRoot = scala.collection.mutable.Map.empty[String, Boolean]
    catalog.dedupedVectorSources(topic).flatMap { case (root, src) =>
      val multi = multiByRoot.getOrElseUpdate(root,
        catalog.vectorRootSources(root).size > 1)
      attributeSource(src, history)
        .filter(v => v.version > fromVer && v.version <= toVer)
        .map(v => (root, src, v, multi))
    }
  }

  /** Plan the change feed for commits in `(fromVer, toVer]` with insert id
    * windows `[from(p), until(p))`. `history` must be the topic's current
    * retained history (one `versionHistory` read per plan, shared by both
    * sides). */
  def planChanges(catalog: Catalog, topic: String, targets: Option[Set[Int]],
                  fromVer: Long, toVer: Long,
                  from: Int => Long, until: Int => Long,
                  stats: Option[FileStatsCache],
                  history: Vector[TopicVersion]): Array[InputPartition] = {
    // Insert attribution is per ROW by id (first commit whose watermark
    // covers it), so the span is every retained version up to `toVer` —
    // NOT just (fromVer, toVer]: the id window already excludes pre-span
    // rows for a batch read, and a rate-capped STREAM legitimately drains
    // ids belonging to versions at/below its already-advanced version
    // frontier (deletes advance `ver` on the first trigger; inserts may
    // lag triggers behind).
    val insertSpan = history.filter(_.version <= toVer)
    val span = history.filter(v => v.version > fromVer && v.version <= toVer)

    val inserts = GraftPartitions.plan(catalog, topic, targets, from, until,
        stats, deleteMode = GraftDeleteMode.Ignore)
      .collect { case ip: GraftInputPartition =>
        ip.copy(cdf = Some(CdfSlice("insert", -1L, -1L,
          insertSpan.map(v =>
            (v.version, v.watermarks.getOrElse(ip.partition, 0L), v.commitTimeMs)))))
      }

    // one bounded preimage scan per in-span vector ROOT: a plain root is
    // one delete commit (constant attribution); a fold root with several
    // in-span folded commits plans ONE scan whose reader attributes each
    // preimage ROW by its (_v, _ms) stamp — the span never costs more
    // scans than there are roots, and each scan clamps to the union of
    // its in-span sources' id bounds
    val deletes = attributedSources(catalog, topic, history, fromVer, toVer)
      .groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (root, entries) =>
        val bounds: Map[Int, (Long, Long)] = entries
          .flatMap { case (_, src, _, _) => src.bounds.toSeq }
          .groupBy(_._1).view.mapValues { bs =>
            val lo = bs.map(_._2.minId).min
            val hi = bs.map(_._2.maxId).max
            (lo, if (hi == Long.MaxValue) Long.MaxValue else hi + 1L)
          }.toMap
        val (mode, cdfSlice) = entries match {
          case Seq((_, src, v, multi)) =>
            (GraftDeleteMode.Only(root,
              if (multi) Some((src.version, src.ms)) else None),
              CdfSlice("delete", v.version, v.commitTimeMs))
          case many =>
            (GraftDeleteMode.Only(root),
              CdfSlice("delete", -1L, -1L, Nil,
                sources = many.map { case (_, src, v, _) =>
                  (src.version, src.ms, v.version, v.commitTimeMs) }))
        }
        GraftPartitions.plan(catalog, topic, targets,
            from = p => bounds.get(p).fold(Long.MaxValue)(_._1),
            until = p => bounds.get(p).fold(Long.MinValue)(_._2),
            stats, deleteMode = mode)
          .collect { case ip: GraftInputPartition =>
            ip.copy(cdf = Some(cdfSlice))
          }
      }
    (inserts ++ deletes).toArray[InputPartition]
  }
}
