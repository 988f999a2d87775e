package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.{InternalRow, ProjectingInternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.types._

/**
 * Executor-side reader for one topic-partition slice `[fromId, untilId)`.
 *
 * Decoding runs through Spark's own vectorized Parquet reader (columnar
 * page decode, the same engine `spark.read.parquet` uses), surfaced
 * row-at-a-time so the slice's id range — the commit watermark — can be
 * enforced exactly per row. Row groups wholly outside the range are skipped
 * by a pushed parquet `FilterPredicate` over the `event_id` footer
 * statistics — the consumer-side analog of the reference's index-based
 * chunk addressing (`/root/reference/src/DefaultPartitionManager.cpp:461-486`:
 * cursor → IndexRecord range → targeted chunk reads).
 */
final class GraftReaderFactory(
    requiredSchema: StructType, confEntries: Array[(String, String)],
    serializerJson: String, columnar: Boolean = false)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(
      partition.asInstanceOf[GraftInputPartition], requiredSchema, confEntries,
      serializerJson)

  /** Columnar handoff (see [[GraftColumnarPartitionReader]]): enabled for
    * batch scans of default-serializer topics — a non-default serializer
    * decodes the stored metadata form per row, which is inherently a row
    * path (Z1). Uniform across partitions, as `BatchScanExec` requires. */
  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftColumnarPartitionReader(
      partition.asInstanceOf[GraftInputPartition], requiredSchema, confEntries)
}

object GraftReaderFactory {
  /** Snapshot the driver's Hadoop configuration into a serializable form so
    * executor-side readers see the same filesystem settings (s3a
    * credentials/endpoints, HDFS nameservices, …) as driver-side planning —
    * a bare `new Configuration()` would only load the defaults. */
  def apply(requiredSchema: StructType, conf: Configuration,
            serializerJson: String = """{"type":"json"}""",
            columnar: Boolean = false): GraftReaderFactory =
    new GraftReaderFactory(requiredSchema, confSnapshot(conf), serializerJson, columnar)

  /** The serializable driver-conf snapshot every executor-side writer and
    * reader shares (the MERGE staging writers use it too). */
  def confSnapshot(conf: Configuration): Array[(String, String)] = {
    val it = conf.iterator()
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); entries += e.getKey -> e.getValue }
    entries.toArray
  }
}

final class GraftPartitionReader(
    slice: GraftInputPartition, requiredSchema: StructType,
    confEntries: Array[(String, String)],
    serializerJson: String = """{"type":"json"}""")
  extends PartitionReader[InternalRow] {

  /** Change-feed slice metadata: when set, the pruned schema may contain
    * the virtual `_change_type` / `_commit_version` / `_commit_timestamp`
    * columns, computed here (insert attribution per row, delete constants
    * per slice) — never read from parquet. */
  private val cdfSlice: Option[CdfSlice] = slice.cdf
  /** The pruned schema minus the CDF virtuals — what the projection maps. */
  private val baseSchema: StructType =
    if (cdfSlice.isEmpty) requiredSchema
    else StructType(requiredSchema.filterNot(f => GraftCdf.Columns.contains(f.name)))

  /** Columns actually decoded from Parquet: the pruned schema minus the
    * virtual columns — `partition` (a per-slice constant), `_file` (a
    * per-file constant), both appended by the vectorized reader, and the
    * CDF columns (computed here) — plus `event_id` — always read, because
    * the slice bounds ARE the commit watermark and must hold exactly even
    * when the consumer projected the id away. */
  private val readSchema: StructType = GraftReaderSupport.readSchemaOf(baseSchema)
  private val idOrdinal = readSchema.fieldIndex("event_id")

  private val conf = GraftReaderSupport.buildConf(
    confEntries, readSchema, slice.fromId, slice.untilId)

  /** Vector-deleted ids overlapping this slice (sorted; usually empty).
    * On a multi-source fold-root preimage scan, `deletedSrc` carries each
    * id's source ordinal in the slice's `cdf.sources` — per-row commit
    * attribution at ONE scan of the root. */
  private val (deleted: Array[Long], deletedSrc: Array[Int]) =
    cdfSlice.map(_.sources) match {
      case Some(srcs) if srcs.nonEmpty =>
        GraftReaderSupport.loadDeletedIdsWithSources(
          slice.deleteFiles, confEntries, slice.partition,
          slice.fromId, slice.untilId, srcs.map(t => (t._1, t._2)))
      case _ =>
        (GraftReaderSupport.loadDeletedIds(
          slice.deleteFiles, confEntries, slice.partition,
          slice.fromId, slice.untilId, slice.deleteSource),
          Array.emptyIntArray)
    }

  private val (exLo, exHi) = slice.excludeArrays

  /** The reader emits `readSchema ++ (partition, _file)`; this maps it back
    * to the pruned schema's column order (CDF virtuals excluded — filled
    * into [[outRow]] directly). */
  private val projection = ProjectingInternalRow(
    baseSchema,
    baseSchema.map { f =>
      if (f.name == "partition" ||
        f.name == GraftTopicTable.RowPartitionColumn) readSchema.length
      else if (f.name == GraftTopicTable.FileColumn) readSchema.length + 1
      else readSchema.fieldIndex(f.name)
    }.toIndexedSeq)

  /** Z1: topics with a non-default serializer store metadata in its encoded
    * form — decode it through the SAME rehydrated plugin the consumer view
    * uses. Default-json topics keep the zero-copy projection path
    * (`decodeOrdinal < 0` and no CDF ⇒ no per-row allocation). */
  private val serializer = graft.engine.Serializer.fromDescriptorJson(serializerJson)
  private val decodeOrdinal: Int =
    if (serializer == graft.engine.Serializer.Json) -1
    else baseSchema.fieldNames.indexOf("metadata")

  /** Materialized output row — needed when metadata must be decoded (Z1) or
    * CDF virtuals are appended; null on the zero-copy fast path. */
  private val outRow: GenericInternalRow =
    if (decodeOrdinal < 0 && cdfSlice.isEmpty) null
    else new GenericInternalRow(requiredSchema.length)
  /** baseSchema field i → its position in requiredSchema. */
  private val basePos: Array[Int] =
    baseSchema.fieldNames.map(requiredSchema.fieldIndex)

  // CDF output ordinals (those that survived pruning) + insert-attribution
  // span as flat arrays: per row, the commit is the FIRST span entry whose
  // id watermark exceeds the row id (ids dense, watermarks monotone — the
  // exact rule of TopicHandle.changes); span length is bounded by the
  // manifest retention (ManifestSnapshotEvery + 1), so the scan is O(1).
  private val ctOrd = requiredSchema.fieldNames.indexOf(GraftCdf.ChangeTypeColumn)
  private val cvOrd = requiredSchema.fieldNames.indexOf(GraftCdf.CommitVersionColumn)
  private val tsOrd = requiredSchema.fieldNames.indexOf(GraftCdf.CommitTimestampColumn)
  private val changeTypeUtf =
    cdfSlice.map(c => org.apache.spark.unsafe.types.UTF8String.fromString(
      c.changeType)).orNull
  private val isDeleteSlice = cdfSlice.exists(_.changeType == "delete")
  private val spanVers: Array[Long] = cdfSlice.map(_.span.map(_._1).toArray).getOrElse(Array.empty)
  private val spanWms: Array[Long] = cdfSlice.map(_.span.map(_._2).toArray).getOrElse(Array.empty)
  private val spanTs: Array[Long] = cdfSlice.map(_.span.map(_._3).toArray).getOrElse(Array.empty)

  private val srcEffVer: Array[Long] =
    cdfSlice.map(_.sources.map(_._3).toArray).getOrElse(Array.empty)
  private val srcEffTs: Array[Long] =
    cdfSlice.map(_.sources.map(_._4).toArray).getOrElse(Array.empty)

  private def fillCdf(c: CdfSlice, id: Long): Unit = {
    if (ctOrd >= 0) outRow.update(ctOrd, changeTypeUtf)
    if (isDeleteSlice) {
      if (srcEffVer.nonEmpty) {
        // multi-source fold root: the row's commit is its source's —
        // the id passed the keepOnly filter, so the search always hits
        val ix = deletedSrc(java.util.Arrays.binarySearch(deleted, id))
        if (cvOrd >= 0) outRow.update(cvOrd, srcEffVer(ix))
        if (tsOrd >= 0) outRow.update(tsOrd, srcEffTs(ix) * 1000L)
      } else {
        if (cvOrd >= 0) outRow.update(cvOrd, c.version)
        if (tsOrd >= 0) outRow.update(tsOrd, c.tsMillis * 1000L)
      }
    } else {
      var i = 0
      while (i < spanWms.length && spanWms(i) <= id) i += 1
      val found = i < spanWms.length
      if (cvOrd >= 0) outRow.update(cvOrd, if (found) spanVers(i) else null)
      if (tsOrd >= 0) outRow.update(tsOrd, if (found) spanTs(i) * 1000L else null)
    }
  }

  private def fillOut(id: Long): Unit = {
    var i = 0
    while (i < baseSchema.length) {
      outRow.update(basePos(i),
        if (projection.isNullAt(i)) null
        else projection.get(i, baseSchema(i).dataType))
      i += 1
    }
    if (decodeOrdinal >= 0 && !projection.isNullAt(decodeOrdinal))
      outRow.update(basePos(decodeOrdinal),
        serializer.decode(projection.getUTF8String(decodeOrdinal)))
    cdfSlice.foreach(fillCdf(_, id))
  }

  private val fileQueue = scala.collection.mutable.Queue(slice.files: _*)
  private var reader: VectorizedParquetRecordReader = _

  override def next(): Boolean = {
    while (true) {
      if (reader != null) {
        if (reader.nextKeyValue()) {
          val r = reader.getCurrentValue.asInstanceOf[InternalRow]
          val id = r.getLong(idOrdinal)
          if (id >= slice.fromId && id < slice.untilId &&
              GraftReaderSupport.passesVectors(deleted, slice.deleteKeepOnly, id) &&
              GraftReaderSupport.outsideExcluded(exLo, exHi, id)) {
            projection.project(r)
            if (outRow != null) fillOut(id)
            return true
          }
        } else {
          reader.close(); reader = null
        }
      } else if (fileQueue.nonEmpty) {
        openFile(fileQueue.dequeue())
      } else {
        return false
      }
    }
    false
  }

  override def get(): InternalRow =
    if (outRow != null) outRow else projection

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }

  private def openFile(path: String): Unit =
    // the directory-partition value and file path ride as constant columns
    // (the `_file` metadata column costs nothing per row)
    reader = GraftReaderSupport.openVectorized(
      path, conf, slice.partition, returningBatches = false)
}
