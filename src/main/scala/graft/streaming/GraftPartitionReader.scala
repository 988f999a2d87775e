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
            columnar: Boolean = false): GraftReaderFactory = {
    val it = conf.iterator()
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); entries += e.getKey -> e.getValue }
    new GraftReaderFactory(requiredSchema, entries.toArray, serializerJson, columnar)
  }
}

final class GraftPartitionReader(
    slice: GraftInputPartition, requiredSchema: StructType,
    confEntries: Array[(String, String)],
    serializerJson: String = """{"type":"json"}""")
  extends PartitionReader[InternalRow] {

  /** Columns actually decoded from Parquet: the pruned schema minus the
    * virtual columns — `partition` (a per-slice constant) and `_file` (a
    * per-file constant), both appended by the vectorized reader — plus
    * `event_id` — always read, because the slice bounds ARE the commit
    * watermark and must hold exactly even when the consumer projected the
    * id away. */
  private val readSchema: StructType = GraftReaderSupport.readSchemaOf(requiredSchema)
  private val idOrdinal = readSchema.fieldIndex("event_id")

  private val conf = GraftReaderSupport.buildConf(
    confEntries, readSchema, slice.fromId, slice.untilId)

  /** Vector-deleted ids overlapping this slice (sorted; usually empty). */
  private val deleted: Array[Long] = GraftReaderSupport.loadDeletedIds(
    slice.deleteFiles, confEntries, slice.partition, slice.fromId, slice.untilId)

  /** The reader emits `readSchema ++ (partition, _file)`; this maps it back
    * to the pruned schema's column order. */
  private val projection = ProjectingInternalRow(
    requiredSchema,
    requiredSchema.map { f =>
      if (f.name == "partition") readSchema.length
      else if (f.name == GraftTopicTable.FileColumn) readSchema.length + 1
      else readSchema.fieldIndex(f.name)
    }.toIndexedSeq)

  /** Z1: topics with a non-default serializer store metadata in its encoded
    * form — decode it through the SAME rehydrated plugin the consumer view
    * uses. Default-json topics keep the zero-copy projection path
    * (`decodeOrdinal < 0` ⇒ no per-row allocation). */
  private val serializer = graft.engine.Serializer.fromDescriptorJson(serializerJson)
  private val decodeOrdinal: Int =
    if (serializer == graft.engine.Serializer.Json) -1
    else requiredSchema.fieldNames.indexOf("metadata")
  private val decodedRow =
    if (decodeOrdinal < 0) null else new GenericInternalRow(requiredSchema.length)

  private def fillDecoded(): Unit = {
    var i = 0
    while (i < requiredSchema.length) {
      decodedRow.update(i,
        if (projection.isNullAt(i)) null
        else projection.get(i, requiredSchema(i).dataType))
      i += 1
    }
    if (!projection.isNullAt(decodeOrdinal))
      decodedRow.update(decodeOrdinal,
        serializer.decode(projection.getUTF8String(decodeOrdinal)))
  }

  private val fileQueue = scala.collection.mutable.Queue(slice.files: _*)
  private var reader: VectorizedParquetRecordReader = _

  override def next(): Boolean = {
    while (true) {
      if (reader != null) {
        if (reader.nextKeyValue()) {
          val r = reader.getCurrentValue.asInstanceOf[InternalRow]
          val id = r.getLong(idOrdinal)
          // deleteKeepOnly inverts the vector filter: surface ONLY the
          // vectored rows (change-data-feed delete preimages)
          val passesVectors =
            if (slice.deleteKeepOnly)
              deleted.length > 0 && java.util.Arrays.binarySearch(deleted, id) >= 0
            else
              deleted.length == 0 || java.util.Arrays.binarySearch(deleted, id) < 0
          if (id >= slice.fromId && id < slice.untilId && passesVectors) {
            projection.project(r)
            if (decodeOrdinal >= 0) fillDecoded()
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
    if (decodeOrdinal >= 0) decodedRow else projection

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }

  private def openFile(path: String): Unit =
    // the directory-partition value and file path ride as constant columns
    // (the `_file` metadata column costs nothing per row)
    reader = GraftReaderSupport.openVectorized(
      path, conf, slice.partition, returningBatches = false)
}
