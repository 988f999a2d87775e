package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapred.FileSplit // extends the mapreduce one; Spark's base reader casts to it
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetInputFormat
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
    serializerJson: String)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(
      partition.asInstanceOf[GraftInputPartition], requiredSchema, confEntries,
      serializerJson)
}

object GraftReaderFactory {
  /** Snapshot the driver's Hadoop configuration into a serializable form so
    * executor-side readers see the same filesystem settings (s3a
    * credentials/endpoints, HDFS nameservices, …) as driver-side planning —
    * a bare `new Configuration()` would only load the defaults. */
  def apply(requiredSchema: StructType, conf: Configuration,
            serializerJson: String = """{"type":"json"}"""): GraftReaderFactory = {
    val it = conf.iterator()
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); entries += e.getKey -> e.getValue }
    new GraftReaderFactory(requiredSchema, entries.toArray, serializerJson)
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
  private val readSchema: StructType = {
    val dataCols = requiredSchema.filter(f =>
      f.name != "partition" && f.name != GraftTopicTable.FileColumn)
    if (dataCols.exists(_.name == "event_id")) StructType(dataCols)
    else StructType(dataCols :+ StructField("event_id", LongType, nullable = false))
  }
  private val idOrdinal = readSchema.fieldIndex("event_id")

  private val conf = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c.set("org.apache.spark.sql.parquet.row.requested_schema", readSchema.json)
    c.set(ParquetInputFormat.READ_SUPPORT_CLASS,
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    // the parquet→spark schema converter reads these five keys with a raw
    // .toBoolean (normally injected by ParquetFileFormat); the event schema
    // has no timestamp columns, so the timestamp-related values are inert
    c.setBoolean("spark.sql.parquet.binaryAsString", false)
    c.setBoolean("spark.sql.parquet.int96AsTimestamp", false)
    c.setBoolean("spark.sql.caseSensitive", false)
    c.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled", true)
    c.setBoolean("spark.sql.legacy.parquet.nanosAsLong", false)
    // row groups provably outside [fromId, untilId) are dropped from the
    // footer before any page is read
    ParquetInputFormat.setFilterPredicate(c, FilterApi.and(
      FilterApi.gtEq(FilterApi.longColumn("event_id"), java.lang.Long.valueOf(slice.fromId)),
      FilterApi.lt(FilterApi.longColumn("event_id"), java.lang.Long.valueOf(slice.untilId))))
    c
  }

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
          if (id >= slice.fromId && id < slice.untilId) {
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

  private def openFile(path: String): Unit = {
    val p = new Path(path)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    val r = new VectorizedParquetRecordReader(
      null, // no timestamp columns in the event schema → no tz conversion
      "CORRECTED", "UTC", "CORRECTED", "UTC",
      false, 4096)
    r.initialize(
      new FileSplit(p, 0, len, Array.empty[String]),
      new TaskAttemptContextImpl(conf, new TaskAttemptID()))
    // append the directory-partition value and the file path as constant
    // columns (the `_file` metadata column costs nothing per row)
    r.initBatch(
      StructType(Seq(StructField("partition", IntegerType, nullable = false),
        StructField(GraftTopicTable.FileColumn, StringType, nullable = false))),
      new GenericInternalRow(Array[Any](slice.partition,
        org.apache.spark.unsafe.types.UTF8String.fromString(path))))
    reader = r
  }
}
