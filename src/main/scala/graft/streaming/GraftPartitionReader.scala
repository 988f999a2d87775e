package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.LongStatistics
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/**
 * Executor-side reader for one topic-partition slice `[fromId, untilId)`.
 *
 * Reads the partition's Parquet chunk files with the parquet-hadoop Group
 * API, requesting ONLY the pruned columns (plus `event_id` for range
 * filtering) and skipping whole row groups whose `event_id` footer
 * statistics fall outside the range — the consumer-side analog of the
 * reference's index-based chunk addressing
 * (`/root/reference/src/DefaultPartitionManager.cpp:461-486`: cursor →
 * IndexRecord range → targeted chunk reads).
 */
final class GraftReaderFactory(
    requiredSchema: StructType, confEntries: Array[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(
      partition.asInstanceOf[GraftInputPartition], requiredSchema, confEntries)
}

object GraftReaderFactory {
  /** Snapshot the driver's Hadoop configuration into a serializable form so
    * executor-side readers see the same filesystem settings (s3a
    * credentials/endpoints, HDFS nameservices, …) as driver-side planning —
    * a bare `new Configuration()` would only load the defaults. */
  def apply(requiredSchema: StructType, conf: Configuration): GraftReaderFactory = {
    val it = conf.iterator()
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); entries += e.getKey -> e.getValue }
    new GraftReaderFactory(requiredSchema, entries.toArray)
  }
}

final class GraftPartitionReader(
    slice: GraftInputPartition, requiredSchema: StructType,
    confEntries: Array[(String, String)])
  extends PartitionReader[InternalRow] {

  private val conf = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val fileQueue = scala.collection.mutable.Queue(slice.files: _*)

  private var reader: ParquetFileReader = _
  private var fileSchema: MessageType = _
  private var readSchema: MessageType = _
  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var rowsLeftInGroup: Long = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      if (rowsLeftInGroup > 0) {
        rowsLeftInGroup -= 1
        val g = recordReader.read()
        if (g != null) {
          val id = g.getLong("event_id", 0)
          if (id >= slice.fromId && id < slice.untilId) {
            current = toRow(g)
            return true
          }
        }
      } else if (reader != null) {
        if (!advanceRowGroup()) { reader.close(); reader = null }
      } else if (fileQueue.nonEmpty) {
        openFile(fileQueue.dequeue())
      } else {
        return false
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }

  private var readGroupIndex = 0

  private def openFile(path: String): Unit = {
    reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    fileSchema = reader.getFooter.getFileMetaData.getSchema
    readGroupIndex = 0
    // project to required columns + event_id (needed for range filtering)
    val wanted = (requiredSchema.fieldNames.toSeq :+ "event_id").distinct
      .filter(fileSchema.containsField)
    readSchema = new MessageType("event",
      wanted.map(n => fileSchema.getType(Seq(n): _*)): _*)
    reader.setRequestedSchema(readSchema)
  }

  /** Position on the next row group, skipping those provably outside
    * `[fromId, untilId)` per footer statistics. */
  private def advanceRowGroup(): Boolean = {
    val blocks = reader.getRowGroups
    while (readGroupIndex < blocks.size()) {
      val block = blocks.get(readGroupIndex)
      readGroupIndex += 1
      val idStats: Option[LongStatistics] = {
        var found: LongStatistics = null
        val it = block.getColumns.iterator()
        while (it.hasNext && found == null) {
          val c = it.next()
          if (c.getPath.toDotString == "event_id") c.getStatistics match {
            case ls: LongStatistics if ls.hasNonNullValue => found = ls
            case _ =>
          }
        }
        Option(found)
      }
      val skip = idStats.exists(s => s.getMax < slice.fromId || s.getMin >= slice.untilId)
      if (skip) {
        reader.skipNextRowGroup()
      } else {
        val pages = reader.readNextRowGroup()
        if (pages == null) return false
        val columnIO = new ColumnIOFactory().getColumnIO(readSchema, fileSchema)
        recordReader = columnIO.getRecordReader(pages, new GroupRecordConverter(readSchema))
        rowsLeftInGroup = pages.getRowCount
        return true
      }
    }
    false
  }

  private def toRow(g: Group): InternalRow = {
    val values = requiredSchema.fields.map { f =>
      f.name match {
        case "partition" => slice.partition
        case "event_id" => g.getLong("event_id", 0)
        case "metadata" =>
          if (present(g, "metadata")) UTF8String.fromString(g.getString("metadata", 0)) else null
        case "data" =>
          if (present(g, "data")) g.getBinary("data", 0).getBytes else null
        case other => throw new IllegalStateException(s"unexpected column $other")
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  private def present(g: Group, field: String): Boolean =
    readSchema.containsField(field) && g.getFieldRepetitionCount(field) > 0
}
