package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapred.FileSplit
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetInputFormat
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared reader plumbing for the row and columnar paths: the Hadoop
 * configuration that routes Spark's vectorized Parquet reader (requested
 * schema, read support, row-group id-range skipping) and the per-file
 * reader construction with the slice's constant columns appended.
 */
private[streaming] object GraftReaderSupport {
  /** Columns physically decoded from Parquet: the pruned schema minus the
    * virtual columns (`partition`, `_file` — appended as constants), plus
    * `event_id` — always read, because the slice bounds ARE the commit
    * watermark and must hold exactly even when the consumer projected the
    * id away. */
  /** The deletion-vector row filter shared by the row and columnar
    * readers. `keepOnly` inverts it: surface ONLY the vectored rows — the
    * change-data-feed's delete-preimage side. */
  @inline def passesVectors(deleted: Array[Long], keepOnly: Boolean, id: Long): Boolean =
    if (keepOnly)
      deleted.length > 0 && java.util.Arrays.binarySearch(deleted, id) >= 0
    else
      deleted.length == 0 || java.util.Arrays.binarySearch(deleted, id) < 0

  /** Transaction-exclusion row filter (read_committed): true when `id`
    * lies in NONE of the slice's excluded `[lo, hi)` ranges — the id
    * spans of transactions that have not committed. The range list is
    * metadata-sized (O(live transactions), usually empty) and pre-sorted
    * by `lo`, so a short forward walk with early exit is branch-cheap. */
  @inline def outsideExcluded(exLo: Array[Long], exHi: Array[Long], id: Long): Boolean = {
    var i = 0
    while (i < exLo.length && exLo(i) <= id) {
      if (id < exHi(i)) return false
      i += 1
    }
    true
  }

  def readSchemaOf(requiredSchema: StructType): StructType = {
    val dataCols = requiredSchema.filter(f =>
      f.name != "partition" && f.name != GraftTopicTable.FileColumn &&
        f.name != GraftTopicTable.RowPartitionColumn &&
        !GraftCdf.Columns.contains(f.name))
    if (dataCols.exists(_.name == "event_id")) StructType(dataCols)
    else StructType(dataCols :+ StructField("event_id", LongType, nullable = false))
  }

  def buildConf(
      confEntries: Array[(String, String)], readSchema: StructType,
      fromId: Long, untilId: Long): Configuration =
    // row groups provably outside [fromId, untilId) are dropped from the
    // footer before any page is read
    buildConf(confEntries, readSchema, FilterApi.and(
      FilterApi.gtEq(FilterApi.longColumn("event_id"), java.lang.Long.valueOf(fromId)),
      FilterApi.lt(FilterApi.longColumn("event_id"), java.lang.Long.valueOf(untilId))))

  def buildConf(
      confEntries: Array[(String, String)], readSchema: StructType,
      predicate: org.apache.parquet.filter2.predicate.FilterPredicate): Configuration = {
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
    ParquetInputFormat.setFilterPredicate(c, predicate)
    c
  }

  /** Open one chunk file with the slice's directory-partition value and
    * file path appended as constant columns. */
  def openVectorized(
      path: String, conf: Configuration, partition: Int,
      returningBatches: Boolean): VectorizedParquetRecordReader = {
    val p = new Path(path)
    val len = p.getFileSystem(conf).getFileStatus(p).getLen
    val r = new VectorizedParquetRecordReader(
      null, // no timestamp columns in the event schema → no tz conversion
      "CORRECTED", "UTC", "CORRECTED", "UTC",
      false, 4096)
    r.initialize(
      new FileSplit(p, 0, len, Array.empty[String]),
      new TaskAttemptContextImpl(conf, new TaskAttemptID()))
    r.initBatch(
      StructType(Seq(StructField("partition", IntegerType, nullable = false),
        StructField(GraftTopicTable.FileColumn, StringType, nullable = false))),
      new GenericInternalRow(Array[Any](partition, UTF8String.fromString(path))))
    if (returningBatches) r.enableReturningBatches()
    r
  }

  /**
   * The slice's deletion-vector ids, sorted: every `event_id` vector-
   * deleted from `partition` within `[fromId, untilId)`. Vector roots are
   * directory-partitioned like the log itself, so the slice lists ONLY its
   * own `partition=p/` subdirectory (directory-level pruning — no foreign
   * footer reads), and the id-range predicate prunes row groups within it.
   * A slice therefore pays for the deletes that OVERLAP it, not the
   * topic's whole delete history. Readers drop a row when
   * `Arrays.binarySearch(deleted, id) >= 0`.
   */
  def loadDeletedIds(
      deleteDirs: Seq[String], confEntries: Array[(String, String)],
      partition: Int, fromId: Long, untilId: Long,
      source: Option[(Long, Long)] = None): Array[Long] = {
    if (deleteDirs.isEmpty) return Array.emptyLongArray
    // source narrowing (fold roots only — their files always carry the
    // `_v`/`_ms` source-attribution columns): keep the one folded delete
    // commit this preimage scan replays; the pushed eq predicates prune
    // row groups, the per-row re-check is exact
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    walkVectorRows(deleteDirs, confEntries, partition, fromId, untilId,
        withSourceCols = source.isDefined,
        extraPredicate = source.map { case (v, ms) => FilterApi.and(
          FilterApi.eq(FilterApi.longColumn("_v"), java.lang.Long.valueOf(v)),
          FilterApi.eq(FilterApi.longColumn("_ms"), java.lang.Long.valueOf(ms))) }) {
      row =>
        val srcOk = source.forall { case (v, ms) =>
          row.getLong(1) == v && row.getLong(2) == ms
        }
        if (srcOk) out += row.getLong(0)
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  /** [[loadDeletedIds]] over a FOLD root, keeping per-id SOURCE ordinals:
    * only rows stamped with one of `sources` (the slice's in-span folded
    * commits, as (rawVersion, rawMs)) load, and each kept id carries the
    * index of its source in that seq — the change-feed reader fills the
    * commit columns per row from it. Returns (ids sorted ascending,
    * parallel source ordinals). */
  def loadDeletedIdsWithSources(
      deleteDirs: Seq[String], confEntries: Array[(String, String)],
      partition: Int, fromId: Long, untilId: Long,
      sources: Seq[(Long, Long)]): (Array[Long], Array[Int]) = {
    if (deleteDirs.isEmpty || sources.isEmpty)
      return (Array.emptyLongArray, Array.emptyIntArray)
    val ordinal: Map[(Long, Long), Int] = sources.zipWithIndex.toMap
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    walkVectorRows(deleteDirs, confEntries, partition, fromId, untilId,
        withSourceCols = true, extraPredicate = None) { row =>
      ordinal.get((row.getLong(1), row.getLong(2)))
        .foreach(ix => pairs += ((row.getLong(0), ix)))
    }
    val sorted = pairs.sortBy(_._1)
    (sorted.map(_._1).toArray, sorted.map(_._2).toArray)
  }

  /** The ONE vector-root walker both loaders share: lists ONLY this
    * partition's `partition=p/` subdirectory of each root (directory-
    * level pruning — no foreign footer reads; an absent subdir means no
    * deletes there, or the root was physically reaped after this slice
    * planned — equally empty), pushes the id-range (plus any extra)
    * predicate for row-group skipping, and hands each surviving IN-RANGE
    * row to `f` (row-group pruning is statistics-coarse, so the id range
    * is re-checked here; source stamps are the caller's to check). */
  private def walkVectorRows(
      deleteDirs: Seq[String], confEntries: Array[(String, String)],
      partition: Int, fromId: Long, untilId: Long,
      withSourceCols: Boolean,
      extraPredicate: Option[org.apache.parquet.filter2.predicate.FilterPredicate])(
      f: org.apache.spark.sql.catalyst.InternalRow => Unit): Unit = {
    val idCol = StructField("event_id", LongType, nullable = false)
    val schema =
      if (withSourceCols) StructType(Seq(idCol,
        StructField("_v", LongType, nullable = false),
        StructField("_ms", LongType, nullable = false)))
      else StructType(Seq(idCol))
    val idRange = FilterApi.and(
      FilterApi.gtEq(FilterApi.longColumn("event_id"), java.lang.Long.valueOf(fromId)),
      FilterApi.lt(FilterApi.longColumn("event_id"), java.lang.Long.valueOf(untilId)))
    val c = buildConf(confEntries, schema,
      extraPredicate.fold(idRange)(FilterApi.and(idRange, _)))
    deleteDirs.foreach { dirStr =>
      val sub = new Path(dirStr, s"partition=$partition")
      val fs = sub.getFileSystem(c)
      val parts =
        if (!fs.exists(sub)) Array.empty[Path]
        else fs.listStatus(sub)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      parts.foreach { p =>
        val len = fs.getFileStatus(p).getLen
        val r = new VectorizedParquetRecordReader(
          null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, 4096)
        try {
          r.initialize(
            new FileSplit(p, 0, len, Array.empty[String]),
            new TaskAttemptContextImpl(c, new TaskAttemptID()))
          r.initBatch(new StructType(), new GenericInternalRow(Array.empty[Any]))
          while (r.nextKeyValue()) {
            val row = r.getCurrentValue.asInstanceOf[
              org.apache.spark.sql.catalyst.InternalRow]
            val id = row.getLong(0)
            if (id >= fromId && id < untilId) f(row)
          }
        } finally r.close()
      }
    }
  }
}

/** Mutable selection shared by every [[SelectionColumnVector]] of one
  * output batch: `idx(outputRow) = underlying row`. Rebuilt per decoded
  * batch, only when the batch needed trimming. */
private[streaming] final class RowSelection {
  var idx: Array[Int] = Array.emptyIntArray
}

/**
 * A [[ColumnVector]] view that remaps row ids through a shared
 * [[RowSelection]] — how a partially-in-range decoded batch surfaces only
 * its in-window rows without copying any column data. Children (struct
 * fields) share the parent's selection, so nested access remaps once at
 * every level, matching how [[ColumnarRow]] addresses children by the
 * parent's row id.
 */
private[streaming] final class SelectionColumnVector(
    under: ColumnVector, sel: RowSelection)
  extends ColumnVector(under.dataType) {
  @inline private def m(rowId: Int): Int = sel.idx(rowId)

  override def close(): Unit = () // lifecycle owned by the parquet reader
  // may over-report relative to the selected window — only ever disables
  // a skip-null fast path, never fabricates a null
  override def hasNull: Boolean = under.hasNull
  override def numNulls: Int = under.numNulls
  override def isNullAt(rowId: Int): Boolean = under.isNullAt(m(rowId))
  override def getBoolean(rowId: Int): Boolean = under.getBoolean(m(rowId))
  override def getByte(rowId: Int): Byte = under.getByte(m(rowId))
  override def getShort(rowId: Int): Short = under.getShort(m(rowId))
  override def getInt(rowId: Int): Int = under.getInt(m(rowId))
  override def getLong(rowId: Int): Long = under.getLong(m(rowId))
  override def getFloat(rowId: Int): Float = under.getFloat(m(rowId))
  override def getDouble(rowId: Int): Double = under.getDouble(m(rowId))
  override def getArray(rowId: Int): ColumnarArray = under.getArray(m(rowId))
  override def getMap(rowId: Int): ColumnarMap = under.getMap(m(rowId))
  override def getDecimal(rowId: Int, precision: Int, scale: Int) =
    under.getDecimal(m(rowId), precision, scale)
  override def getUTF8String(rowId: Int): UTF8String = under.getUTF8String(m(rowId))
  override def getBinary(rowId: Int): Array[Byte] = under.getBinary(m(rowId))
  override def getInterval(rowId: Int) = under.getInterval(m(rowId))
  private lazy val kids =
    new java.util.concurrent.ConcurrentHashMap[Integer, SelectionColumnVector]()
  override def getChild(ordinal: Int): ColumnVector =
    kids.computeIfAbsent(ordinal, o => new SelectionColumnVector(under.getChild(o), sel))
}

/**
 * Executor-side COLUMNAR reader for one topic-partition slice: the same
 * vectorized Parquet decode as [[GraftPartitionReader]], but surfacing
 * whole [[ColumnarBatch]]es to Spark's `ColumnarToRow` codegen — the
 * built-in parquet scan's handoff — instead of materializing rows one at
 * a time through the `PartitionReader[InternalRow]` interface. At scale
 * this is the difference between per-row virtual calls per column and a
 * tight codegen loop over column vectors.
 *
 * The slice's id window `[fromId, untilId)` — the commit watermark, a
 * consumer cursor, or a version pin, none of which Spark re-applies as a
 * predicate — is enforced exactly, per batch: one pass over the decoded
 * `event_id` vector classifies the batch as fully-in-window (surfaced
 * untouched — the overwhelmingly common case, since committed chunk files
 * lie wholly inside the watermark) or partial (surfaced through
 * [[SelectionColumnVector]] views that remap only in-window rows). No
 * ordering assumption on ids within a file is required, so clustering
 * rewrites (Z-order) stay safe.
 *
 * Reference analog: the consumer's batch receive path hands the fetch
 * buffer to the application whole rather than event-at-a-time
 * (`/root/reference/src/MofkaConsumer.cpp:134-238`, `recvBatch`).
 */
final class GraftColumnarPartitionReader(
    slice: GraftInputPartition, requiredSchema: StructType,
    confEntries: Array[(String, String)])
  extends PartitionReader[ColumnarBatch] {

  private val readSchema = GraftReaderSupport.readSchemaOf(requiredSchema)
  private val idOrdinal = readSchema.fieldIndex("event_id")
  private val conf = GraftReaderSupport.buildConf(
    confEntries, readSchema, slice.fromId, slice.untilId)
  /** Vector-deleted ids overlapping this slice (sorted; usually empty). */
  private val deleted: Array[Long] = GraftReaderSupport.loadDeletedIds(
    slice.deleteFiles, confEntries, slice.partition, slice.fromId, slice.untilId,
    slice.deleteSource)
  private val (exLo, exHi) = slice.excludeArrays
  @inline private def kept(id: Long): Boolean =
    id >= slice.fromId && id < slice.untilId &&
      GraftReaderSupport.passesVectors(deleted, slice.deleteKeepOnly, id) &&
      GraftReaderSupport.outsideExcluded(exLo, exHi, id)

  /** Output-column order: `requiredSchema`, drawn from the decoded batch's
    * `readSchema ++ (partition, _file)` layout. */
  private val outOrdinals: Array[Int] = requiredSchema.map { f =>
    if (f.name == "partition" ||
      f.name == GraftTopicTable.RowPartitionColumn) readSchema.length
    else if (f.name == GraftTopicTable.FileColumn) readSchema.length + 1
    else readSchema.fieldIndex(f.name)
  }.toArray

  private val fileQueue = scala.collection.mutable.Queue(slice.files: _*)
  private var reader: VectorizedParquetRecordReader = _
  // per-file wrappers over the reader's (stable) result-batch vectors
  private var rawBatch: ColumnarBatch = _
  private var selBatch: ColumnarBatch = _
  private val selection = new RowSelection
  private var current: ColumnarBatch = _

  override def next(): Boolean = {
    while (true) {
      if (reader != null) {
        if (reader.nextKeyValue()) {
          if (prepare(reader.getCurrentValue.asInstanceOf[ColumnarBatch])) return true
        } else { reader.close(); reader = null }
      } else if (fileQueue.nonEmpty) {
        openFile(fileQueue.dequeue())
      } else return false
    }
    false
  }

  /** One pass over the id vector: all-in → raw batch; some-in → selection
    * views; none-in → skip the batch entirely. */
  private def prepare(b: ColumnarBatch): Boolean = {
    val n = b.numRows()
    if (n == 0) return false
    val ids = b.column(idOrdinal)
    var nKept = 0; var i = 0
    while (i < n) {
      if (kept(ids.getLong(i))) nKept += 1
      i += 1
    }
    if (nKept == 0) return false
    if (nKept == n) {
      rawBatch.setNumRows(n)
      current = rawBatch
    } else {
      if (selection.idx.length < nKept) selection.idx = new Array[Int](n)
      var j = 0; i = 0
      while (i < n) {
        if (kept(ids.getLong(i))) { selection.idx(j) = i; j += 1 }
        i += 1
      }
      selBatch.setNumRows(nKept)
      current = selBatch
    }
    true
  }

  override def get(): ColumnarBatch = current

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }

  private def openFile(path: String): Unit = {
    val r = GraftReaderSupport.openVectorized(
      path, conf, slice.partition, returningBatches = true)
    val result = r.resultBatch()
    val rawCols = outOrdinals.map(result.column)
    rawBatch = new ColumnarBatch(rawCols.asInstanceOf[Array[ColumnVector]])
    selBatch = new ColumnarBatch(
      rawCols.map(new SelectionColumnVector(_, selection): ColumnVector))
    reader = r
  }
}
