package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.Catalog
import graft.streaming.{GraftRowsPartition, GraftRowsReaderFactory}

/**
 * Iceberg-style SQL metadata tables: `SELECT * FROM cat.`topic$history``
 * (retained commit versions), `topic$partitions` (per-partition watermark /
 * file / completion state — the `describe()` surface), and
 * `topic$deletes` (the committed deletion-vector inventory). Each relation
 * is DRIVER-BOUNDED by construction — versions are capped by the manifest
 * snapshot-fold retention, partitions by the topic's partition count, and
 * delete vectors by the maintenance fold — so serving them as
 * driver-computed rows (the [[graft.streaming.GraftRowsPartition]]
 * machinery the aggregate pushdown already uses) holds at any log size.
 * The unbounded inventories (chunk files, vectored ids) deliberately stay
 * OFF this surface: they live as parquet relations beside the log and are
 * reachable through the procedures / handle APIs that read them
 * distributed.
 */
final class GraftMetaTable(catalog: Catalog, topic: String, kind: String)
  extends Table with SupportsRead {

  override def name(): String = s"$topic$$$kind"

  override def schema(): StructType = GraftMetaTable.schemaOf(kind)

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema()
      override def description(): String = s"GraftMetaTable($topic, $kind)"
      override def toBatch: Batch = new Batch {
        // driver-only: rows are computed at plan time against the OWNING
        // catalog's session-cached engine (its config/manifest caches are
        // the point — see GraftCatalog's `engine` doc); only the computed
        // row array ships to the executor task
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftRowsPartition(GraftMetaTable.rows(catalog, topic, kind)))
        override def createReaderFactory(): PartitionReaderFactory =
          GraftRowsReaderFactory
      }
    }
}

object GraftMetaTable {
  val Kinds: Set[String] = Set("history", "partitions", "deletes")

  private[sql] def schemaOf(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("commit_time_ms", LongType, nullable = false),
      StructField("n_events", LongType, nullable = false)))
    case "partitions" => StructType(Seq(
      StructField("partition", IntegerType, nullable = false),
      StructField("n_events", LongType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("completed", BooleanType, nullable = false)))
    case "deletes" => StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("n_deleted", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown metadata table kind '$other' (expected ${Kinds.mkString("/")})")
  }

  /** Rows in Catalyst-internal form (UTF8String for strings), computed
    * fresh at plan time so every query sees the current state. */
  private[sql] def rows(catalog: Catalog, topic: String, kind: String): Array[Array[Any]] =
    kind match {
      case "history" =>
        catalog.versionHistory(topic).map { v =>
          Array[Any](v.version, UTF8String.fromString(v.kind), v.commitTimeMs,
            v.watermarks.valuesIterator.sum)
        }.toArray
      case "partitions" =>
        val cfg = catalog.openTopic(topic)
        val next = catalog.nextIds(topic)
        val counts = catalog.readManifest(topic)
          .map(m => catalog.manifestFileCounts(topic, m))
        (0 until cfg.partitions).map { p =>
          Array[Any](p, next.getOrElse(p, 0L),
            counts.map(_.getOrElse(p, 0L)).getOrElse(-1L), cfg.completed)
        }.toArray
      case "deletes" =>
        val conf = catalog.hadoopConf
        catalog.deleteVectorFiles(topic).map { dirStr =>
          val dir = new Path(dirStr)
          val fs = dir.getFileSystem(conf)
          // vector roots are directory-partitioned (partition=p/ subdirs)
          val parts = fs.listStatus(dir).filter(_.isDirectory).flatMap(sub =>
            fs.listStatus(sub.getPath)
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
          val n = parts.map { s =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(s.getPath, conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getRecordCount finally r.close()
          }.sum
          Array[Any](UTF8String.fromString(dirStr), n, parts.map(_.getLen).sum)
        }.toArray
      case other => throw new IllegalArgumentException(s"unknown kind '$other'")
    }
}
