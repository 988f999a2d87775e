package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.engine.Catalog

/**
 * DSv2 entry point for topic logs: `spark.read.format("graft")` /
 * `spark.readStream.format("graft")` with options:
 *
 *  - `warehouse` (required): the engine warehouse directory
 *  - `topic` (required): topic name
 *  - `consumer` (optional): consumer name — the stream starts from this
 *    consumer's acknowledge cursor instead of id 0 (subscribe semantics,
 *    `/root/reference/src/DefaultPartitionManager.cpp:425-427`)
 *  - `targets` (optional): comma-separated partition subset (F5 targeting)
 *  - `maxEventsPerTrigger` (optional): admission control — the micro-batch
 *    analog of the reference consumer's batch size
 *    (`ActiveProducerBatchQueue.hpp` adaptive batching, S3)
 *
 * The streaming read is the Spark-native port of `feedConsumer`
 * (`DefaultPartitionManager.cpp:415-504`): offsets are per-partition next
 * EventIDs, each micro-batch plans one input slice per topic partition, and
 * a completed topic ends an `Trigger.AvailableNow` query (NoMoreEvents, D5).
 *
 * The write path is intentionally `foreachBatch` + `Producer.produce` — the
 * id-linearization contract lives in one place (see `GraftSink`).
 */
final class GraftTopicProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTopicTable.EventSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val warehouse = require(opts, "warehouse")
    val topic = require(opts, "topic")
    new GraftTopicTable(warehouse, topic,
      Option(opts.get("consumer")),
      Option(opts.get("targets")).map(_.split(',').map(_.trim.toInt).toSeq),
      Option(opts.get("maxEventsPerTrigger")).map(_.toLong))
  }

  private def require(opts: CaseInsensitiveStringMap, key: String): String = {
    val v = opts.get(key)
    if (v == null || v.isEmpty)
      throw new IllegalArgumentException(s"format(\"graft\") requires option '$key'")
    v
  }
}

object GraftTopicTable {
  /** The canonical event schema (SURVEY §1.3). */
  val EventSchema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("event_id", LongType, nullable = false),
    StructField("metadata", StringType),
    StructField("data", BinaryType)))
}

final class GraftTopicTable(
    warehouse: String, topic: String,
    consumer: Option[String], targets: Option[Seq[Int]],
    maxEventsPerTrigger: Option[Long]) extends Table with SupportsRead {

  override def name(): String = s"graft:$topic"
  override def schema(): StructType = GraftTopicTable.EventSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val catalog = new Catalog(SparkSession.active, warehouse)
    new GraftScanBuilder(catalog, topic, consumer, targets, maxEventsPerTrigger)
  }
}
