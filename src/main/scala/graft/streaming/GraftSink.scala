package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.engine.TopicHandle

/**
 * Streaming write path: `foreachBatch` + `Producer.produce`.
 *
 * This is deliberate architecture, not a shortcut: the producer's dense
 * per-partition id assignment (the port of the reference's write-queue
 * linearization, `DefaultPartitionManager.cpp:398-409`) needs one committer
 * per partition per batch — exactly what `produce()` enforces.
 *
 * Replay semantics (the Delta `txnAppId` pattern): `sinkId` identifies one
 * logical stream INTO the topic and must be stable for the life of that
 * stream's checkpoint — micro-batch ids are only monotonic within one
 * checkpoint lineage, so a new query (fresh checkpoint) MUST use a new
 * sinkId, and two concurrent queries must never share one. Under that
 * contract the common restart path (crash after the marker write, replayed
 * batch skipped) is exactly-once; a crash in the window between `produce()`
 * and the marker write replays the batch — the at-least-once floor,
 * matching the reference's own delivery contract
 * (`DefaultPartitionManager.cpp:425-427`).
 */
object GraftSink {

  /** Attach a topic-producing sink: each micro-batch is produced into the
    * topic as one append (id-dense per partition), idempotent per
    * `(topic, sinkId)` across checkpoint replays.
    *
    * @param sinkId stable id of this logical stream (see class doc: one per
    *               checkpoint lineage, never shared, never reused) */
  def toTopic(writer: DataStreamWriter[Row], topic: TopicHandle,
              sinkId: String): DataStreamWriter[Row] =
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      produceBatch(topic, sinkId)(batch.toDF(), batchId)
    }

  /** The foreachBatch body, exposed for direct use/testing: produce unless
    * this batch id was already committed by this sink. */
  def produceBatch(topic: TopicHandle, sinkId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val last = topic.catalog.sinkCommit(topic.name, sinkId)
    if (!last.exists(_ >= batchId)) {
      topic.producer().produce(batch)
      topic.catalog.writeSinkCommit(topic.name, sinkId, batchId)
    }
  }

  /** Batch convenience with the same produce contract (no replay marker). */
  def write(df: DataFrame, topic: TopicHandle): Unit =
    topic.producer().produce(df): Unit
}
