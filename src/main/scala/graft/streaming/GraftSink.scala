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
 * per partition per batch — exactly what `produce()` enforces. `foreachBatch`
 * gives each micro-batch transactional "assign ids → append → publish
 * watermark" semantics with streaming checkpoint replay handled by Spark.
 */
object GraftSink {

  /** Attach a topic-producing sink: each micro-batch is produced into the
    * topic as one append (id-dense per partition). */
  def toTopic(writer: DataStreamWriter[Row], topic: TopicHandle): DataStreamWriter[Row] =
    writer.foreachBatch { (batch: Dataset[Row], _: Long) =>
      topic.producer().produce(batch.toDF()): Unit
    }

  /** Batch convenience with the same contract. */
  def write(df: DataFrame, topic: TopicHandle): Unit =
    topic.producer().produce(df): Unit
}
