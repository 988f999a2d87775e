package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.ColumnarToRowExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.{GraftDriver, Serializer}

/**
 * Columnar batch handoff: batch scans of default-serializer topics
 * surface whole ColumnarBatches to Spark's `ColumnarToRow` codegen (the
 * built-in parquet path) instead of row-at-a-time materialization, while
 * enforcing the slice id window — watermark / version pin / pushed cap,
 * none of which Spark re-applies as predicates — exactly, per batch.
 */
class ColumnarReadSpec extends SparkSpec {

  private def mkTopic(): (GraftDriver, String) = {
    import spark.implicits._
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-columnar").toString)
    d.createTopic("t", partitions = 2)
    val rows = (0 until 40).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")
    d.openTopic("t").producer(chunkMaxRecords = 8).produce(rows)
    (d, d.warehouse)
  }

  private def load(w: String) =
    spark.read.format("graft").option("warehouse", w).option("topic", "t").load()

  /** The graft BatchScan nodes of a plan, paired with whether each is
    * consumed columnar (a ColumnarToRowExec directly above it). */
  private def graftScans(df: org.apache.spark.sql.DataFrame): Seq[(BatchScanExec, Boolean)] = {
    val plan = df.queryExecution.executedPlan
    val columnarAbove = plan.collect {
      case c: ColumnarToRowExec => c.child.collectFirst { case b: BatchScanExec => b }
    }.flatten.toSet
    plan.collect {
      case b: BatchScanExec if b.scan.isInstanceOf[GraftScan] => (b, columnarAbove.contains(b))
    }
  }

  test("batch scan hands off ColumnarBatches (ColumnarToRow in the plan), results exact") {
    val (_, w) = mkTopic()
    val df = load(w)
    val scans = graftScans(df)
    assert(scans.nonEmpty && scans.forall(_._2),
      s"expected a columnar graft scan:\n${df.queryExecution.executedPlan}")
    val got = df.select("partition", "event_id", "metadata")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    val want = (0 until 40).map(i => (i % 2, (i / 2).toLong, s"""{"k":$i}""")).toSet
    assert(got == want)
  }

  test("non-default serializer topics stay on the row path") {
    import spark.implicits._
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-columnar-b64").toString)
    d.createTopic("t", partitions = 1, serializer = Serializer.Base64)
    d.openTopic("t").producer()
      .produce(Seq(("""{"k":1}""", 0)).toDF("metadata", "partition"))
    val df = spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "t").load()
    val scans = graftScans(df)
    assert(scans.nonEmpty && scans.forall(!_._2),
      s"serializer topic must read row-wise:\n${df.queryExecution.executedPlan}")
    assert(df.select("metadata").as[String].collect().toSeq == Seq("""{"k":1}"""))
  }

  test("mid-file id windows trim exactly: columnar ≡ row reader on the same slice") {
    val (_, w) = mkTopic()
    // partition 0 has ids 0..19 over chunk files rolled at 8; a [3, 13)
    // window cuts mid-file at BOTH ends
    val files = load(w).select(col("_file"), col("event_id"))
      .where(col("partition") === 0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._2.map(_._2).min).map(_._1)
    assert(files.length == 3)
    val slice = GraftInputPartition(0, 3L, 13L, files)
    val schema = GraftTopicTable.EventSchema
    val factory = GraftReaderFactory(schema, spark.sparkContext.hadoopConfiguration,
      columnar = true)
    assert(factory.supportColumnarReads(slice))

    val rowIds = {
      val r = factory.createReader(slice)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
      while (r.next()) {
        val row = r.get()
        out += ((row.getInt(0), row.getLong(1), row.getUTF8String(2).toString))
      }
      r.close(); out.toSeq
    }
    val colIds = {
      val r = factory.createColumnarReader(slice)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
      while (r.next()) {
        r.get().rowIterator().asScala.foreach { row =>
          out += ((row.getInt(0), row.getLong(1), row.getUTF8String(2).toString))
        }
      }
      r.close(); out.toSeq
    }
    assert(rowIds.map(_._2) == (3L until 13L))
    assert(colIds == rowIds, "columnar surface diverges from the row reader")
    // and the partially-kept batches round-trip metadata faithfully
    colIds.foreach { case (p, id, md) =>
      assert(p == 0); assert(md == s"""{"k":${id * 2}}""")
    }
  }

  test("empty window: columnar reader surfaces nothing, loudly nothing") {
    val (_, w) = mkTopic()
    val files = load(w).select(col("_file")).where(col("partition") === 1)
      .distinct().collect().map(_.getString(0)).toSeq
    val slice = GraftInputPartition(1, 20L, 20L, files)
    val factory = GraftReaderFactory(
      GraftTopicTable.EventSchema, spark.sparkContext.hadoopConfiguration, columnar = true)
    val r = factory.createColumnarReader(slice)
    assert(!r.next())
    r.close()
  }

  test("pushed id filters and projections compose with the columnar path") {
    val (_, w) = mkTopic()
    val df = load(w).where(col("event_id") >= 5 && col("event_id") < 9)
      .select(col("partition"), col("event_id"))
    assert(graftScans(df).forall(_._2))
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == (for (p <- 0 to 1; id <- 5L until 9L) yield (p, id)).toSet)
  }

  test("micro-batch reads take the columnar path too, trigger windows exact") {
    import org.apache.spark.sql.streaming.Trigger
    val (_, w) = mkTopic()
    // the stream's reader factory advertises columnar for a default-
    // serializer topic…
    val stream = new GraftTopicTable(w, "t", None, None, None)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of()))
      .build().toMicroBatchStream(Files.createTempDirectory("col-ck").toString)
    val f = stream.createReaderFactory()
    assert(f.supportColumnarReads(GraftInputPartition(0, 0L, 1L, Nil)),
      "micro-batch factory must advertise columnar on a default-serializer topic")
    // …and a real drain through small triggers (mid-file cursor windows)
    // surfaces every event exactly once
    val q = spark.readStream.format("graft")
      .option("warehouse", w).option("topic", "t")
      .option("maxEventsPerTrigger", 6) // cursor windows cut mid-file (chunks of 8)
      .load()
      .writeStream.format("memory").queryName("col_stream")
      .option("checkpointLocation", Files.createTempDirectory("col-ck2").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("col_stream")
      .select("partition", "event_id", "metadata")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    val want = (0 until 40).map(i => (i % 2, (i / 2).toLong, s"""{"k":$i}""")).toSet
    assert(got == want)
  }
}
