package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.DataView

/**
 * DataSelector/DataView consumption, replaying
 * `/root/reference/tests/MofkaDataSelectionTest.cpp:42-176`: one event with
 * metadata `{"x":123}` and payload = "abc…xyz" + "ABC…XYZ" (two producer
 * segments, concatenated at append — `DefaultPartitionManager.cpp:203-209`),
 * consumed under the null / full / sub / strided / unstructured selectors
 * with the reference's exact expected byte strings. Plus the even/odd
 * selector of `MofkaEventConsumerTest.cpp:85-131` and the plan-level
 * column-pruning guarantee for metadata-only consumption.
 */
class DataSelectionSpec extends SparkSpec {

  private val seg1 = "abcdefghijklmnopqrstuvwxyz"
  private val seg2 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  private def topicWithOneEvent(): TopicHandle = {
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-ds-spec").toString)
    d.createTopic("mytopic")
    val topic = d.openTopic("mytopic")
    val producer = topic.producer()
    // two segments concatenate at append time, like the reference
    producer.push("""{"x":123}""", (seg1 + seg2).getBytes(StandardCharsets.UTF_8))
    producer.flush()
    topic.markAsComplete()
    topic
  }

  private def pullOne(topic: TopicHandle, selector: DataSelector): ConsumedEvent = {
    val c = topic.consumer("myconsumer", selector = Some(selector))
    val Pull.Next(e) = c.pull(): @unchecked
    assert(c.pull() == Pull.NoMoreEvents)
    e
  }

  test("consume no data (null descriptor)") {
    val e = pullOne(topicWithOneEvent(), DataSelector.MetadataOnly)
    assert(e.data.length == 0)
    assert(e.metadata == """{"x":123}""")
  }

  test("consume the whole data") {
    val e = pullOne(topicWithOneEvent(), DataSelector.All)
    assert(e.data.length == 52)
    assert(new String(e.data, StandardCharsets.UTF_8) == seg1 + seg2)
  }

  test("consume using makeSubView(13, 26)") {
    val e = pullOne(topicWithOneEvent(),
      DataSelector(_ => lit(true), DataView.Full.makeSubView(13, 26)))
    assert(new String(e.data, StandardCharsets.UTF_8) == "nopqrstuvwxyzABCDEFGHIJKLM")
  }

  test("consume using makeStridedView(13, 3, 4, 2)") {
    val e = pullOne(topicWithOneEvent(),
      DataSelector(_ => lit(true), DataView.Full.makeStridedView(13, 3, 4, 2)))
    assert(new String(e.data, StandardCharsets.UTF_8) == "nopqtuvwzABC")
  }

  test("consume using makeUnstructuredView({(3,6),(15,4),(27,8)})") {
    val e = pullOne(topicWithOneEvent(),
      DataSelector(_ => lit(true),
        DataView.Full.makeUnstructuredView(Seq((3L, 6L), (15L, 4L), (27L, 8L)))))
    assert(new String(e.data, StandardCharsets.UTF_8) == "defghipqrsBCDEFGHI")
  }

  test("per-event selector: even event_num ships data, odd ships none") {
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-ds-spec").toString)
    d.createTopic("mytopic")
    val topic = d.openTopic("mytopic")
    val producer = topic.producer()
    (0 until 100).foreach { i =>
      producer.push(s"""{"event_num":$i}""",
        s"This is data for event $i".getBytes(StandardCharsets.UTF_8))
    }
    producer.flush()
    topic.markAsComplete()

    val evenOnly = DataSelector(
      md => get_json_object(md, "$.event_num").cast("long") % 2 === 0,
      DataView.Full)
    val c = topic.consumer("myconsumer", selector = Some(evenOnly))
    (0 until 100).foreach { i =>
      val Pull.Next(e) = c.pull(): @unchecked
      assert(e.eventId == i)
      if (i % 2 == 0)
        assert(new String(e.data, StandardCharsets.UTF_8) == s"This is data for event $i")
      else
        assert(e.data.length == 0)
    }
    assert(c.pull() == Pull.NoMoreEvents)
  }

  test("dynamic three-way selector replays example/consumer.cpp:38-49 exactly") {
    // reference fixture: id even && value < 70 → full data; id even → 4
    // bytes from offset 2; id odd → nothing
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-ds-spec").toString)
    d.createTopic("mytopic")
    val topic = d.openTopic("mytopic")
    val producer = topic.producer()
    (0 until 100).foreach { i =>
      producer.push(s"""{"id":$i,"value":${(i * 37) % 100}}""",
        s"payload-for-event-$i".getBytes(StandardCharsets.UTF_8))
    }
    producer.flush()
    topic.markAsComplete()

    def f(path: String) = (md: org.apache.spark.sql.Column) =>
      get_json_object(md, path).cast("long")
    val selector = DataSelector.Cases(Seq(
      ((md: org.apache.spark.sql.Column) =>
        f("$.id")(md) % 2 === 0 && f("$.value")(md) < 70) -> DataView.Full,
      ((md: org.apache.spark.sql.Column) =>
        f("$.id")(md) % 2 === 0) -> DataView.Full.makeSubView(2, 4)))

    val c = topic.consumer("threeway", selector = Some(selector))
    (0 until 100).foreach { i =>
      val Pull.Next(e) = c.pull(): @unchecked
      val full = s"payload-for-event-$i"
      val expected =
        if (i % 2 != 0) ""
        else if ((i * 37) % 100 < 70) full
        else full.substring(2, 6)
      assert(new String(e.data, StandardCharsets.UTF_8) == expected,
        s"event $i (value=${(i * 37) % 100})")
    }
    assert(c.pull() == Pull.NoMoreEvents)
  }

  test("metadata-parameterized view: offsets come from the event's metadata") {
    val d = new GraftDriver(spark, Files.createTempDirectory("graft-ds-spec").toString)
    d.createTopic("mytopic")
    val topic = d.openTopic("mytopic")
    val producer = topic.producer()
    // each event says where its interesting bytes live
    producer.push("""{"off":0,"len":3}""", "abcdefgh".getBytes(StandardCharsets.UTF_8))
    producer.push("""{"off":4,"len":4}""", "abcdefgh".getBytes(StandardCharsets.UTF_8))
    producer.push("""{"off":2,"len":2}""", "abcdefgh".getBytes(StandardCharsets.UTF_8))
    producer.flush()
    topic.markAsComplete()

    val dynamic = DataSelector.Cases(Seq(
      ((_: org.apache.spark.sql.Column) => lit(true)) ->
        graft.functions.EventView.DynamicSub(
          md => get_json_object(md, "$.off"),
          md => get_json_object(md, "$.len"))))
    val c = topic.consumer("dynamic", selector = Some(dynamic))
    val got = Iterator.continually(c.pull())
      .takeWhile(_ != Pull.NoMoreEvents)
      .collect { case Pull.Next(e) => new String(e.data, StandardCharsets.UTF_8) }.toSeq
    assert(got == Seq("abc", "efgh", "cd"))
  }

  test("metadata-only consumption never reads the data column (P1 pruning)") {
    val topic = topicWithOneEvent()
    val plan = topic.consumer("pruned", selector = Some(DataSelector.MetadataOnly))
      .events().select("event_id", "metadata", "data")
      .queryExecution.executedPlan.toString
    // The Parquet scan's ReadSchema must not include the payload column.
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty)
    assert(!readSchema.contains("data:binary"), s"payload column was read: $readSchema")
  }
}
