package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/**
 * Topic DDL contract, mirroring `/root/reference/tests/MofkaDriverTest.cpp:35-61`
 * (duplicate create throws, open of missing throws, 4 partitions listed) plus
 * the name rules of `MofkaDriver.cpp:157`.
 */
class DriverSpec extends SparkSpec {

  private def freshDriver(): GraftDriver =
    new GraftDriver(spark, Files.createTempDirectory("graft-driver-spec").toString)

  test("createTopic / topicExists / duplicate create throws") {
    val d = freshDriver()
    assert(!d.topicExists("mytopic"))
    d.createTopic("mytopic")
    assert(d.topicExists("mytopic"))
    val e = intercept[IllegalStateException] { d.createTopic("mytopic") }
    assert(e.getMessage.contains("already exists"))
  }

  test("openTopic of a missing topic throws 'not found'") {
    val d = freshDriver()
    val e = intercept[NoSuchElementException] { d.openTopic("mytopic2") }
    assert(e.getMessage.contains("not found"))
  }

  test("addPartition grows to 4 partitions, visible on open") {
    val d = freshDriver()
    d.createTopic("mytopic", partitions = 1)
    (0 until 3).foreach(_ => d.addPartition("mytopic"))
    assert(d.openTopic("mytopic").config.partitions == 4)
    assert(d.catalog.nextIds("mytopic").keySet == Set(0, 1, 2, 3))
  }

  test("listTopics lists created topics sorted") {
    val d = freshDriver()
    d.createTopic("t_b"); d.createTopic("t_a"); d.createTopic("t_c")
    assert(d.listTopics() == Seq("t_a", "t_b", "t_c"))
  }

  test("topic names: length cap and character set") {
    val d = freshDriver()
    val long = "x" * 257
    assert(intercept[IllegalArgumentException] { d.createTopic(long) }
      .getMessage.contains("256"))
    intercept[IllegalArgumentException] { d.createTopic("bad/name") }
    // within the contract cap (note: local filesystems cap path components
    // at 255 bytes, so the acceptance probe stays under that)
    d.createTopic("x" * 255)
  }

  test("config round-trip preserves the validator/selector descriptors") {
    val d = freshDriver()
    d.createTopic("cfg", partitions = 2,
      validator = Validator.EventBridgeValidator("""{"a":[1]}"""),
      selector = PartitionSelector.MetadataHash("$.key"))
    val cfg = d.openTopic("cfg").config
    assert(Validator.fromDescriptor(cfg.validator)
      .isInstanceOf[Validator.EventBridgeValidator])
    assert(PartitionSelector.fromDescriptor(cfg.selector) ==
      PartitionSelector.MetadataHash("$.key"))
    assert(!cfg.completed)
    d.openTopic("cfg").markAsComplete()
    assert(d.openTopic("cfg").config.completed)
  }

  test("unknown serializer types are rejected at createTopic, topic not created") {
    val d = freshDriver()
    val bad = org.json4s.JObject(
      "type" -> org.json4s.JString("no_such_serializer"))
    val e = intercept[IllegalArgumentException] {
      d.catalog.createTopic(TopicConfig("badser", 1,
        TopicConfig.DefaultValidator, TopicConfig.DefaultSelector, bad,
        completed = false))
    }
    assert(e.getMessage.contains("unknown serializer"))
    assert(!d.topicExists("badser"))
    // the factory itself rejects too (open-path guard)
    intercept[IllegalArgumentException] { Serializer.fromDescriptor(bad) }
  }

  test("base64 serializer: descriptor round-trips; all read surfaces decode") {
    import org.apache.spark.sql.functions._
    val d = freshDriver()
    d.createTopic("b64", partitions = 2, serializer = Serializer.Base64)
    // rehydrate from persisted config alone (a fresh handle, not the builder)
    val cfg = d.openTopic("b64").config
    assert(Serializer.fromDescriptor(cfg.serializer) == Serializer.Base64)

    val producer = d.openTopic("b64").producer()
    (0 until 10).foreach(i => producer.push(s"""{"i":$i}""",
      s"payload $i".getBytes("UTF-8")))
    producer.flush()
    d.openTopic("b64").markAsComplete()

    // raw log: stored metadata is base64 text, not JSON
    val raw = spark.read.parquet(d.catalog.logPath("b64"))
      .select(col("metadata")).collect().map(_.getString(0))
    assert(raw.forall(m => !m.startsWith("{")), raw.take(3).mkString(","))
    assert(raw.forall(m =>
      new String(java.util.Base64.getDecoder.decode(m), "UTF-8").startsWith("""{"i":""")))

    // consumer view decodes
    val viaEvents = d.openTopic("b64").events()
      .select(get_json_object(col("metadata"), "$.i").cast("long")).collect()
    assert(viaEvents.length == 10 && viaEvents.forall(!_.isNullAt(0)))

    // pull() surface decodes (goes through eventsFrom)
    val c = d.openTopic("b64").consumer("reader")
    val Pull.Next(first) = c.pull(): @unchecked
    assert(first.metadata.startsWith("""{"i":"""))
    assert(new String(first.data, "UTF-8").startsWith("payload"))

    // DSv2 reader decodes (batch scan, vectorized path + decode shim)
    val viaDsv2 = spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "b64").load()
      .select(get_json_object(col("metadata"), "$.i").cast("long").as("i"))
      .collect().map(_.getLong(0)).sorted
    assert(viaDsv2.toSeq == (0L until 10L))
  }

  test("base64 serializer round-trips arbitrary UTF-8 metadata exactly") {
    import org.apache.spark.sql.functions._
    val d = freshDriver()
    d.createTopic("b64u", partitions = 2, serializer = Serializer.Base64)
    val metas = Seq(
      """{"s":"plain ascii"}""",
      """{"s":"quotes \" and \\ backslashes"}""",
      """{"s":"unicode: éü中文 😀"}""", // éü中文 😀
      """{"s":"newline\nand\ttab"}""",
      """{"s":""}""")
    val producer = d.openTopic("b64u").producer()
    metas.foreach(m => producer.push(m))
    producer.flush()
    val viaEngine = d.openTopic("b64u").events()
      .select(col("metadata")).collect().map(_.getString(0)).toSet
    assert(viaEngine == metas.toSet, viaEngine.mkString("; "))
    val viaDsv2 = spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "b64u").load()
      .select(col("metadata")).collect().map(_.getString(0)).toSet
    assert(viaDsv2 == metas.toSet, viaDsv2.mkString("; "))
  }

  test("alterValidator gates on history, decodes opaque storage, and allows forced migration") {
    val d = freshDriver()
    // base64 topic: the compatibility scan must decode the stored form
    // through the topic's serializer, not read it raw
    d.createTopic("evolve", partitions = 1, serializer = Serializer.Base64)
    val t = d.openTopic("evolve")
    val p = t.producer()
    p.push("""{"k":1}"""); p.push("""{"k":200}"""); p.flush()
    val strict = Validator.SchemaValidator(
      """{"type":"object","required":["k"],
        | "properties":{"k":{"type":"integer","minimum":0,"maximum":69}}}""".stripMargin)
    val e = intercept[IllegalStateException](t.alterValidator(strict))
    assert(e.getMessage.contains("1 existing"), e.getMessage)
    // config unchanged after the refusal
    assert(Validator.fromDescriptor(t.config.validator) == Validator.Default)
    // forced migration (registry NONE mode): swap without the scan; the
    // new rules bind only FUTURE produces
    t.alterValidator(strict, checkExisting = false)
    val p2 = t.producer()
    intercept[Exception] { p2.push("""{"k":200}"""); p2.flush() }
    val p3 = t.producer()
    p3.push("""{"k":3}"""); p3.flush()
    assert(t.events().count() == 3) // 2 history + 1 conforming
  }

  test("multi-topic events() unions logs with a topic tag") {
    import org.apache.spark.sql.functions._
    val d = freshDriver()
    d.createTopic("alpha", partitions = 2)
    d.createTopic("beta")
    val pa = d.openTopic("alpha").producer()
    (0 until 6).foreach(i => pa.push(s"""{"i":$i}"""))
    pa.flush()
    val pb = d.openTopic("beta").producer()
    (0 until 4).foreach(i => pb.push(s"""{"i":$i}"""))
    pb.flush()

    val union = d.events(Seq("alpha", "beta"))
    assert(union.columns.toSet ==
      Set("topic", "partition", "event_id", "metadata", "data"))
    val counts = union.groupBy("topic").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("alpha" -> 6L, "beta" -> 4L))
    // per-topic id spaces are independent
    assert(union.filter(col("topic") === "beta" && col("event_id") === 0).count() == 1)
    intercept[IllegalArgumentException] { d.events(Nil) }
    intercept[Exception] { d.events(Seq("alpha", "missing")).count() }
  }

  test("dropTopic removes the topic but refuses under a live produce lock") {
    val d = freshDriver()
    d.createTopic("droppable", partitions = 2)
    val producer = d.openTopic("droppable").producer()
    producer.push("""{"k":1}"""); producer.flush()
    // a concurrent producer process holds the lock -> drop must refuse
    // (it ACQUIRES the lock, not just observes it - no TOCTOU window)
    val d2 = new GraftDriver(spark, d.warehouse)
    d2.catalog.acquireProduceLock("droppable")
    intercept[IllegalStateException](d.dropTopic("droppable"))
    assert(d.topicExists("droppable"))
    d2.catalog.releaseProduceLock("droppable")
    d.dropTopic("droppable")
    assert(!d.topicExists("droppable"))
    assert(!d.listTopics().contains("droppable"))
    intercept[NoSuchElementException](d.dropTopic("droppable"))
  }
}