package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException

import graft.SparkSpec
import graft.engine.GraftDriver

/**
 * The SQL TableCatalog surface: topic DDL through `spark.sql` (C1/C3 ↔
 * CREATE TABLE / SHOW TABLES, SURVEY §2.2), reads through `spark.table`,
 * and engine-error parity (dup create, live-lock drop refusal).
 */
class GraftCatalogSpec extends SparkSpec {

  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fresh catalog name + warehouse per test: Spark caches catalog
    * instances by name for the session's lifetime. */
  private def newCatalog(): (String, GraftDriver) = {
    val wh = Files.createTempDirectory("graft-sqlcat-spec").toString
    val cat = s"sqlcat_${n.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, new GraftDriver(spark, wh))
  }

  test("CREATE TABLE is createTopic; SHOW TABLES is listTopics") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.clicks TBLPROPERTIES (partitions '3')")
    assert(d.topicExists("clicks"))
    assert(d.openTopic("clicks").config.partitions == 3)
    spark.sql(s"CREATE TABLE $cat.views")
    assert(spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet == Set("clicks", "views"))
    // the default-namespace form works too
    assert(spark.sql(s"SHOW TABLES IN $cat.default").collect()
      .map(_.getString(1)).toSet == Set("clicks", "views"))
  }

  test("duplicate CREATE throws through SQL; IF NOT EXISTS no-ops") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.dup TBLPROPERTIES (partitions '2')")
    val e = intercept[AnalysisException](
      spark.sql(s"CREATE TABLE $cat.dup"))
    assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.dup")
    assert(d.openTopic("dup").config.partitions == 2) // original untouched
  }

  test("descriptor TBLPROPERTIES reach the topic config; bad ones fail at DDL") {
    val (cat, d) = newCatalog()
    spark.sql(
      s"""CREATE TABLE $cat.validated TBLPROPERTIES (
         |  partitions '2',
         |  validator '{"type":"schema","schema":{"type":"object","properties":{"k":{"type":"number"}},"required":["k"]}}',
         |  selector '{"type":"metadata_field_mod","field":"k"}'
         |)""".stripMargin)
    val cfg = d.openTopic("validated").config
    assert(org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(cfg.validator)).contains("schema"))
    // unknown plugin type: DDL-time error, same as the engine API (F6)
    intercept[Exception](spark.sql(
      s"""CREATE TABLE $cat.bad TBLPROPERTIES (validator '{"type":"nope"}')"""))
    assert(!d.topicExists("bad"))
  }

  test("SELECT over the catalog table runs the DSv2 scan") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.evts TBLPROPERTIES (partitions '2')")
    val producer = d.openTopic("evts").producer()
    (0 until 20).foreach(i => producer.push(s"""{"i":$i}""",
      s"p$i".getBytes("UTF-8"), partition = Some(i % 2)))
    producer.flush()
    assert(spark.table(s"$cat.evts").count() == 20)
    val filtered = spark.sql(
      s"SELECT partition, event_id FROM $cat.evts WHERE event_id >= 5")
    assert(filtered.count() == 10) // 2 partitions x ids 5..9
    // parity with the options-based source path
    val viaFormat = spark.read.format("graft")
      .option("warehouse", d.warehouse).option("topic", "evts").load()
      .select("partition", "event_id", "metadata")
      .orderBy("partition", "event_id").collect().toSeq
    val viaCatalog = spark.table(s"$cat.evts")
      .select("partition", "event_id", "metadata")
      .orderBy("partition", "event_id").collect().toSeq
    assert(viaCatalog == viaFormat)
  }

  test("DROP TABLE drops the topic; missing tables and renames fail loudly") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.gone")
    assert(d.topicExists("gone"))
    spark.sql(s"DROP TABLE $cat.gone")
    assert(!d.topicExists("gone"))
    intercept[AnalysisException](spark.sql(s"DROP TABLE $cat.gone"))
    spark.sql(s"DROP TABLE IF EXISTS $cat.gone") // no-op, no error
    spark.sql(s"CREATE TABLE $cat.a")
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.a RENAME TO $cat.b"))
  }

  test("INSERT INTO produces; event_id is engine-assigned; OVERWRITE refused") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.sink TBLPROPERTIES (partitions '2')")
    spark.sql(
      s"""INSERT INTO $cat.sink VALUES
         |  (0, 999, '{"k":0}', CAST(NULL AS BINARY)),
         |  (1, 999, '{"k":1}', CAST(NULL AS BINARY)),
         |  (0, 999, '{"k":2}', CAST(NULL AS BINARY))""".stripMargin)
    val rows = spark.table(s"$cat.sink")
      .select("partition", "event_id", "metadata")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sortBy(x => (x._1, x._2))
    // inserted event_id 999 ignored: ids dense per partition from 0
    assert(rows.map(x => (x._1, x._2)).toSeq == Seq((0, 0L), (0, 1L), (1, 0L)))
    assert(rows.map(_._3).toSet == Set("""{"k":0}""", """{"k":1}""", """{"k":2}"""))
    // a second INSERT appends with the watermark carried forward
    spark.sql(s"""INSERT INTO $cat.sink VALUES (1, 0, '{"k":3}', CAST(NULL AS BINARY))""")
    assert(spark.table(s"$cat.sink").where("partition = 1").count() == 2)
    // append-only log: overwrite forms are refused
    intercept[Exception](spark.sql(
      s"""INSERT OVERWRITE $cat.sink VALUES (0, 0, '{"k":9}', CAST(NULL AS BINARY))"""))
    // the validator gates SQL inserts exactly like the engine API
    spark.sql(s"""CREATE TABLE $cat.gated TBLPROPERTIES (
      validator '{"type":"schema","schema":{"type":"object","properties":{"k":{"type":"number"}},"required":["k"]}}')""")
    intercept[Exception](spark.sql(
      s"""INSERT INTO $cat.gated VALUES (0, 0, '{"wrong":1}', CAST(NULL AS BINARY))"""))
    assert(spark.table(s"$cat.gated").count() == 0)
  }

  test("df.write.format(\"graft\") batch append shares the produce path") {
    import spark.implicits._
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.wtopic TBLPROPERTIES (partitions '2')")
    Seq((0, 0L, """{"w":1}"""), (1, 0L, """{"w":2}"""))
      .toDF("partition", "event_id", "metadata")
      .withColumn("data", org.apache.spark.sql.functions.lit(null).cast("binary"))
      .write.format("graft")
      .option("warehouse", d.warehouse).option("topic", "wtopic")
      .mode("append").save()
    assert(spark.table(s"$cat.wtopic").count() == 2)
  }

  test("readStream.table drains a catalog topic through the micro-batch source") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.streamed TBLPROPERTIES (partitions '2')")
    val producer = d.openTopic("streamed").producer()
    (0 until 12).foreach(i => producer.push(s"""{"i":$i}""",
      Array.empty[Byte], partition = Some(i % 2)))
    producer.flush()
    val ckpt = Files.createTempDirectory("graft-sqlcat-ckpt").toString
    val qname = s"sqlcat_stream_${n.incrementAndGet()}"
    val q = spark.readStream.table(s"$cat.streamed")
      .writeStream.format("memory").queryName(qname)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.table(qname).count() == 12)
  }

  test("readStream.table honors startingVersion (catalog-path parity)") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.vstream TBLPROPERTIES (partitions '2')")
    def produce(lo: Int, hi: Int): Unit = {
      val p = d.openTopic("vstream").producer()
      (lo until hi).foreach(i => p.push(s"""{"i":$i}"""))
      p.flush()
    }
    produce(0, 10)
    produce(10, 26)
    val v1 = d.openTopic("vstream").history()
      .agg(org.apache.spark.sql.functions.min("version")).collect()(0).getLong(0)
    val qname = s"sqlcat_vstream_${n.incrementAndGet()}"
    spark.readStream.option("startingVersion", v1.toString).table(s"$cat.vstream")
      .writeStream.format("memory").queryName(qname)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sqlcat-vck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(60000)
    // the stream was born just past commit v1: only the second produce
    assert(spark.table(qname).count() == 16)
  }

  test("catalog scans keep id pushdown (pruned row groups, pushed filters)") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.pushed TBLPROPERTIES (partitions '2')")
    val producer = d.openTopic("pushed").producer()
    (0 until 40).foreach(i => producer.push(s"""{"i":$i}""",
      Array.empty[Byte], partition = Some(i % 2)))
    producer.flush()
    val df = spark.sql(s"SELECT event_id FROM $cat.pushed WHERE event_id >= 15")
    assert(df.count() == 10)
    // the filter reaches the custom scan (not a post-scan-only Filter):
    // GraftScan.description renders the PUSHED id range, and the pruned
    // ReadSchema drops every unprojected column
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    val desc = scans.head.scan.description()
    assert(desc.contains("idRange=[15,"), desc)
    assert(desc.contains("cols=event_id") && !desc.contains("metadata"), desc)
  }

  test("per-read options are honored on catalog tables (admission control)") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.opts TBLPROPERTIES (partitions '2')")
    val producer = d.openTopic("opts").producer()
    (0 until 40).foreach(i => producer.push(s"""{"i":$i}""",
      Array.empty[Byte], partition = Some(i % 2)))
    producer.flush()
    val ckpt = Files.createTempDirectory("graft-sqlcat-ckpt").toString
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .option("maxEventsPerTrigger", "15")
      .table(s"$cat.opts")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sizes.synchronized { sizes += b.count() }: Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(sizes.sum == 40, sizes)
    assert(sizes.forall(_ <= 15), s"admission option silently dropped: $sizes")
    assert(sizes.size >= 3, sizes)
  }

  test("ALTER TABLE SET TBLPROPERTIES evolves validator and partitions") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.evolving TBLPROPERTIES (partitions '2')")
    val p = d.openTopic("evolving").producer()
    p.push("""{"k":1}"""); p.flush()
    // tightening against failing history: refused through SQL
    intercept[Exception](spark.sql(
      s"""ALTER TABLE $cat.evolving SET TBLPROPERTIES (
         |  validator '{"type":"schema","schema":{"type":"object","properties":{"nope":{"type":"number"}},"required":["nope"]}}'
         |)""".stripMargin))
    // compatible tightening: accepted and persisted
    spark.sql(
      s"""ALTER TABLE $cat.evolving SET TBLPROPERTIES (
         |  validator '{"type":"schema","schema":{"type":"object","properties":{"k":{"type":"number"}},"required":["k"]}}'
         |)""".stripMargin)
    assert(org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods
      .render(d.openTopic("evolving").config.validator)).contains("required"))
    // partition growth; shrink refused
    spark.sql(s"ALTER TABLE $cat.evolving SET TBLPROPERTIES (partitions '4')")
    assert(d.openTopic("evolving").config.partitions == 4)
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.evolving SET TBLPROPERTIES (partitions '1')"))
    // serializer swap would reinterpret committed bytes: refused
    intercept[Exception](spark.sql(
      s"""ALTER TABLE $cat.evolving SET TBLPROPERTIES (serializer '{"type":"base64"}')"""))
  }

  test("SHOW TBLPROPERTIES round-trips the topic descriptor triple") {
    val (cat, d) = newCatalog()
    val validator =
      """{"type":"schema","schema":{"type":"object","properties":{"k":{"type":"number"}},"required":["k"]}}"""
    spark.sql(
      s"""CREATE TABLE $cat.propd TBLPROPERTIES (
         |  partitions '3', validator '$validator')""".stripMargin)
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.propd").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("partitions") == "3")
    assert(props("completed") == "false")
    assert(props("validator").contains("\"required\""))
    assert(props("serializer").nonEmpty && props("selector").nonEmpty)
    // the shown validator JSON is re-CREATE-able verbatim (DDL round-trip)
    spark.sql(
      s"""CREATE TABLE $cat.propd2 TBLPROPERTIES (
         |  partitions '3', validator '${props("validator")}')""".stripMargin)
    assert(d.openTopic("propd2").config.validator ==
      d.openTopic("propd").config.validator)
  }

  test("DELETE FROM is the compliance delete; id gaps are the semantic") {
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.gdpr TBLPROPERTIES (partitions '2')")
    val p = d.openTopic("gdpr").producer()
    (0 until 20).foreach(i => p.push(s"""{"i":$i}"""))
    p.flush()
    // translatable predicate: event_id + partition
    spark.sql(s"DELETE FROM $cat.gdpr WHERE event_id < 3 AND partition = 0")
    val left = spark.table(s"$cat.gdpr")
      .select("partition", "event_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(left == ((3 until 10).map((0, _)) ++ (0 until 10).map((1, _)))
      .map { case (a, b) => (a, b.toLong) }.toSet)
    // metadata predicates translate on default-serializer topics
    spark.sql(s"""DELETE FROM $cat.gdpr WHERE metadata = '{"i":7}'""")
    assert(spark.table(s"$cat.gdpr").count() == 16)
    // DELETE with no WHERE purges everything (the log stays, emptied)
    spark.sql(s"DELETE FROM $cat.gdpr")
    assert(spark.table(s"$cat.gdpr").count() == 0)
    // untranslatable predicate: falls through to the row-level plan —
    // the predicate evaluates on the SCAN output (the consumer view) and
    // the matched rows are vector-tombstoned (merge-on-read), exact
    spark.sql(s"""INSERT INTO $cat.gdpr VALUES (0, 0, '{"i":9}', CAST(NULL AS BINARY))""")
    spark.sql(s"DELETE FROM $cat.gdpr WHERE length(metadata) > 2")
    assert(spark.table(s"$cat.gdpr").count() == 0)
    assert(d.catalog.deleteVectorFiles("gdpr").nonEmpty,
      "the row-level DELETE path must tombstone, not rewrite")
  }

  test("DELETE metadata predicates on stored-form topics take the row-level path") {
    val (cat, d) = newCatalog()
    spark.sql(
      s"""CREATE TABLE $cat.enc TBLPROPERTIES (
         |  partitions '1', serializer '{"type":"base64"}')""".stripMargin)
    val p = d.openTopic("enc").producer()
    (0 until 6).foreach(i => p.push(s"""{"i":$i}"""))
    p.flush()
    // the metadata-path purge condition runs over the STORED form, so the
    // metadata attribute refuses to translate there; the DELETE then plans
    // through the row-level operation, whose target scan emits the DECODED
    // consumer view — the predicate matches the right row and the delete
    // lands as a vector tombstone (a pure-delete merge)
    spark.sql(s"""DELETE FROM $cat.enc WHERE metadata = '{"i":2}'""")
    assert(spark.table(s"$cat.enc").count() == 5)
    assert(d.catalog.deleteVectorFiles("enc").nonEmpty,
      "stored-form metadata DELETE must go merge-on-read, never a stored-byte match")
    // id-space predicates are serializer-agnostic and keep the metadata path
    spark.sql(s"DELETE FROM $cat.enc WHERE event_id >= 4")
    assert(spark.table(s"$cat.enc").count() == 3)
  }

  test("MERGE INTO: matched rows vector-tombstoned, new rows produced") {
    import org.apache.spark.sql.functions._
    val (cat, d) = newCatalog()
    d.createTopic("tgt", partitions = 2)
    d.openTopic("tgt").producer().produce {
      import spark.implicits._
      (0 until 20).map(i => (s"""{"k":$i,"v":"old"}""", i % 2))
        .toDF("metadata", "partition")
    }
    // source: updates for even k < 10, inserts for k in 100..104
    val changes = {
      import spark.implicits._
      ((0 until 10 by 2).map(k => (k.toLong, s"""{"k":$k,"v":"new"}""")) ++
        (100 until 105).map(k => (k.toLong, s"""{"k":$k,"v":"ins"}""")))
        .toDF("k", "md")
    }
    changes.createOrReplaceTempView("changes")
    val before = d.catalog.deleteVectorFiles("tgt").size
    spark.sql(
      s"""MERGE INTO $cat.tgt t
         |USING changes c
         |ON get_json_object(t.metadata, '$$.k') = CAST(c.k AS STRING)
         |WHEN MATCHED THEN UPDATE SET metadata = c.md
         |WHEN NOT MATCHED THEN INSERT (partition, event_id, metadata, data)
         |  VALUES (CAST(c.k % 2 AS INT), -1L, c.md, NULL)
         |""".stripMargin)
    val rows = spark.table(s"$cat.tgt")
      .select(get_json_object(col("metadata"), "$.k").cast("long").as("k"),
        get_json_object(col("metadata"), "$.v").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 25, s"20 originals - 5 updated + 5 re-produced + 5 inserted")
    val byV = rows.groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    assert(byV("new") == (0L until 10L by 2L), s"updated rows: ${byV.get("new")}")
    assert(byV("ins") == (100L until 105L), s"inserted rows: ${byV.get("ins")}")
    assert(byV("old") == (0L until 20L).filterNot(k => k % 2 == 0 && k < 10),
      "unmatched originals untouched")
    assert(d.catalog.deleteVectorFiles("tgt").size > before,
      "matched rows must be tombstoned by a deletion vector, not a rewrite")
    // updated rows re-produced at the tail: ids stay dense per partition
    val dense = spark.table(s"$cat.tgt")
      .groupBy(col("partition")).agg(countDistinct(col("event_id")).as("n"),
        max(col("event_id")).as("mx")).collect()
      .forall(r => r.getLong(2) >= r.getLong(1) - 1)
    assert(dense, "produced ids continue densely from the watermark")
  }

  test("MERGE INTO a TIERED topic: upserts land where rewrites refuse") {
    import org.apache.spark.sql.functions._
    val (cat, d) = newCatalog()
    d.createTopic("cold", partitions = 2)
    val topic = d.openTopic("cold")
    topic.producer(chunkMaxRecords = 4).produce {
      import spark.implicits._
      (0 until 40).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")
    }
    assert(topic.archiveBefore(15L).filesMoved > 0) // rewrites now refuse
    val src = { import spark.implicits._
      Seq((2L, """{"k":2,"u":1}"""), (100L, """{"k":100}"""))
        .toDF("k", "md") }
    src.createOrReplaceTempView("cold_chg")
    // the matched row (k=2) lives in the COLD tier: merge-on-read updates
    // it via a vector tombstone + hot re-produce, no rewrite needed
    spark.sql(
      s"""MERGE INTO $cat.cold t USING cold_chg c
         |ON get_json_object(t.metadata, '$$.k') = CAST(c.k AS STRING)
         |WHEN MATCHED THEN UPDATE SET metadata = c.md
         |WHEN NOT MATCHED THEN INSERT (partition, event_id, metadata, data)
         |  VALUES (CAST(c.k % 2 AS INT), -1L, c.md, NULL)""".stripMargin)
    val rows = spark.table(s"$cat.cold")
      .select(get_json_object(col("metadata"), "$.k").cast("long").as("k"),
        get_json_object(col("metadata"), "$.u").as("u"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(rows.map(_._1).sorted.toSeq == ((0L until 40L) :+ 100L))
    assert(rows.count(_._2.contains("1")) == 1, "cold-tier row updated in place-of-read")
  }

  test("MERGE: WHEN NOT MATCHED BY SOURCE THEN DELETE (full-sync shape)") {
    import org.apache.spark.sql.functions._
    val (cat, d) = newCatalog()
    d.createTopic("sync", partitions = 2)
    d.openTopic("sync").producer().produce {
      import spark.implicits._
      (0 until 12).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")
    }
    // source holds keys 0..7 → target rows 8..11 are "not matched by
    // source" and must be tombstoned; matched rows keep their payload
    val src = { import spark.implicits._; (0 until 8).map(_.toLong).toDF("k") }
    src.createOrReplaceTempView("sync_src")
    spark.sql(
      s"""MERGE INTO $cat.sync t
         |USING sync_src c
         |ON get_json_object(t.metadata, '$$.k') = CAST(c.k AS STRING)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    val ks = spark.table(s"$cat.sync")
      .select(get_json_object(col("metadata"), "$.k").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == (0L until 8L), s"got $ks")
    assert(d.catalog.deleteVectorFiles("sync").nonEmpty,
      "by-source deletes are vector tombstones")
  }

  test("MERGE INSERT with NULL partition routes through the topic's selector") {
    import org.apache.spark.sql.functions._
    import graft.engine.PartitionSelector
    val (cat, d) = newCatalog()
    // metadata-driven selector: partition = hash($.k) mod n — the topic's
    // PLACEMENT CONTRACT, which every ingest path must honor
    d.createTopic("seltgt", partitions = 4,
      selector = PartitionSelector.MetadataHash("$.k"))
    d.openTopic("seltgt").producer().produce {
      import spark.implicits._
      (0 until 8).map(i => s"""{"k":"key$i"}""").toDF("metadata")
    }
    val src = { import spark.implicits._
      (8 until 24).map(i => (s"key$i", s"""{"k":"key$i"}""")).toDF("k", "md") }
    src.createOrReplaceTempView("sel_src")
    // INSERT action carries NO partition: the NULL must stage through and
    // produce() must apply the SAME selector as any direct produce — never
    // a silent default partition (the r10 partition-0 skew bug)
    spark.sql(
      s"""MERGE INTO $cat.seltgt t USING sel_src c
         |ON get_json_object(t.metadata, '$$.k') = c.k
         |WHEN NOT MATCHED THEN INSERT (partition, event_id, metadata, data)
         |  VALUES (CAST(NULL AS INT), -1L, c.md, NULL)""".stripMargin)
    val sel = PartitionSelector.MetadataHash("$.k")
    val got = spark.table(s"$cat.seltgt")
      .select(col("partition"), col("metadata"))
      .collect().map(r => r.getInt(0) -> r.getString(1))
    assert(got.length == 24)
    got.foreach { case (p, md) =>
      assert(p == sel.partitionFor(md, 4),
        s"row $md landed on $p, selector says ${sel.partitionFor(md, 4)}")
    }
    assert(got.map(_._1).distinct.length > 1,
      "hash placement must actually spread rows (not all on one partition)")
  }

  test("INSERT INTO with NULL partition routes through the selector (V1 path)") {
    import graft.engine.PartitionSelector
    val (cat, d) = newCatalog()
    d.createTopic("insnull", partitions = 4,
      selector = PartitionSelector.FieldMod("$.k"))
    (0 until 8).foreach(k => spark.sql(
      s"""INSERT INTO $cat.insnull
         |VALUES (CAST(NULL AS INT), -1L, '{"k":$k}', CAST(NULL AS BINARY))""".stripMargin))
    val got = spark.table(s"$cat.insnull")
      .selectExpr("partition", "CAST(get_json_object(metadata,'$.k') AS INT) AS k")
      .collect().map(r => (r.getInt(1), r.getInt(0))).toMap
    assert(got == (0 until 8).map(k => k -> k % 4).toMap,
      s"selector must place k % 4: $got")
  }

  test("UPDATE SET partition = NULL re-routes the row through the selector") {
    import org.apache.spark.sql.functions._
    import graft.engine.PartitionSelector
    val (cat, d) = newCatalog()
    d.createTopic("reroute", partitions = 4,
      selector = PartitionSelector.FieldMod("$.k"))
    // explicit requests are honored over the selector, so these rows land
    // DELIBERATELY mis-placed (all on partition 0) — the repair primitive
    // is an UPDATE that nulls the partition and lets the selector re-route
    d.openTopic("reroute").producer().produce {
      import spark.implicits._
      (0 until 8).map(k => (s"""{"k":$k}""", 0)).toDF("metadata", "partition")
    }
    assert(spark.table(s"$cat.reroute").select("partition")
      .collect().forall(_.getInt(0) == 0))
    spark.sql(s"UPDATE $cat.reroute SET partition = CAST(NULL AS INT)")
    val got = spark.table(s"$cat.reroute")
      .select(col("partition"),
        get_json_object(col("metadata"), "$.k").cast("int").as("k"))
      .collect().map(r => (r.getInt(1), r.getInt(0))).toMap
    assert(got == (0 until 8).map(k => k -> k % 4).toMap,
      s"rows must MOVE to the selector's placement: $got")
  }

  test("readStream.table over t$changes streams the change feed") {
    val (cat, d) = newCatalog()
    d.createTopic("chg", partitions = 2)
    val topic = d.openTopic("chg")
    topic.producer().produce {
      import spark.implicits._
      (0 until 10).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")
    }
    topic.deleteWhereVectored(
      org.apache.spark.sql.functions.get_json_object(
        org.apache.spark.sql.functions.col("metadata"), "$.k").cast("long") < 3): Unit
    val name = s"chgmem_${n.incrementAndGet()}"
    val q = spark.readStream.table(s"$cat.`chg$$changes`")
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val byType = spark.table(name).groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 10L, "delete" -> 3L), s"got $byType")
  }

  test("row-level UPDATE composes from the same delta write") {
    import org.apache.spark.sql.functions._
    val (cat, d) = newCatalog()
    d.createTopic("utgt", partitions = 2)
    d.openTopic("utgt").producer().produce {
      import spark.implicits._
      (0 until 10).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")
    }
    spark.sql(s"UPDATE $cat.utgt SET metadata = '{\"k\":-1}' " +
      "WHERE get_json_object(metadata, '$.k') = '3'")
    val ks = spark.table(s"$cat.utgt")
      .select(get_json_object(col("metadata"), "$.k").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == (Seq(-1L) ++ (0L until 10L).filterNot(_ == 3L)), s"got $ks")
  }

  test("t$changes: the SQL change feed, with _commit_version pushdown") {
    import org.apache.spark.sql.functions._
    val (cat, d) = newCatalog()
    d.createTopic("cdf", partitions = 2)
    val topic = d.openTopic("cdf")
    def produce(lo: Int, hi: Int): Unit = topic.producer().produce {
      import spark.implicits._
      (lo until hi).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")
    }
    produce(0, 20)
    val v1 = topic.history().orderBy("version").collect().map(_.getLong(0)).last
    produce(20, 50)
    topic.deleteWhereVectored(
      get_json_object(col("metadata"), "$.k").cast("long") < 5): Unit
    val vEnd = topic.history().orderBy("version").collect().map(_.getLong(0)).last

    // SQL form ≡ the handle API over the same span
    val sql = spark.sql(
      s"""SELECT _change_type, partition, event_id, metadata
         |FROM $cat.`cdf$$changes`
         |WHERE _commit_version > $v1 AND _commit_version <= $vEnd""".stripMargin)
    val api = topic.changes(v1, vEnd)
      .select(col("_change_type"), col("partition"), col("event_id"), col("metadata"))
    assert(sql.collect().map(_.toString).sorted.toSeq ==
      api.collect().map(_.toString).sorted.toSeq)

    // the version bounds reach the SCAN (not just a post-filter): the
    // bounded span's planned row estimate must be strictly below the
    // full feed's — proof the insert window was clamped to the span's
    // watermark diff instead of scanning everything and re-filtering
    def plannedRows(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.rowCount.getOrElse(
        df.queryExecution.optimizedPlan.collectLeaves().map(_.stats.rowCount
          .getOrElse(BigInt(Long.MaxValue))).sum)
    val full = spark.sql(s"SELECT * FROM $cat.`cdf$$changes`")
    assert(plannedRows(sql) < plannedRows(full),
      s"bounded span must plan fewer rows: ${plannedRows(sql)} vs ${plannedRows(full)}")
    // full feed (no bounds) replays everything retained
    assert(full.filter(col("_change_type") === "insert").count() == 50L)
  }

  test("t$changes: _commit_timestamp bounds push down to the same version window") {
    import org.apache.spark.sql.functions._
    val (cat, d) = newCatalog()
    d.createTopic("cdfts", partitions = 2)
    val topic = d.openTopic("cdfts")
    def produce(lo: Int, hi: Int): Unit = topic.producer().produce {
      import spark.implicits._
      (lo until hi).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition")
    }
    produce(0, 20)
    Thread.sleep(15L) // commit mtimes are ms-resolution; force distinct ones
    produce(20, 50)
    topic.deleteWhereVectored(
      get_json_object(col("metadata"), "$.k").cast("long") < 5): Unit
    val hist = topic.history().orderBy("version").collect()
    val v1 = hist.head.getLong(0)
    val vEnd = hist.last.getLong(0)
    def lit(t: java.sql.Timestamp): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(t.getTime))
    val ts1 = lit(hist.head.getAs[java.sql.Timestamp]("commit_time"))
    val tsEnd = lit(hist.last.getAs[java.sql.Timestamp]("commit_time"))

    // time-addressed span ≡ the version-addressed span ≡ the handle API
    val byTs = spark.sql(
      s"""SELECT _change_type, partition, event_id, metadata
         |FROM $cat.`cdfts$$changes`
         |WHERE _commit_timestamp > TIMESTAMP '$ts1'
         |  AND _commit_timestamp <= TIMESTAMP '$tsEnd'""".stripMargin)
    val api = topic.changes(v1, vEnd)
      .select(col("_change_type"), col("partition"), col("event_id"), col("metadata"))
    assert(byTs.collect().map(_.toString).sorted.toSeq ==
      api.collect().map(_.toString).sorted.toSeq)

    // the timestamp bounds reach the SCAN: same planned-row proof as the
    // version-bound test — the clamped span must plan strictly fewer rows
    // than the full feed (files pruned by the version-diff id window)
    def plannedRows(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.rowCount.getOrElse(
        df.queryExecution.optimizedPlan.collectLeaves().map(_.stats.rowCount
          .getOrElse(BigInt(Long.MaxValue))).sum)
    val full = spark.sql(s"SELECT * FROM $cat.`cdfts$$changes`")
    assert(plannedRows(byTs) < plannedRows(full),
      s"time-bounded span must plan fewer rows: ${plannedRows(byTs)} vs ${plannedRows(full)}")

    // a lower bound that predates the retained log is LENIENT: no clamp,
    // full correctness (Spark re-applies the predicate on surfaced rows)
    val early = spark.sql(
      s"""SELECT _change_type FROM $cat.`cdfts$$changes`
         |WHERE _commit_timestamp >= TIMESTAMP '1999-01-01 00:00:00'""".stripMargin)
    assert(early.filter(col("_change_type") === "insert").count() == 50L)
  }

  test("CTAS: CREATE TABLE AS SELECT produces into a fresh topic") {
    import spark.implicits._
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.src TBLPROPERTIES (partitions '2')")
    d.openTopic("src").producer().produce(
      (0 until 30).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition"))
    spark.sql(
      s"""CREATE TABLE $cat.derived TBLPROPERTIES (partitions '2')
         |AS SELECT partition, event_id, metadata, data
         |FROM $cat.src WHERE event_id >= 5""".stripMargin)
    // engine-assigned dense ids in the new topic; rows filtered as selected
    val got = spark.table(s"$cat.derived")
    assert(got.count() == 20)
    assert(got.groupBy("partition").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet == Set((0, 10L), (1, 10L)))
    assert(d.openTopic("derived").events()
      .agg(org.apache.spark.sql.functions.max($"event_id")).head().getLong(0) == 9L)
    // a non-event shape still fails loudly
    intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.bad AS SELECT metadata FROM $cat.src"))
  }

  test("metadata tables: t$history / t$partitions / t$deletes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (cat, d) = newCatalog()
    spark.sql(s"CREATE TABLE $cat.mt TBLPROPERTIES (partitions '2')")
    val topic = d.openTopic("mt")
    val p = topic.producer()
    p.produce((0 until 20).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition"))
    p.produce((20 until 30).map(i => (s"""{"k":$i}""", i % 2)).toDF("metadata", "partition"))

    // partitions: the describe() surface from pure SQL
    val parts = spark.sql(s"SELECT partition, n_events FROM $cat.`mt$$partitions` ORDER BY 1")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(parts == Seq((0, 15L), (1, 15L)))

    // history: versions and cumulative counts match the handle API
    val sqlHist = spark.sql(
      s"SELECT version, kind, n_events FROM $cat.`mt$$history` ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val apiHist = topic.history().orderBy(col("version"))
      .select(col("version"), col("kind"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(sqlHist == apiHist && sqlHist.map(_._3).max == 30L)

    // deletes: empty → rows appear with exact vectored counts → fold clears
    assert(spark.sql(s"SELECT * FROM $cat.`mt$$deletes`").count() == 0)
    topic.deleteWhereVectored(get_json_object(col("metadata"), "$.k").cast("long") < 7): Unit
    val dels = spark.sql(s"SELECT n_deleted FROM $cat.`mt$$deletes`")
      .collect().map(_.getLong(0)).toSeq
    assert(dels == Seq(7L))
    topic.compact()
    assert(spark.sql(s"SELECT * FROM $cat.`mt$$deletes`").count() == 0)

    // unknown suffix / missing base behave like missing tables;
    // SHOW TABLES lists only real topics
    intercept[AnalysisException](spark.sql(s"SELECT * FROM $cat.`mt$$bogus`"))
    intercept[AnalysisException](spark.sql(s"SELECT * FROM $cat.`nope$$history`"))
    assert(spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet == Set("mt"))
  }
}