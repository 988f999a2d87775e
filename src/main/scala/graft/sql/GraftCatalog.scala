package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.engine.{Catalog, Serializer, TopicConfig, Validator, PartitionSelector}
import graft.streaming.GraftTopicTable

/**
 * Topics as SQL tables — the Spark `TableCatalog` face of the engine's
 * control plane (SURVEY §2.2: C1 `createTopic` ↔ `CREATE TABLE`, C3
 * `listTopics` ↔ `SHOW TABLES`, mirroring `MofkaDriver.cpp:151-315,461-497`
 * where topic DDL is the driver's metadata surface):
 *
 * {{{
 * spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
 * spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/to/warehouse")
 *
 * spark.sql("CREATE TABLE graft.clicks TBLPROPERTIES (partitions '4')")
 * spark.sql("SHOW TABLES IN graft")
 * spark.table("graft.clicks")           // the DSv2 topic table (batch scan)
 * spark.sql("SELECT count(*) FROM graft.clicks WHERE event_id >= 10")
 * spark.sql("DROP TABLE graft.clicks")
 * }}}
 *
 * Table properties at CREATE map to the topic descriptor triple (F1-F3,
 * X1-X2, Z1): `partitions` (int, default 1), `validator`, `selector`,
 * `serializer` (JSON descriptors, exactly the strings the engine API
 * takes). Unknown descriptors are DDL-time errors, like `createTopic`.
 *
 * One flat namespace (`default`): topics have no hierarchy in the engine
 * (the reference's names are flat too). Rename is unsupported (no engine
 * analog); DROP refuses under live produce/compaction locks, like every
 * destructive engine op.
 */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
  with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  /** One engine Catalog for the (session-cached) catalog instance: its
    * config/manifest caches are the point — a per-call Catalog would pay
    * cold metadata reads on every SQL operation and make dropTopic's
    * cache invalidation a no-op. */
  private lazy val engine: Catalog = {
    require(warehouse != null,
      s"catalog '$catalogName' has no warehouse — set spark.sql.catalog.$catalogName.warehouse")
    new Catalog(SparkSession.active, warehouse)
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    if (warehouse == null)
      throw new IllegalArgumentException(
        s"graft catalog '$name' requires spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  override def defaultNamespace(): Array[String] = Array(GraftCatalog.Namespace)

  private def checkNamespace(ns: Array[String]): Unit =
    if (!(ns.isEmpty || ns.sameElements(Array(GraftCatalog.Namespace))))
      throw new NoSuchNamespaceException(ns)

  // -- tables ---------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    checkNamespace(namespace)
    engine.listTopics()
      .map(t => Identifier.of(Array(GraftCatalog.Namespace), t)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    checkNamespace(ident.namespace())
    // `topic$kind` = metadata table (Iceberg's shape): SELECT * FROM
    // cat.`t$history` / `t$partitions` / `t$deletes`. '$' can never occur
    // in a real topic name (createTopic validates [A-Za-z0-9_.-]+), so the
    // split is unambiguous; unknown suffixes fail like any missing table.
    ident.name().split('$') match {
      case Array(base, kind) if GraftMetaTable.Kinds.contains(kind) =>
        if (!engine.topicExists(base)) throw new NoSuchTableException(ident)
        return new GraftMetaTable(engine, base, kind)
      case Array(base, "changes") =>
        // `t$changes` = the change data feed as a TABLE (the SQL analog of
        // Delta's table_changes TVF — Spark 4's CALL procedures can only
        // return driver-local rows, so the DISTRIBUTED feed surfaces as a
        // metadata-table read instead). Full retained span by default;
        // `WHERE _commit_version > a AND _commit_version <= b` predicates
        // PUSH DOWN into the scan's version window
        // ([[graft.streaming.GraftScanBuilder.pushFilters]]), so a bounded
        // span plans only the files its version diff touches — identical
        // to readChangeFeed with startingVersion/endingVersion.
        if (!engine.topicExists(base)) throw new NoSuchTableException(ident)
        return new GraftTopicTable(warehouse, base,
          consumer = None, targets = None, maxEventsPerTrigger = None,
          cdf = true)
      case _ =>
    }
    if (!engine.topicExists(ident.name())) throw new NoSuchTableException(ident)
    new GraftTopicTable(warehouse, ident.name(),
      consumer = None, targets = None, maxEventsPerTrigger = None)
  }

  /** `SELECT … FROM cat.topic VERSION AS OF <v>` — versions are the
    * topic's retained manifest commits ([[Catalog.versionHistory]]; list
    * them via `TopicHandle.history()`). The version resolves to its id
    * watermark HERE, load time, so a bad version fails the query at
    * analysis; the scan then plans only the pinned immutable prefix.
    * Retention follows the manifest log (commits fold into snapshots every
    * [[Catalog.ManifestSnapshotEvery]]) — older versions error loudly,
    * the Delta-Lake semantic. */
  override def loadTable(ident: Identifier, version: String): Table = {
    checkNamespace(ident.namespace())
    if (!engine.topicExists(ident.name())) throw new NoSuchTableException(ident)
    val seq = try version.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"table ${ident.name()}: VERSION AS OF takes a commit version number " +
        s"(see TopicHandle.history()), got '$version'")
    }
    new GraftTopicTable(warehouse, ident.name(),
      consumer = None, targets = None, maxEventsPerTrigger = None,
      asOfIds = Some(engine.watermarkAsOf(ident.name(), seq)))
  }

  /** `TIMESTAMP AS OF` — Spark hands epoch MICROseconds; resolves to the
    * newest retained commit at or before it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    checkNamespace(ident.namespace())
    if (!engine.topicExists(ident.name())) throw new NoSuchTableException(ident)
    val version = engine.versionAtTimestamp(ident.name(),
      math.floorDiv(timestamp, 1000L))
    new GraftTopicTable(warehouse, ident.name(),
      consumer = None, targets = None, maxEventsPerTrigger = None,
      asOfIds = Some(engine.watermarkAsOf(ident.name(), version)))
  }

  override def tableExists(ident: Identifier): Boolean =
    (ident.namespace().isEmpty ||
      ident.namespace().sameElements(Array(GraftCatalog.Namespace))) &&
      engine.topicExists(ident.name())

  override def createTable(ident: Identifier, info: TableInfo): Table =
    createTable(ident, info.schema(), info.partitions(), info.properties())

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    checkNamespace(ident.namespace())
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft topics are partitioned by the topic's partition count " +
      "(TBLPROPERTIES partitions 'N'), not by column transforms")
    // a column list, if given, must be the topic event schema — topics have
    // one fixed shape (the reference's Metadata/Data event model). Shape =
    // names + types; nullability is NOT compared, so CTAS works (`CREATE
    // TABLE g.t2 AS SELECT partition, 0L AS event_id, metadata, data FROM
    // …` derives non-null columns where the event schema declares
    // nullable, and vice versa — the write path re-selects by name and the
    // producer assigns real ids regardless)
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    if (schema.nonEmpty && shape(schema) != shape(GraftTopicTable.EventSchema))
      throw new IllegalArgumentException(
        s"graft tables have the fixed event schema ${GraftTopicTable.EventSchema.simpleString}; " +
        "omit the column list or match it exactly")
    val props = properties.asScala
    val nParts = props.get("partitions").map { v =>
      try v.trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"TBLPROPERTIES partitions must be an int, got '$v'")
      }
    }.getOrElse(1)
    def descriptor(key: String, dflt: org.json4s.JObject): org.json4s.JObject =
      props.get(key).map { json =>
        org.json4s.jackson.JsonMethods.parse(json) match {
          case o: org.json4s.JObject => o
          case _ => throw new IllegalArgumentException(
            s"TBLPROPERTIES $key must be a JSON object descriptor, got '$json'")
        }
      }.getOrElse(dflt)
    val config = TopicConfig(ident.name(), nParts,
      descriptor("validator", TopicConfig.DefaultValidator),
      descriptor("selector", TopicConfig.DefaultSelector),
      descriptor("serializer", TopicConfig.DefaultSerializer),
      completed = false)
    try engine.createTopic(config) catch {
      case e: IllegalStateException if e.getMessage.contains("already exists") =>
        throw new TableAlreadyExistsException(ident)
    }
    loadTable(ident)
  }

  /** `ALTER TABLE ... SET TBLPROPERTIES` maps to the engine's evolution
    * ops: `validator` runs the schema-registry compatibility gate
    * (alterTopicValidator — tightening refused when committed history
    * fails the new rules, add `'validatorCheckExisting' 'false'` for a
    * forced migration), `partitions` grows the partition count via
    * addPartition (growth only — ids are dense per partition and can
    * never shrink away). Everything else (column changes, selector/
    * serializer swaps that would reinterpret committed bytes) is
    * refused. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    checkNamespace(ident.namespace())
    if (!engine.topicExists(ident.name())) throw new NoSuchTableException(ident)
    val props = changes.map {
      case sp: TableChange.SetProperty => sp.property() -> sp.value()
      case other => throw new UnsupportedOperationException(
        s"graft topics only support ALTER TABLE SET TBLPROPERTIES " +
        s"(validator / partitions); got $other")
    }.toMap
    val known = Set("validator", "partitions", "validatorCheckExisting")
    val unknown = props.keySet -- known
    if (unknown.nonEmpty) throw new UnsupportedOperationException(
      s"unsupported graft table properties ${unknown.mkString(", ")} — " +
      "only validator / partitions evolve after creation (selector/" +
      "serializer would reinterpret committed bytes)")
    props.get("validator").foreach { json =>
      val v = Validator.fromDescriptor(
        org.json4s.jackson.JsonMethods.parse(json) match {
          case o: org.json4s.JObject => o
          case _ => throw new IllegalArgumentException(
            s"validator must be a JSON object descriptor, got '$json'")
        })
      val check = props.get("validatorCheckExisting").forall(_.trim.toBoolean)
      engine.alterTopicValidator(ident.name(), v, checkExisting = check)
    }
    props.get("partitions").foreach { v =>
      val target = try v.trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"partitions must be an int, got '$v'")
      }
      val current = engine.openTopic(ident.name()).partitions
      if (target < current) throw new UnsupportedOperationException(
        s"cannot shrink topic '${ident.name()}' from $current to $target " +
        "partitions — per-partition id spaces are append-only")
      (current until target).foreach(_ => engine.addPartition(ident.name()))
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && {
      engine.dropTopic(ident.name())
      true
    }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft topics cannot be renamed (chunk files and cursors key on the name)")

  // -- procedures: CALL cat.system.<op>(...) --------------------------------

  /** Maintenance as SQL: `CALL cat.system.compact('t')`,
    * `…vacuum/maintain/expire/restore/rebuild_manifest` — the Iceberg
    * `CALL catalog.system.…` shape over the engine's lifecycle ops (see
    * [[GraftProcedures]]). */
  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!ident.namespace().sameElements(Array(GraftProcedures.Namespace)))
      throw new RuntimeException(
        s"unknown procedure namespace ${ident.namespace().mkString(".")} — " +
        s"graft procedures live under '${GraftProcedures.Namespace}'")
    GraftProcedures.load(engine, ident.name()).getOrElse(
      throw new RuntimeException(
        s"unknown procedure '${ident.name()}' — available: " +
        GraftProcedures.names.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array(GraftProcedures.Namespace)))
      GraftProcedures.names
        .map(n => Identifier.of(Array(GraftProcedures.Namespace), n)).toArray
    else Array.empty

  // -- namespaces (one flat namespace, like the reference's topic space) ----

  override def listNamespaces(): Array[Array[String]] =
    Array(Array(GraftCatalog.Namespace))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    checkNamespace(namespace)
    if (namespace.isEmpty) listNamespaces() else Array.empty
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array(GraftCatalog.Namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    checkNamespace(namespace)
    Map("location" -> warehouse).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    else throw new UnsupportedOperationException(
      "graft has a single flat namespace; topics cannot be grouped")

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces are fixed")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft namespaces are fixed")
}

object GraftCatalog {
  val Namespace = "default"
}
