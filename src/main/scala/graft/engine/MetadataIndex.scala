package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Persisted per-chunk-file zone maps over a NUMERIC metadata field — the
 * engine's secondary index. Parquet's own row-group statistics cannot see
 * INSIDE the metadata JSON document, so a consumer filtering on a metadata
 * field (`get_json_object(metadata, '$.k') BETWEEN a AND b`) scans every
 * chunk file of the topic. This index lifts min/max/null-count statistics
 * of an extracted field to file granularity, so an indexed read opens only
 * the files whose value range intersects the predicate.
 *
 * Shape and contracts:
 *
 *  - The index is a small parquet relation keyed by chunk-file path:
 *    `(partition, path, json_path, lo, hi, n_nonnull, n_rows)` — O(files),
 *    the same scale class as the manifest itself.
 *  - `refresh` scans ONLY live files not yet indexed (the manifest names
 *    the live set), one column of each — cost O(new data since the last
 *    refresh), never O(topic). Entries for dead (compacted/expired) paths
 *    are dropped on the same pass.
 *  - Pruning is CONSERVATIVE, never lossy: a live file with no index entry
 *    (produced since the last refresh) is always scanned; a file whose
 *    entry says the field is all-NULL is skipped (a numeric range
 *    predicate cannot match NULL). The residual predicate is re-applied
 *    row-by-row on the pruned scan, so an indexed read returns EXACTLY
 *    the rows the unindexed read would — the index can only skip work,
 *    never change an answer.
 *  - Runs under the compact lock so compaction cannot swap files out from
 *    under a refresh; the index file itself is swapped atomically
 *    (write-new + rename) like the catalog's other metadata.
 *  - Stored-form topics (non-JSON serializers) are decoded through the
 *    topic's serializer before extraction, same as the consumer view.
 *
 * At 100 TB: the refresh is a single narrow aggregation over new files
 * only; the indexed read turns a full-log scan into an O(matching files)
 * scan — the same order-of-magnitude win parquet row-group skipping gives
 * WITHIN a file, applied across the file population.
 */
object MetadataIndex {

  /** What an indexed read would open: `kept` of `total` live files. */
  final case class IndexScan(total: Int, kept: Int)

  /** Index kinds: numeric zones prune range predicates; string zones prune
    * equality (and lexicographic-range) predicates — "10" < "9" as strings,
    * so the two are never mixed in one index. */
  val Numeric = "numeric"
  val Str = "string"

  val IndexSchema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("json_path", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("num_lo", DoubleType),
    StructField("num_hi", DoubleType),
    StructField("str_lo", StringType),
    StructField("str_hi", StringType),
    StructField("n_nonnull", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))

  private def indexDir(c: Catalog, topic: String): Path =
    new Path(c.topicPath(topic), "_index")
  private def indexPath(c: Catalog, topic: String, index: String): Path =
    new Path(indexDir(c, topic), Catalog.validIndexName(index))

  /** Live (partition, relativePath) universe — Left for driver-sized
    * manifests, Right (a relation) for parquet-backed ones
    * ([[Catalog.liveFilesUniverse]]). */
  private def liveFiles(c: Catalog, topic: String)
      : Either[Seq[(Int, String)], DataFrame] =
    c.liveFilesUniverse(topic)

  private def readIndex(spark: SparkSession, c: Catalog, topic: String,
                        index: String): Seq[Row] = {
    val dir = indexPath(c, topic, index)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // file-identity-keyed driver cache (r18): refresh + every pruning plan
    // collected this few-KB relation via a full Spark job each time
    IndexCache.rows(spark, fs, dir, IndexSchema)
  }

  /**
   * Build or incrementally refresh the index: scans live files without an
   * entry, folds out entries for dead files. Returns the number of files
   * newly indexed. Idempotent; safe on any cadence (each produce adds at
   * most one file per partition, so "refresh after every N produces" keeps
   * the unindexed — conservatively scanned — tail bounded at N files).
   *
   * Holds the COMPACT lock for its duration — compaction must not swap
   * files out from under the scan — which also refuses produces while it
   * runs (the producer's compaction guard). Refresh often: steady-state
   * cost is O(files since the last refresh), so the produce-blocked window
   * stays small; or fold it into `maintain()`'s maintenance window.
   */
  def refresh(spark: SparkSession, c: Catalog, topic: String, index: String,
              jsonPath: String, kind: String = Numeric): Int = {
    require(jsonPath.startsWith("$."), s"jsonPath must be '$$.field': $jsonPath")
    require(kind == Numeric || kind == Str, s"kind must be numeric|string: $kind")
    c.acquireCompactLock(topic)
    // the compact lock does not exclude produces, whose snapshot rolls can
    // delete the manifest relation mid-read — retry once on that race
    try Catalog.retryOnRollRace(
      refreshLocked(spark, c, topic, index, jsonPath, kind))
    finally c.releaseCompactLock(topic)
  }

  private def refreshLocked(spark: SparkSession, c: Catalog, topic: String,
                            index: String, jsonPath: String, kind: String): Int = {
    {
      // repair a crashed earlier install before reading anything
      {
        val d = indexPath(c, topic, index)
        IndexInstall.heal(d.getFileSystem(spark.sparkContext.hadoopConfiguration), d)
      }
      // the live universe: driver list for small manifests, RELATION for
      // parquet-backed ones — then kept/new are (anti-)joins and the full
      // file list never materializes on the driver
      val (newRel: Seq[(Int, String)], keptDf: Option[DataFrame], skip: Boolean) =
        liveFiles(c, topic) match {
          case Left(live) =>
            val liveSet = live.map(_._2).toSet
            val existing = readIndex(spark, c, topic, index)
            existing.headOption.foreach(checkIdentity(_, topic, index, jsonPath, kind))
            val keptEntries = existing.filter(r => liveSet.contains(r.getAs[String]("path")))
            val known = keptEntries.map(_.getAs[String]("path")).toSet
            val fresh = live.filterNot { case (_, p) => known.contains(p) }
            val skip = fresh.isEmpty && (keptEntries.size == existing.size ||
              (keptEntries.isEmpty && existing.nonEmpty))
            (fresh, Some(spark.createDataFrame(
              spark.sparkContext.parallelize(keptEntries.toList, 1), IndexSchema)), skip)
          case Right(liveDf) =>
            val dir = indexPath(c, topic, index)
            val fsys = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val existingDf =
              if (fsys.exists(dir)) spark.read.schema(IndexSchema).parquet(dir.toString)
              else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], IndexSchema)
            existingDf.limit(1).collect().headOption
              .foreach(checkIdentity(_, topic, index, jsonPath, kind))
            val kept = existingDf.join(
              liveDf.select(col("path")), Seq("path"), "left_semi")
            val fresh = liveDf.select(col("partition"), col("path"))
              .join(existingDf.select(col("path")), Seq("path"), "left_anti")
              .collect().map(r => (r.getAs[Int]("partition"), r.getAs[String]("path"))).toSeq
            val (existingN, keptN) = (existingDf.count(), kept.count())
            val skip = fresh.isEmpty && (keptN == existingN ||
              (keptN == 0L && existingN > 0L))
            (fresh, Some(kept), skip)
        }
      // nothing new and nothing dead (or the topic fully expired: keep the
      // stale rows — pruning keys on the LIVE list and they preserve the
      // index's (json_path, kind) identity for refreshExisting)
      if (skip) return 0

      val logRoot = c.logPath(topic)
      val newEntriesDf: DataFrame = if (newRel.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], IndexSchema)
      else {
        val abs = newRel.map { case (_, rel) => new Path(logRoot, rel).toString }
        val metadata =
          Serializer.fromDescriptor(c.openTopic(topic).serializer).decodedMetadataCol
        val raw = get_json_object(metadata, jsonPath)
        val (numV, strV) =
          if (kind == Numeric) (raw.cast(DoubleType), lit(null).cast(StringType))
          else (lit(null).cast(DoubleType), raw)
        val nonNull = if (kind == Numeric) numV else strV
        // input_file_name is a URI whose prefix varies by filesystem; the
        // manifest-relative tail "partition=<p>/<file>" is scheme-invariant
        val rel = regexp_extract(input_file_name(), "(partition=[^/]+/[^/]+)$", 1)
        spark.read.option("basePath", logRoot).schema(Catalog.EventSchema)
          .parquet(abs: _*)
          .groupBy(col("partition"), rel.as("path"))
          .agg(min(numV).as("num_lo"), max(numV).as("num_hi"),
            min(strV).as("str_lo"), max(strV).as("str_hi"),
            count(nonNull).as("n_nonnull"), count(lit(1)).as("n_rows"))
          .withColumn("json_path", lit(jsonPath))
          .withColumn("kind", lit(kind))
          .select("partition", "path", "json_path", "kind",
            "num_lo", "num_hi", "str_lo", "str_hi", "n_nonnull", "n_rows")
      }
      val all = keptDf.get.select(IndexSchema.fieldNames.map(col): _*)
        .unionByName(newEntriesDf)
      val dir = indexPath(c, topic, index)
      val tmp = new Path(dir.getParent, dir.getName + ".tmp")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(tmp, true)
      all.coalesce(1).write.parquet(tmp.toString)
      IndexInstall.install(fs, dir)
      newRel.size
    }
  }

  private def checkIdentity(r: Row, topic: String, index: String,
                            jsonPath: String, kind: String): Unit = {
    val (pp, pk) = (r.getAs[String]("json_path"), r.getAs[String]("kind"))
    require(pp == jsonPath && pk == kind,
      s"index '$index' on topic '$topic' is over $pp ($pk), not $jsonPath " +
      s"($kind) — use a different index name per field")
  }

  /** One row of the index relation (its identity header), without
    * collecting the whole O(files) relation driver-side. */
  private def indexHead(spark: SparkSession, c: Catalog, topic: String,
                        index: String): Option[Row] = {
    val dir = indexPath(c, topic, index)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!IndexInstall.waitReadable(fs, dir)) None
    else IndexCache.cachedHead(fs, dir).orElse(
      spark.read.schema(IndexSchema).parquet(dir.toString)
        .limit(1).collect().headOption)
  }

  /** Refresh an EXISTING index under its own stored (json_path, kind) —
    * the maintenance-policy path, where the caller doesn't restate the
    * field. Unknown index → 0 (nothing to refresh, not an error). */
  def refreshExisting(spark: SparkSession, c: Catalog, topic: String,
                      index: String): Int = {
    c.acquireCompactLock(topic)
    try {
      // a crashed install must be healed HERE, or maintain() would read
      // the index as absent and silently stop refreshing it forever
      val d = indexPath(c, topic, index)
      IndexInstall.heal(d.getFileSystem(spark.sparkContext.hadoopConfiguration), d)
      indexHead(spark, c, topic, index) match {
        case None => 0
        case Some(h) => Catalog.retryOnRollRace(refreshLocked(spark, c, topic,
          index, h.getAs[String]("json_path"), h.getAs[String]("kind")))
      }
    } finally c.releaseCompactLock(topic)
  }

  /** Max live-file count the planner evaluates driver-side. Beyond it the
    * pruning decision runs as a distributed join that collects only the
    * KEPT paths — O(matching files) to the driver, not O(files). Tests
    * set it to 0 to force the distributed path on small fixtures. */
  private[engine] def driverPlanMax(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.index.driverPlanMaxEntries").map { v =>
      try v.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"spark.graft.index.driverPlanMaxEntries must be a long, got '$v'")
      }
    }.getOrElse(65536L)

  /** UTF-8 BINARY `a <= b` — Spark's string ordering, which computed the
    * zone bounds. Java's `String.compareTo` is UTF-16 code-unit order and
    * DIVERGES for supplementary characters (U+FFFF sorts above an emoji in
    * UTF-16 but below it in UTF-8), so the driver path must not use it:
    * the two plan paths would prune differently, and the driver one could
    * skip a file that contains the queried value. */
  private[engine] def utf8Leq(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length <= y.length
  }

  /** Double `a >= b` under Spark's total ordering (NaN greatest) — plain
    * Java `>=` answers false for NaN operands, which would wrongly SKIP a
    * file whose zone bound is NaN while the distributed path keeps it. */
  private def sparkGeq(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) >= 0

  /** The files a zone predicate keeps, with totals. `keepEntry` decides an
    * INDEXED file from its zone row; unindexed live files are always kept
    * (conservative), all-NULL zones always skipped (no non-NULL predicate
    * can match). Small topics decide driver-side over the collected index
    * (no Spark job); topics past [[driverPlanMax]] decide through a
    * left-outer join of the live list against the index RELATION — the
    * index never materializes on the driver, only the kept paths do
    * (`keepCol` is the same predicate as a Column, over the index's
    * schema). The live list itself comes from the manifest, which is
    * driver-resident by design — the index is the piece that outgrows it
    * (one row per file per indexed field). */
  private def plan(spark: SparkSession, c: Catalog, topic: String, index: String,
                   wantKind: String, keepEntry: Row => Boolean,
                   keepCol: org.apache.spark.sql.Column)
      : (Seq[String], String, IndexScan) =
    // a produce's snapshot roll can delete the manifest relation under the
    // live-universe read (these paths hold no lock against produces)
    Catalog.retryOnRollRace(
      planOnce(spark, c, topic, index, wantKind, keepEntry, keepCol))

  private def planOnce(spark: SparkSession, c: Catalog, topic: String, index: String,
                   wantKind: String, keepEntry: Row => Boolean,
                   keepCol: org.apache.spark.sql.Column)
      : (Seq[String], String, IndexScan) = {
    val universe = liveFiles(c, topic)
    val logRoot = c.logPath(topic)
    val dir = indexPath(c, topic, index)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!IndexInstall.waitReadable(fs, dir)) throw new IllegalStateException(
      s"index '$index' on topic '$topic' does not exist — refresh it first")
    val idxDf = spark.read.schema(IndexSchema).parquet(dir.toString)
    // small topics collect the index ONCE and decide driver-side; large
    // ones (driver list past the threshold, or a parquet-backed manifest —
    // then the live list itself never materializes) read only the head row
    // here (identity check) and plan via join
    val small = universe.left.exists(_.size <= driverPlanMax(spark))
    val entries: Seq[Row] =
      if (small) IndexCache.rows(spark, fs, dir, IndexSchema)
      else IndexCache.cachedHead(fs, dir).map(Seq(_))
        .getOrElse(idxDf.limit(1).collect().toSeq)
    val head = entries.headOption.getOrElse(throw new IllegalStateException(
      s"index '$index' on topic '$topic' does not exist — refresh it first"))
    require(head.getAs[String]("kind") == wantKind,
      s"index '$index' is ${head.getAs[String]("kind")}-kinded; " +
      s"this read needs a $wantKind index")
    val jsonPath = head.getAs[String]("json_path")
    def joinPlan(liveDf: org.apache.spark.sql.DataFrame): Seq[String] =
      liveDf.join(idxDf, col("live_path") === col("path"), "left_outer")
        .filter(col("path").isNull || (col("n_nonnull") > 0L && keepCol))
        .select(col("live_path"))
        .collect().map(_.getString(0)).toSeq
    val (keptRel: Seq[String], total: Int) = universe match {
      case Left(live) if small =>
        val byPath = entries.map(r => r.getAs[String]("path") -> r).toMap
        (live.filter { case (_, rel) =>
          byPath.get(rel) match {
            case None => true // produced since the last refresh: scan conservatively
            case Some(r) => r.getAs[Long]("n_nonnull") > 0L && keepEntry(r)
          }
        }.map(_._2), live.size)
      case Left(live) =>
        import spark.implicits._
        (joinPlan(live.map(_._2).toDF("live_path")), live.size)
      case Right(liveDf) =>
        (joinPlan(liveDf.select(col("path").as("live_path"))),
          liveDf.count().toInt)
    }
    (keptRel.map(rel => new Path(logRoot, rel).toString),
      jsonPath, IndexScan(total, keptRel.size))
  }

  // driver predicates use Spark's orderings (UTF-8 strings, NaN-greatest
  // doubles) so the two plan paths can never prune differently
  private def numPlan(spark: SparkSession, c: Catalog, topic: String,
                      index: String, lower: Double, upper: Double) =
    plan(spark, c, topic, index, Numeric,
      r => sparkGeq(r.getAs[Double]("num_hi"), lower) &&
        sparkGeq(upper, r.getAs[Double]("num_lo")),
      col("num_hi") >= lower && col("num_lo") <= upper)

  private def strPlan(spark: SparkSession, c: Catalog, topic: String,
                      index: String, value: String) =
    plan(spark, c, topic, index, Str,
      r => utf8Leq(r.getAs[String]("str_lo"), value) &&
        utf8Leq(value, r.getAs[String]("str_hi")),
      col("str_lo") <= value && col("str_hi") >= value)

  /** Pruning stats only (ops/assertion surface): how many live files an
    * indexed read of `[lower, upper]` would open. */
  def scan(spark: SparkSession, c: Catalog, topic: String, index: String,
           lower: Double, upper: Double): IndexScan =
    numPlan(spark, c, topic, index, lower, upper)._3

  /** [[scan]] for a string-equality read. */
  def scanEq(spark: SparkSession, c: Catalog, topic: String, index: String,
             value: String): IndexScan =
    strPlan(spark, c, topic, index, value)._3

  /** The pruned scan with the exact residual predicate re-applied — rows
    * are identical to filtering the full consumer view, only I/O differs. */
  private def prunedRead(spark: SparkSession, c: Catalog, topic: String,
                         files: Seq[String]): DataFrame = {
    val base =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Catalog.EventSchema)
      else spark.read.option("basePath", c.logPath(topic))
        .schema(Catalog.EventSchema).parquet(files: _*)
    Serializer.fromDescriptor(c.openTopic(topic).serializer).decodeMetadataDf(base)
  }

  /**
   * The indexed range read: only files whose numeric zone intersects
   * `[lower, upper]` (plus unindexed ones, conservatively), with the exact
   * predicate re-applied per row.
   */
  def events(spark: SparkSession, c: Catalog, topic: String, index: String,
             lower: Double, upper: Double): DataFrame = {
    val (files, jsonPath, _) = numPlan(spark, c, topic, index, lower, upper)
    withCold(c, topic, prunedRead(spark, c, topic, files)).filter(
      get_json_object(col("metadata"), jsonPath).cast(DoubleType).between(lower, upper))
  }

  /** The indexed equality read over a string-kinded index (curation-style
    * `lang = 'en'` / `source = 'srcN'` filters). */
  def eventsEq(spark: SparkSession, c: Catalog, topic: String, index: String,
               value: String): DataFrame = {
    val (files, jsonPath, _) = strPlan(spark, c, topic, index, value)
    withCold(c, topic, prunedRead(spark, c, topic, files)).filter(
      get_json_object(col("metadata"), jsonPath) === value)
  }

  /** Indexes cover the HOT tier (their file universe is the manifest);
    * cold-tier files are unioned in unconditionally — conservative, like
    * any unindexed file, so an archived row can never vanish from an
    * indexed read. Deletion vectors apply HERE, the shared tail of every
    * indexed read — a compliance delete must hold on all read surfaces,
    * and the index file universe knows nothing about vectored ids (the
    * anti-join keys on (partition, event_id), unaffected by the metadata
    * decode). Shared by the zone and bloom read paths. */
  private[engine] def withCold(c: Catalog, topic: String, hot: DataFrame): DataFrame =
    c.applyDeleteVectors(topic, c.coldEvents(topic) match {
      case None => hot
      case Some(cold) =>
        hot.unionByName(
          Serializer.fromDescriptor(c.openTopic(topic).serializer)
            .decodeMetadataDf(cold))
    })
}
