package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Bloom

/**
 * Persisted per-chunk-file BLOOM filters over a metadata field — the
 * point-lookup complement to [[MetadataIndex]]'s zone maps. Zones prune
 * range/equality predicates only when files are value-CLUSTERED; a
 * high-cardinality key spread hash-like across the log (user ids, trace
 * ids, document hashes) gives every file a [min, max] zone spanning the
 * whole domain, and zone pruning degenerates to a full scan. A per-file
 * bloom answers "can this file contain THIS value" regardless of value
 * layout: false positives open extra files (rate set by bits/keys), false
 * negatives never happen, so pruning can skip I/O but never change an
 * answer (the exact residual predicate is re-applied per row).
 *
 * Same lifecycle contracts as the zone index: an O(files) parquet
 * relation beside the manifest; refresh scans only live files without an
 * entry (O(new data)) and folds out dead paths; unindexed live files are
 * always scanned (conservative); runs under the compact lock; stored-form
 * topics decode through the topic's serializer. Hash family is
 * [[Bloom]]'s md5 construction — engine-independent, and the planner's
 * JVM re-derivation of the probe positions is spec-locked to the Spark
 * expression.
 *
 * At 100 TB: a point lookup on an unclustered key touches only the files
 * whose filter admits the value — with 4 hashes and ~8 bits/key, about
 * 2-3% false-positive extra files instead of a full-log scan.
 */
object BloomIndex {

  val Schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("json_path", StringType, nullable = false),
    StructField("num_bits", IntegerType, nullable = false),
    StructField("num_hashes", IntegerType, nullable = false),
    StructField("words", ArrayType(LongType), nullable = false),
    StructField("n_nonnull", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))

  /** Bloom indexes live beside the zone maps but in their own directory:
    * the two kinds have different schemas and refresh paths, and
    * `maintain()` dispatches each family to its own refresher. */
  private def indexDir(c: Catalog, topic: String): Path =
    new Path(c.topicPath(topic), "_bloomindex")
  private def indexPath(c: Catalog, topic: String, index: String): Path =
    new Path(indexDir(c, topic), Catalog.validIndexName(index))

  /** Names of the topic's bloom indexes (for `maintain()`). */
  def list(spark: SparkSession, c: Catalog, topic: String): Seq[String] = {
    val dir = indexDir(c, topic)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.endsWith(".tmp") || n.endsWith(".old")).toSeq.sorted
  }

  private def liveFiles(c: Catalog, topic: String)
      : Either[Seq[(Int, String)], DataFrame] =
    c.liveFilesUniverse(topic)

  private def readIndex(spark: SparkSession, c: Catalog, topic: String,
                        index: String): Seq[Row] = {
    val dir = indexPath(c, topic, index)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // file-identity-keyed driver cache (r18) — see [[IndexCache]]
    IndexCache.rows(spark, fs, dir, Schema)
  }

  /** JVM mirror of [[Bloom.position]] — the planner probes filters
    * driver-side without a Spark job. MUST stay in lockstep with the Spark
    * expression (BloomIndexSpec asserts equality on random keys). */
  private[engine] def jvmPositions(value: String, numBits: Int,
                                   numHashes: Int): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numHashes).map { j =>
      val hex = md.digest(s"$j:$value".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % numBits).toInt
    }
  }

  /**
   * Build or incrementally refresh the bloom index over `jsonPath`.
   * Per-file filters are built in one pass over the NEW files: k positions
   * exploded per row, `bit_or` per (file, word) with map-side combine, the
   * dense word arrays assembled driver-side (O(files * words), the index
   * relation's own size class). Returns files newly indexed.
   */
  def refresh(spark: SparkSession, c: Catalog, topic: String, index: String,
              jsonPath: String, numBits: Int = 4032, numHashes: Int = 4): Int = {
    require(jsonPath.startsWith("$."), s"jsonPath must be '$$.field': $jsonPath")
    require(numBits > 0 && numBits % Bloom.WordBits == 0,
      s"numBits must be a positive multiple of ${Bloom.WordBits}: $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1: $numHashes")
    c.acquireCompactLock(topic)
    // the compact lock does not exclude produces, whose snapshot rolls can
    // delete the manifest relation mid-read — retry once on that race
    try Catalog.retryOnRollRace(
      refreshLocked(spark, c, topic, index, jsonPath, numBits, numHashes))
    finally c.releaseCompactLock(topic)
  }

  private def refreshLocked(spark: SparkSession, c: Catalog, topic: String,
                            index: String, jsonPath: String, numBits: Int,
                            numHashes: Int): Int = {
    {
      // repair a crashed earlier install before reading anything
      {
        val d = indexPath(c, topic, index)
        IndexInstall.heal(d.getFileSystem(spark.sparkContext.hadoopConfiguration), d)
      }
      def checkIdentity(r: Row): Unit =
        require(r.getAs[String]("json_path") == jsonPath &&
          r.getAs[Int]("num_bits") == numBits &&
          r.getAs[Int]("num_hashes") == numHashes,
          s"bloom index '$index' on topic '$topic' is over " +
            s"${r.getAs[String]("json_path")} with ${r.getAs[Int]("num_bits")}/" +
            s"${r.getAs[Int]("num_hashes")} — parameters cannot change in place")
      // live universe: driver list for small manifests; for parquet-backed
      // ones the kept/new sets are (anti-)joins over the relation — the
      // full file list never materializes on the driver
      val (newRel: Seq[(Int, String)], keptDf: DataFrame, skip: Boolean) =
        liveFiles(c, topic) match {
          case Left(live) =>
            val liveSet = live.map(_._2).toSet
            val existing = readIndex(spark, c, topic, index)
            existing.headOption.foreach(checkIdentity)
            val keptEntries = existing.filter(r => liveSet.contains(r.getAs[String]("path")))
            val known = keptEntries.map(_.getAs[String]("path")).toSet
            val fresh = live.filterNot { case (_, p) => known.contains(p) }
            val skip = fresh.isEmpty && (keptEntries.size == existing.size ||
              (keptEntries.isEmpty && existing.nonEmpty))
            (fresh, spark.createDataFrame(
              spark.sparkContext.parallelize(keptEntries.toList, 1), Schema), skip)
          case Right(liveDf) =>
            val dir = indexPath(c, topic, index)
            val fsys = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
            val existingDf =
              if (fsys.exists(dir)) spark.read.schema(Schema).parquet(dir.toString)
              else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schema)
            existingDf.limit(1).collect().headOption.foreach(checkIdentity)
            val kept = existingDf.join(liveDf.select(col("path")), Seq("path"), "left_semi")
            val fresh = liveDf.select(col("partition"), col("path"))
              .join(existingDf.select(col("path")), Seq("path"), "left_anti")
              .collect().map(r => (r.getAs[Int]("partition"), r.getAs[String]("path"))).toSeq
            val (existingN, keptN) = (existingDf.count(), kept.count())
            val skip = fresh.isEmpty && (keptN == existingN ||
              (keptN == 0L && existingN > 0L))
            (fresh, kept, skip)
        }
      if (skip) return 0

      val logRoot = c.logPath(topic)
      val newEntries: Seq[Row] = if (newRel.isEmpty) Seq.empty else {
        val abs = newRel.map { case (_, rel) => new Path(logRoot, rel).toString }
        val ser = Serializer.fromDescriptor(c.openTopic(topic).serializer)
        val metadata = ser.decodedMetadataCol
        val raw = get_json_object(metadata, jsonPath)
        val rel = regexp_extract(input_file_name(), "(partition=[^/]+/[^/]+)$", 1)
        val base = spark.read.option("basePath", logRoot)
          .schema(Catalog.EventSchema).parquet(abs: _*)
          .select(col("partition"), rel.as("path"), raw.as("v"))
        val counts = base.groupBy(col("partition"), col("path"))
          .agg(count(col("v")).as("n_nonnull"), count(lit(1)).as("n_rows"))
          .collect()
          .map(r => (r.getInt(0), r.getString(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        val bits = base.filter(col("v").isNotNull)
          .select(col("partition"), col("path"), explode(array(
            (0 until numHashes).map(j => Bloom.position(col("v"), j, numBits)): _*)).as("p"))
          .groupBy(col("partition"), col("path"), Bloom.wordOf(col("p")).as("word"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 63) AS INT)))")
            .as("bits"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getString(1)))
          .view.mapValues(_.map(r => r.getLong(2) -> r.getLong(3)).toMap).toMap
        counts.toSeq.map { case ((part, path), (nn, nr)) =>
          val wordMap = bits.getOrElse((part, path), Map.empty)
          val dense = (0 until numBits / Bloom.WordBits)
            .map(w => wordMap.getOrElse(w.toLong, 0L))
          Row(part, path, jsonPath, numBits, numHashes, dense, nn, nr)
        }
      }
      val all = keptDf.select(Schema.fieldNames.map(col): _*).unionByName(
        spark.createDataFrame(
          spark.sparkContext.parallelize(newEntries.toList, 1), Schema))
      val dir = indexPath(c, topic, index)
      val tmp = new Path(dir.getParent, dir.getName + ".tmp")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(tmp, true)
      all.coalesce(1).write.parquet(tmp.toString)
      IndexInstall.install(fs, dir)
      newEntries.size
    }
  }

  /** One row of the index relation (its parameter header), without
    * collecting the whole O(files) relation driver-side. */
  private def indexHead(spark: SparkSession, c: Catalog, topic: String,
                        index: String): Option[Row] = {
    val dir = indexPath(c, topic, index)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!IndexInstall.waitReadable(fs, dir)) None
    else IndexCache.cachedHead(fs, dir).orElse(
      spark.read.schema(Schema).parquet(dir.toString)
        .limit(1).collect().headOption)
  }

  /** Refresh an existing bloom index under its stored parameters (the
    * `maintain()` path). Unknown index → 0. */
  def refreshExisting(spark: SparkSession, c: Catalog, topic: String,
                      index: String): Int = {
    c.acquireCompactLock(topic)
    try {
      // heal a crashed install before deciding the index is absent
      val d = indexPath(c, topic, index)
      IndexInstall.heal(d.getFileSystem(spark.sparkContext.hadoopConfiguration), d)
      indexHead(spark, c, topic, index) match {
        case None => 0
        case Some(h) => Catalog.retryOnRollRace(refreshLocked(spark, c, topic,
          index, h.getAs[String]("json_path"), h.getAs[Int]("num_bits"),
          h.getAs[Int]("num_hashes")))
      }
    } finally c.releaseCompactLock(topic)
  }

  /** Pruning plan. Small topics decide driver-side over the collected
    * index; topics past [[MetadataIndex.driverPlanMax]] decide through a
    * left-outer join of the live list against the index RELATION, probing
    * the same `numHashes` precomputed bit positions with `element_at` —
    * only the kept paths reach the driver (see [[MetadataIndex.plan]]). */
  private def plan(spark: SparkSession, c: Catalog, topic: String,
                   index: String, value: String)
      : (Seq[String], String, MetadataIndex.IndexScan) =
    // a produce's snapshot roll can delete the manifest relation under the
    // live-universe read (these paths hold no lock against produces)
    Catalog.retryOnRollRace(planOnce(spark, c, topic, index, value))

  private def planOnce(spark: SparkSession, c: Catalog, topic: String,
                   index: String, value: String)
      : (Seq[String], String, MetadataIndex.IndexScan) = {
    val universe = liveFiles(c, topic)
    val logRoot = c.logPath(topic)
    val dir = indexPath(c, topic, index)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!IndexInstall.waitReadable(fs, dir)) throw new IllegalStateException(
      s"bloom index '$index' on topic '$topic' does not exist — refresh it first")
    val idxDf = spark.read.schema(Schema).parquet(dir.toString)
    // small topics collect the index ONCE (head check + plan from the same
    // read); large ones (incl. parquet-backed manifests, whose live list
    // never materializes) read only the head row and plan via join
    val small = universe.left.exists(_.size <= MetadataIndex.driverPlanMax(spark))
    val entries: Seq[Row] =
      if (small) IndexCache.rows(spark, fs, dir, Schema)
      else IndexCache.cachedHead(fs, dir).map(Seq(_))
        .getOrElse(idxDf.limit(1).collect().toSeq)
    val head = entries.headOption.getOrElse(
      throw new IllegalStateException(
        s"bloom index '$index' on topic '$topic' does not exist — refresh it first"))
    val (jsonPath, numBits, numHashes) = (head.getAs[String]("json_path"),
      head.getAs[Int]("num_bits"), head.getAs[Int]("num_hashes"))
    val pos = jvmPositions(value, numBits, numHashes)
    def joinPlan(liveDf: DataFrame): Seq[String] = {
      val admits = pos.map { p =>
        (element_at(col("words"), p / Bloom.WordBits + 1)
          .bitwiseAND(lit(1L << (p % Bloom.WordBits)))) =!= 0L
      }.reduce(_ && _)
      liveDf.join(idxDf, col("live_path") === col("path"), "left_outer")
        .filter(col("path").isNull || (col("n_nonnull") > 0L && admits))
        .select(col("live_path"))
        .collect().map(_.getString(0)).toSeq
    }
    val (keptRel: Seq[String], total: Int) = universe match {
      case Left(live) if small =>
        val byPath = entries.map(r => r.getAs[String]("path") -> r).toMap
        (live.filter { case (_, rel) =>
          byPath.get(rel) match {
            case None => true // produced since the last refresh: scan conservatively
            case Some(r) =>
              r.getAs[Long]("n_nonnull") > 0L && {
                val words = r.getAs[scala.collection.Seq[Long]]("words")
                pos.forall(p => (words(p / Bloom.WordBits)
                  & (1L << (p % Bloom.WordBits))) != 0L)
              }
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
      jsonPath, MetadataIndex.IndexScan(total, keptRel.size))
  }

  /** Pruning stats only: how many live files a lookup of `value` opens. */
  def scanEq(spark: SparkSession, c: Catalog, topic: String, index: String,
             value: String): MetadataIndex.IndexScan =
    plan(spark, c, topic, index, value)._3

  /** The bloom-pruned point lookup: only files whose filter admits `value`
    * (plus unindexed ones), with the exact equality re-applied per row —
    * rows identical to filtering the full consumer view. */
  def eventsEq(spark: SparkSession, c: Catalog, topic: String, index: String,
               value: String): DataFrame = {
    val (files, jsonPath, _) = plan(spark, c, topic, index, value)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Catalog.EventSchema)
      else spark.read.option("basePath", c.logPath(topic))
        .schema(Catalog.EventSchema).parquet(files: _*)
    val decoded =
      Serializer.fromDescriptor(c.openTopic(topic).serializer).decodeMetadataDf(base)
    // cold-tier files union in unconditionally (see MetadataIndex.withCold)
    MetadataIndex.withCold(c, topic, decoded)
      .filter(get_json_object(col("metadata"), jsonPath) === value)
  }
}
