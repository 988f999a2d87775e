package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Driver-side read-through cache for SMALL index relations (zone-map and
 * bloom directories) — the pruning planner's analog of the driver-resident
 * manifest (guide §6: repeated metadata reads are driver-side cost).
 *
 * A small topic's index is collected to the driver on every refresh and on
 * every pruning plan — each a full Spark job (plan/submit/scan cycle) over
 * a file of a few KB, and a meta-index fixture pays that cycle 4-6 times.
 * The collected rows are memoized per index DIRECTORY, keyed by the exact
 * installed file identity (name + length + mtime of every file in the
 * dir): any install — by this process or another — changes the part-file
 * names (Spark writes fresh UUID-named parts) and therefore the signature,
 * so a stale hit is impossible without bypassing [[IndexInstall]].
 *
 * This caches engine METADATA (per-file statistics, the same scale class
 * and lifecycle as the manifest), never event rows or query results: every
 * pruned read still scans its kept parquet files, and the pruning decision
 * is recomputed from these rows on every call. Only the driver-plan path
 * uses it; large topics keep the distributed join over the index RELATION
 * (the rows never materialize on the driver there).
 */
private[engine] object IndexCache {

  private final case class Entry(sig: String, rows: Seq[Row])

  /** Bounded: an engine session touches a handful of indexes; a runaway
    * caller (many temp warehouses in one JVM) just cycles the cache. */
  private val MaxEntries = 256
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private def signature(fs: FileSystem, dir: Path): String =
    fs.listStatus(dir).filter(_.isFile)
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .sorted.mkString(";")

  /** Collected rows of an index dir (empty if absent), re-read only when
    * the installed files change. */
  def rows(spark: SparkSession, fs: FileSystem, dir: Path,
           schema: StructType): Seq[Row] = {
    if (!fs.exists(dir)) return Seq.empty
    val sig = signature(fs, dir)
    val key = dir.toString
    val hit = cache.get(key)
    if (hit != null && hit.sig == sig) hit.rows
    else {
      val fresh = spark.read.schema(schema).parquet(key).collect().toSeq
      if (cache.size >= MaxEntries) cache.clear()
      cache.put(key, Entry(sig, fresh))
      fresh
    }
  }

  /** Cache-only peek (no Spark job, no population): the head row if this
    * dir's CURRENT content is already cached — for identity/parameter
    * checks on paths that must not collect a potentially large relation. */
  def cachedHead(fs: FileSystem, dir: Path): Option[Row] = {
    if (!fs.exists(dir)) return None
    val hit = cache.get(dir.toString)
    if (hit != null && hit.sig == signature(fs, dir)) hit.rows.headOption
    else None
  }
}
