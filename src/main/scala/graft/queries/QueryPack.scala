package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * A named bundle of driver-contract queries: every entry in [[queries]] is a
 * Spark query over the `/root/testdata/sf*` parquet tables, and (when the
 * semantics are SQL-expressible) [[oracles]] carries the equivalent ANSI SQL
 * that the driver runs in DuckDB over the same tables.
 *
 * Contract rules (see the driver brief):
 *  - column names must match exactly between the Spark result and the oracle
 *    (the comparator sorts columns by name before hashing);
 *  - results are deterministically ordered in BOTH engines (explicit ORDER BY
 *    on a unique key) so row order can never produce a spurious mismatch;
 *  - floating-point aggregates are emitted as exact integers (cents via
 *    `round(x*100) → BIGINT`) so double summation order differences between
 *    engines cannot flip a hash.
 */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Shared helpers for query packs. */
object Q {
  import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

  /**
   * Read one testdata table, normalizing `ts` to the engine's integer time
   * domain: epoch NANOSECONDS as BIGINT. The testdata parquet has carried
   * `ts` both as INT64(nanos) and as timestamp[us] across driver versions;
   * every downstream query (and the DuckDB oracles, via `epoch_ns(ts)`) does
   * exact integer arithmetic on long nanos, so the encoding is erased HERE,
   * at the single read boundary. `unix_micros` after a cast to TIMESTAMP is
   * exact (no sub-microsecond data exists in either encoding), and the
   * session time zone is UTC, so TIMESTAMP_NTZ → TIMESTAMP is the identity
   * reinterpretation that matches DuckDB's naive-timestamp `epoch_ns`.
   *
   * Pushdown note: the rewrite makes `ts` a DERIVED column, so a ts-range
   * predicate would no longer reach the parquet scan as a PushedFilter.
   * No registered query range-filters raw `ts` at the scan (they bucket or
   * window it — not pushable either way), so nothing is lost today; a
   * future scan-selective time query should filter on the raw column
   * BEFORE this rewrite (read the parquet directly, filter the native
   * timestamp, then normalize).
   */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    // Schema memo (guide §6: repeated footer/metadata reads are driver-side
    // cost): the parquet schema is inferred ONCE per (path, file identity)
    // and provided to every subsequent read — exactly what a catalog table
    // does. Keyed by length+mtime (ADVICE r17): a testdata table
    // regenerated in place within one JVM gets a fresh inference instead
    // of a stale schema's silent nulls. This caches METADATA only (a
    // StructType), never rows or results; every query still computes from
    // the parquet input.
    val key = {
      val f = new java.io.File(path)
      s"$path#${f.length}#${f.lastModified}"
    }
    val schema = Q.schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }
  }

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  /**
   * Exact-integer view of a monetary/double aggregate: `round(x*100)` as
   * BIGINT. Sum order across partitions differs between engines by ~1e-7
   * absolute at these magnitudes — far below the 0.5 rounding radius — so the
   * resulting integer is engine-independent. DuckDB mirror:
   * `CAST(round(x*100) AS BIGINT)`.
   */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Scale-6 exact-integer view of a unit-magnitude double (similarities…). */
  def micros(c: Column): Column = round(c * 1000000).cast("long")
}
