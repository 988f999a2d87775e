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
  /** Read one testdata table. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
