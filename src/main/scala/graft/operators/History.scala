package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension history build — the companion to [[Merge]]:
 * where `applyChangelog` keeps only the latest version per key, `scd2`
 * keeps EVERY version and assigns each a validity interval
 * `[valid_from, valid_to)` (Type-2 dimension in warehouse terms), so a
 * fact row can be joined to the attribute values that were current at its
 * timestamp.
 *
 * Scale shape (100 TB): ONE shuffle keyed by the dimension key (the lead()
 * window); no join, no collect. Version history per key is naturally
 * bounded (it is the change rate of one entity), so the per-key window run
 * never concentrates a corpus-sized partition.
 */
object History {

  /**
   * Build Type-2 validity intervals from a keyed, versioned changelog.
   *
   *  - `changes`: key columns + payload + `versionCol` (a long; the change
   *    order — commit timestamp, LSN, …). (key, version) pairs must be
   *    unique, as in [[Merge.applyChangelog]].
   *
   * Output = input columns plus `valid_from` (= version), `valid_to` (the
   * next version for the key, null for the newest) and `is_current`.
   * Intervals are half-open and seamless: a key's intervals tile
   * `[first_version, ∞)` with no gaps or overlaps by construction.
   */
  def scd2(changes: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
