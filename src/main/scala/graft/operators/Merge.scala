package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC / changelog merge — the lakehouse "MERGE INTO" reduced to its
 * deterministic core: apply a batch of keyed upserts and deletes to a
 * snapshot, latest version wins.
 *
 * Scale shape (100 TB): one union and ONE shuffle keyed by the merge key
 * (the latest-wins window); no join back, no collect. This is the standard
 * compaction shape for applying a day's change stream to a snapshot —
 * partition by key, rank by version, keep the head.
 */
object Merge {

  /**
   * Apply `changes` to `snapshot`, latest `versionCol` per key wins.
   *
   *  - `snapshot`: the current table — key columns + payload.
   *  - `changes`: same columns PLUS `versionCol` (long, > Long.MinValue) and
   *    `opCol` ('U' upsert | 'D' delete). (key, version) pairs must be
   *    unique — the version IS the changelog order; ties would make
   *    latest-wins ill-defined in any engine.
   *
   * A key present only in the snapshot keeps its payload; a key whose
   * newest change is 'U' takes that change's payload (insert if the key is
   * new); a key whose newest change is 'D' disappears.
   *
   * @return the merged table: key + payload columns (marker columns dropped)
   */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], versionCol: String,
                     opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    val snap = snapshot
      .withColumn(versionCol, lit(Long.MinValue))
      .withColumn(opCol, lit("U"))
    val all = snap.unionByName(changes)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn", versionCol, opCol)
  }
}
