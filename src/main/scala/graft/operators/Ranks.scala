package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed exact global ranking — the scale-correct replacement for
 * `row_number()/ntile(n) OVER (ORDER BY ...)` with no PARTITION BY, which
 * funnels the ENTIRE dataset through one task (Spark logs it as
 * "WindowExec: No Partition Defined"; at 100 TB that task never finishes).
 *
 * Shape: `repartitionByRange` on the sort key (a range shuffle — each
 * partition holds a contiguous key range), rank WITHIN each partition (a
 * windowed sort bounded by partition size), then add the number of rows in
 * all lower ranges — a per-partition count aggregate (≤ numPartitions rows)
 * turned into cumulative offsets with a triangular self-join and broadcast
 * back. Total cost: one range shuffle + one tiny aggregate; every stage is
 * parallel in the number of partitions.
 *
 * Determinism: the range-shuffled relation feeds TWO plan branches (the
 * per-partition counts and the ranked join), and correct offsets require
 * both to observe the SAME range boundaries. `RangePartitioner` seeds its
 * boundary sample from the RDD id, so two independent instantiations of
 * the exchange could sample different boundaries — exchange reuse happens
 * to dedup them today, but that is optimizer behavior
 * (`spark.sql.exchange.reuse`), not a contract. The shuffle is therefore
 * materialized ONCE via an eager local checkpoint (the same pattern the
 * producer uses for its nondeterministic partition assignment): boundaries
 * and partition ids become a fact about stored blocks, not about planning.
 * Within each frozen partition, rows with EQUAL sort keys always share a
 * partition (assignment is a binary search on the key), so ties never
 * straddle an offset boundary; ranks over a non-unique ordering are a
 * permutation within each tie group (exactly like the window function).
 * Trade at scale: checkpoint blocks live on executor local storage for the
 * lifetime of the returned plan (freed when the DataFrame is GC'd) and an
 * executor loss invalidates them — the price of exact global ranks without
 * a single-task sort.
 */
object Ranks {

  /**
   * Adds `rankCol` = exact 1-based global rank under `sortCols` (ascending,
   * nulls first — `row_number() OVER (ORDER BY sortCols)` semantics; pass
   * explicit `.desc`/`.asc_nulls_last` columns for other orders).
   */
  def withGlobalRank(df: DataFrame, rankCol: String, sortCols: Seq[Column],
                     numPartitions: Int = 0): DataFrame =
    rankedCore(df, rankCol, sortCols, numPartitions).drop("__total")

  /**
   * Adds `tileCol` = exact `ntile(tiles)` under `sortCols` (LongType):
   * the first `N % tiles` tiles get `N/tiles + 1` rows, the rest `N/tiles`
   * — the SQL-standard sizing, bit-identical to the window function at any
   * parallelism.
   */
  def withNtile(df: DataFrame, tileCol: String, tiles: Int,
                sortCols: Seq[Column], numPartitions: Int = 0): DataFrame = {
    require(tiles > 0, s"tiles must be positive: $tiles")
    // tile sizes: q = N DIV tiles (+1 for the first rem = N % tiles tiles);
    // rank r maps by integer arithmetic only — no doubles at any N.
    // GREATEST(q,1): when N < tiles, q = 0 and the ELSE branch is
    // unreachable (every rank ≤ rem), but CaseWhen still type-checks it.
    rankedCore(df, "__grk", sortCols, numPartitions)
      .withColumn(tileCol, expr(
        s"""CASE WHEN __grk <= (__total % $tiles) * ((__total DIV $tiles) + 1)
           |     THEN (__grk + (__total DIV $tiles)) DIV ((__total DIV $tiles) + 1)
           |     ELSE (__total % $tiles)
           |          + (__grk - (__total % $tiles) * ((__total DIV $tiles) + 1)
           |             + GREATEST(__total DIV $tiles, 1) - 1)
           |            DIV GREATEST(__total DIV $tiles, 1)
           |END""".stripMargin))
      .drop("__grk", "__total")
  }

  /**
   * Adds `cumCol` = exact INCLUSIVE running total of `weight` under
   * `sortCols` — `sum(weight) OVER (ORDER BY ... ROWS UNBOUNDED
   * PRECEDING)` semantics without the single-task global window. Same
   * checkpoint-frozen range shuffle as [[withGlobalRank]]; the offsets
   * are per-partition WEIGHT sums instead of row counts (the distributed
   * prefix-sum). `weight` must be non-null (a null would poison every
   * later running total — pre-coalesce if the source can hold nulls);
   * it is materialized into the checkpoint so both plan branches observe
   * identical values.
   */
  def withRunningTotal(df: DataFrame, cumCol: String, weight: Column,
                       sortCols: Seq[Column], numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parts = df.withColumn("__w", weight)
      .repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.Checkpoints.local(_))
    val sums = parts.groupBy(col("__pid")).agg(sum(col("__w")).as("__psum"))
    val offs = sums.as("a")
      .join(sums.as("b"), col("b.__pid") <= col("a.__pid"))
      .groupBy(col("a.__pid").as("__pid"))
      .agg((sum(col("b.__psum")) - first(col("a.__psum"))).as("__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.withColumn("__lc", sum(col("__w")).over(w))
      .join(broadcast(offs), "__pid")
      .withColumn(cumCol, col("__lc") + col("__off"))
      .drop("__pid", "__lr", "__lc", "__off", "__w")
  }

  /** Rank + `__total` (row count, for ntile sizing) in one pass: the count
    * rides the same per-partition aggregate as the offsets — no second scan
    * of `df` and no driver-side scalar. */
  private def rankedCore(df: DataFrame, rankCol: String, sortCols: Seq[Column],
                         numPartitions: Int): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint (eager): pin boundaries + partition ids before the
    // plan forks — see the determinism note in the class doc
    val parts = df.repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(graft.Checkpoints.local(_))
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    // cumulative offset per pid via a triangular self-join of the ≤ n-row
    // count relation — NOT a global window (that would re-introduce the
    // single-partition WindowExec this operator exists to remove)
    val offs = counts.as("a")
      .join(counts.as("b"), col("b.__pid") <= col("a.__pid"))
      .groupBy(col("a.__pid").as("__pid"))
      .agg((sum(col("b.__cnt")) - first(col("a.__cnt"))).as("__off"))
    val totals = counts.agg(sum(col("__cnt")).as("__total"))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    parts.withColumn("__lr", row_number().over(w))
      .join(broadcast(offs), "__pid")
      .crossJoin(broadcast(totals))
      .withColumn(rankCol, col("__lr") + col("__off"))
      .drop("__pid", "__lr", "__off")
  }
}
