package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for pretraining data prep: documents are concatenated
 * (in a deterministic order) into a token stream that is cut into
 * fixed-budget bins; each document is assigned the bin its FIRST token
 * lands in. Downstream, one bin = one training sequence's worth of
 * documents.
 *
 * Scale shape: the running token offset is a window cumulative sum
 * PARTITIONED BY a shard column — each shard packs independently and in
 * parallel; a single global ordering would funnel 100 TB through one window
 * task. Shard by whatever the training job shards by (file, domain, hash
 * of id); determinism holds per shard.
 */
object Packing {

  /**
   * Assign each row a `bin` (0-based) within its shard: documents ordered
   * by `idCol`, `bin = floor(tokensBefore / maxTokens)` where tokensBefore
   * is the running sum of `tokens` over preceding rows in the shard.
   * Adds `bin` and `start_offset` columns; one shuffle (by shard).
   */
  def packBins(df: DataFrame, shardCol: String, idCol: String,
               tokens: Column, maxTokens: Long): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val start = coalesce(sum(tokens).over(w), lit(0L))
    df.withColumn("start_offset", start)
      .withColumn("bin", floor(col("start_offset") / maxTokens).cast("long"))
  }
}
