package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Engine-wide local-checkpoint policy (guide §5; VERDICT r17 item 7).
 *
 * The engine truncates bounded mid-pipeline frames with `localCheckpoint`
 * (produce staging, graph/cluster iteration rounds, rank boundaries, LSH
 * candidate sets). Truncation is deliberate — for frames embedding
 * non-deterministic expressions (`monotonically_increasing_id` id
 * assignment, `spark_partition_id` boundaries) a RECOMPUTE would silently
 * produce different rows, so the only safe behaviors are "serve the pinned
 * blocks" or "fail loudly"; lineage-based recovery is not an option the
 * semantics allow. The cost is a reliability trade: single-copy blocks
 * live on one executor, so on preemptible clusters one lost executor
 * fails the job.
 *
 * `spark.graft.checkpoint.replicated=true` is the cluster-scale escape:
 * every engine local checkpoint stores its blocks at MEMORY_AND_DISK_2 —
 * two executors hold each block, so a single executor loss serves from
 * the replica instead of failing. The default (false) keeps the local
 * single-copy behavior (replication is a no-op waste on local[*], which
 * has one block manager). Semantics are identical either way: same rows,
 * same truncation, same eager/lazy materialization.
 */
object Checkpoints {

  private def replicated(df: DataFrame): Boolean =
    df.sparkSession.conf
      .getOption("spark.graft.checkpoint.replicated").exists(_.toBoolean)

  /** Storage level the policy selects for `df`'s session. */
  def level(df: DataFrame): StorageLevel =
    if (replicated(df)) StorageLevel.MEMORY_AND_DISK_2
    else StorageLevel.MEMORY_AND_DISK

  /** `df.localCheckpoint(eager)` under the engine's replication policy. */
  def local(df: DataFrame, eager: Boolean = true): DataFrame =
    df.localCheckpoint(eager, level(df))
}
