package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding-space clustering — corpus organization / diversity sampling for
 * training-data pipelines (cluster the corpus, then sample per cluster), and
 * the coarse quantizer behind IVF similarity search.
 *
 * K-means with deterministic seeding (the k lowest-id points) so runs are
 * reproducible across engines and restarts — no RNG anywhere.
 *
 * Scale shape (100 TB): each Lloyd round is one broadcast of the k centroids
 * against the (never-shuffled) point table for assignment, then one
 * explode-by-dimension aggregate for the new means — shuffle volume is
 * O(k · dims), independent of corpus size. Rounds are `localCheckpoint`ed to
 * keep the plan depth constant across iterations.
 */
object Clustering {

  /**
   * Nearest centroid per point by squared L2 distance, deterministic:
   * distances are compared at 1e-6 resolution with ties broken by centroid
   * id, so the assignment is reproducible bit-for-bit across engines (the
   * distance itself is a sequential fold — see [[Similarity.dot]]).
   *
   * @param points    (id, vec)
   * @param centroids (cid, cvec) — small; broadcast
   * @return (id, cluster, d2_micro)
   */
  def assignNearest(points: DataFrame, centroids: DataFrame): DataFrame = {
    val d2 = Similarity.dot(col("vec"), col("vec")) +
      Similarity.dot(col("cvec"), col("cvec")) -
      lit(2.0) * Similarity.dot(col("vec"), col("cvec"))
    val scored = points.crossJoin(broadcast(centroids))
      .select(col("id"), col("cid"), round(d2 * 1000000).cast("long").as("d2_micro"))
    val w = Window.partitionBy(col("id")).orderBy(col("d2_micro"), col("cid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("id"), col("cid").as("cluster"), col("d2_micro"))
  }

  /**
   * Lloyd's algorithm for `iters` rounds from the deterministic seed.
   * Returns the final assignment (id, cluster, d2_micro). Clusters that
   * lose all points keep their previous centroid (never vanish), matching
   * the usual "empty cluster keeps centroid" convention.
   */
  def lloyd(points: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = points.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("vec").cast("array<double>").as("cvec"))
      .localCheckpoint(true)
    var assigned = assignNearest(points, centroids)
    for (_ <- 1 to iters) {
      val means = points.join(assigned, "id")
        .select(col("cluster").as("cid"), posexplode(col("vec").cast("array<double>")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("v"))
        .groupBy(col("cid"))
        .agg(collect_list(struct(col("pos"), col("v"))).as("pv"))
        .select(col("cid"),
          expr("transform(array_sort(pv), p -> p.v)").as("cvec"))
      // empty clusters keep their previous centroid
      centroids = centroids.as("old")
        .join(means.as("new"), Seq("cid"), "left")
        .select(col("cid"), coalesce(col("new.cvec"), col("old.cvec")).as("cvec"))
        .localCheckpoint(true)
      assigned = assignNearest(points, centroids)
    }
    assigned
  }
}
