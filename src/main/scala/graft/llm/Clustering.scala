package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding-space clustering — corpus organization / diversity sampling for
 * training-data pipelines (cluster the corpus, then sample per cluster), and
 * the coarse quantizer behind IVF similarity search.
 *
 * K-means with deterministic seeding (the k lowest-id points) so runs are
 * reproducible across engines and restarts — no RNG anywhere.
 *
 * Scale shape (100 TB): assignment is a broadcast of the k centroids against
 * the point table, reduced by a map-side-combined `min(struct(dist, cid))`
 * aggregation — the n·k scored rows collapse to one row per point BEFORE the
 * exchange, so shuffle volume is ~n rows (not n·k, as a ranking window would
 * force). The centroid update explodes by dimension into a (cid, pos)
 * aggregate whose partial combine leaves O(partitions · k · dims) rows on
 * the wire. Assignment carries the vector through, so Lloyd never re-joins
 * the corpus. Rounds are `localCheckpoint`ed to keep plan depth constant.
 */
object Clustering {

  /** Assignment with the point vector carried through (fuels [[lloyd]]'s
    * centroid update without a second corpus shuffle). */
  private def assignCarry(points: DataFrame, centroids: DataFrame): DataFrame = {
    val d2 = Similarity.dot(col("vec"), col("vec")) +
      Similarity.dot(col("cvec"), col("cvec")) -
      lit(2.0) * Similarity.dot(col("vec"), col("cvec"))
    points.crossJoin(broadcast(centroids))
      .select(col("id"), col("vec"),
        struct(round(d2 * 1000000).cast("long").as("d2_micro"),
          col("cid").as("cluster")).as("cand"))
      .groupBy(col("id"))
      .agg(min(col("cand")).as("best"), first(col("vec")).as("vec"))
      .select(col("id"), col("best.cluster").as("cluster"),
        col("best.d2_micro").as("d2_micro"), col("vec"))
  }

  /**
   * Nearest centroid per point by squared L2 distance, deterministic:
   * distances are compared at 1e-6 resolution with ties broken by centroid
   * id (lexicographic `min` over a (d2, cid) struct), so the assignment is
   * reproducible bit-for-bit across engines (the distance itself is a
   * sequential fold — see [[Similarity.dot]]).
   *
   * @param points    (id, vec)
   * @param centroids (cid, cvec) — small; broadcast
   * @return (id, cluster, d2_micro)
   */
  def assignNearest(points: DataFrame, centroids: DataFrame): DataFrame =
    assignCarry(points, centroids).drop("vec")

  /**
   * Lloyd's algorithm for `iters` rounds from the deterministic seed.
   * Returns the final assignment (id, cluster, d2_micro). Clusters that
   * lose all points keep their previous centroid (never vanish), matching
   * the usual "empty cluster keeps centroid" convention.
   */
  def lloyd(points: DataFrame, k: Int, iters: Int): DataFrame =
    lloydFull(points, k, iters)._1.drop("vec")

  /** [[lloyd]] exposing the final CENTROIDS too — `(cid, cvec)`, the
    * coarse-quantizer output an IVF rebuild consumes
    * ([[Similarity.maintainIndex]]). */
  def lloydCentroids(points: DataFrame, k: Int, iters: Int): DataFrame =
    lloydFull(points, k, iters)._2

  private def lloydFull(points: DataFrame, k: Int,
                        iters: Int): (DataFrame, DataFrame) = {
    var centroids = points.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("vec").cast("array<double>").as("cvec"))
      .transform(graft.Checkpoints.local(_))
    var assigned = assignCarry(points, centroids)
    for (_ <- 1 to iters) {
      val means = assigned
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
        .transform(graft.Checkpoints.local(_))
      assigned = assignCarry(points, centroids)
    }
    (assigned, centroids)
  }
}
