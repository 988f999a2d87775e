package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`array<float>`).
 *
 * Two paths:
 *  - [[bruteForceTopK]]: exact cosine top-k with the (small) query set
 *    broadcast against the candidate corpus — the correct baseline shape at
 *    any scale where |queries| ≪ |corpus| (the corpus is never shuffled,
 *    only scanned);
 *  - [[ivfTopK]]: IVF-style approximate search — candidates are bucketed by
 *    nearest coarse centroid and only `nprobe` cells are scanned per query.
 *    At 100 TB the cell assignment is the partition key; a query touches a
 *    bounded fraction of the corpus.
 *
 * Dot products run in DOUBLE via a sequential fold (`aggregate`), making the
 * arithmetic bit-reproducible across engines (same left-to-right order).
 */
object Similarity {

  /** Sequential-fold dot product of two float-array columns, in double —
    * a native codegen expression (see [[graft.functions.DotProduct]]); the
    * summation order is identical to an `aggregate(zip_with(...))` fold
    * (and mismatched lengths yield null, exactly like the zip_with null
    * padding), so results are bit-identical — just without the interpreted
    * lambda chain. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot(a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine scaled to exact integers (1e6) for engine-independent compares. */
  def cosineMicro(a: Column, b: Column): Column =
    round(cosine(a, b) * 1000000).cast("long")

  /**
   * Exact top-k: for each query vector, the k nearest candidates by cosine
   * (ties broken by candidate id). `queries` is broadcast — the corpus side
   * stays in place.
   */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = candidates.as("c").join(broadcast(queries.as("q")))
      .select(col("q.id").as("query_id"), col("c.id").as("cand_id"),
        cosineMicro(col("q.vec"), col("c.vec")).as("cos_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_micro").desc, col("cand_id"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cos_micro"))
  }

  /**
   * IVF-style approximate top-k: assign every corpus vector to its nearest
   * coarse centroid (broadcast), then for each query scan only the `nprobe`
   * closest cells.
   *
   * Deterministic end to end: cell assignment and probe order tie-break on
   * centroid id, result ranking on candidate id — so the (approximate)
   * result is reproducible in any engine, and checkable against an oracle.
   */
  /** Assign each vector to its `n` nearest coarse centroids (ties toward
    * the smaller centroid id) — the IVF coarse quantizer. */
  def nearestCells(df: DataFrame, centroids: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCell = df.as("v").join(broadcast(centroids.as("ctr")))
      .select(col("v.id").as("id"), col("v.vec").as("vec"),
        col("ctr.id").as("cell"),
        cosineMicro(col("v.vec"), col("ctr.vec")).as("cc"))
    val w = Window.partitionBy(col("id")).orderBy(col("cc").desc, col("cell"))
    byCell.withColumn("cr", row_number().over(w)).filter(col("cr") <= n)
      .select(col("id"), col("vec"), col("cell"))
  }

  /**
   * Embedding-cosine near-duplicate pairs, cell-blocked: vectors pair up
   * only within their IVF cell (bucketed self-join — no cross join), then
   * the exact cosine threshold filters. Approximate by construction
   * (cross-cell near-dups are unseen — same recall shape as any blocked
   * dedup), fully deterministic, oracle-reproducible.
   */
  def cellBlockedNearDuplicates(vectors: DataFrame, centroids: DataFrame,
                                thresholdMicro: Long): DataFrame = {
    val cells = nearestCells(vectors, centroids, 1)
    cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        cosineMicro(col("a.vec"), col("b.vec")).as("cos_micro"))
      .filter(col("cos_micro") >= thresholdMicro)
  }

  def ivfTopK(queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val assigned = nearestCells(candidates, centroids, 1) // corpus: 1 cell each
    val probed = nearestCells(queries, centroids, nprobe) // query: nprobe cells

    // no dedup needed: each candidate lives in exactly ONE cell (n=1), so a
    // (query, candidate) pair can appear through at most one probed cell
    val scored = probed.as("p").join(assigned.as("a"), col("p.cell") === col("a.cell"))
      .select(col("p.id").as("query_id"), col("a.id").as("cand_id"),
        cosineMicro(col("p.vec"), col("a.vec")).as("cos_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_micro").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cos_micro"))
  }
}
