package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) for embedding columns — the memory-compressed
 * ANN tier: each `dims`-dim vector becomes `m` small codes (one per
 * contiguous subspace), and queries scan codes via an asymmetric distance
 * table (ADC) instead of touching raw vectors. At 100 TB this is the
 * difference between shipping 256 bytes and 8 bytes per candidate into the
 * scoring join.
 *
 * Codebooks are seeded deterministically (the subvectors of the `ksub`
 * lowest-id training vectors, code = id rank — the same no-RNG convention
 * as [[Clustering.lloyd]]), so encoding, ADC scores, and rankings are
 * engine-reproducible and oracle-checkable end to end. Squared distances
 * use the dot-product identity (‖a‖² + ‖b‖² − 2a·b) over the bit-exact
 * sequential-fold [[Similarity.dot]] and are published as 1e6 integers;
 * a candidate's ADC score is a SUM OF INTEGERS — no cross-engine drift.
 *
 * Scale shapes: encoding is a broadcast of m·ksub codewords against the
 * exploded (id, sub) relation, collapsed by a hash-aggregable packed-long
 * argmin BEFORE any exchange (the [[Similarity.nearestCells]] shape); the
 * ADC scan joins candidate codes to the (tiny, broadcast) per-query
 * distance table on (sub, code) — equality joins only, no cross join, raw
 * vectors never enter the scan.
 */
object Quantization {

  /** Packed argmin bound: distances are clamped into 43 bits, codes into 20
    * (ksub ≤ 2^20 documented). */
  private val CodeBits = 20

  private def subCol(vec: org.apache.spark.sql.Column, sub: Int, subDim: Int) =
    slice(vec, sub * subDim + 1, subDim)

  /** d²·1e6 between two equal-length vectors, via the dot identity —
    * bit-identical to the oracle's list_sum folds. */
  private def d2Micro(a: org.apache.spark.sql.Column,
                      b: org.apache.spark.sql.Column) =
    round((Similarity.dot(a, a) + Similarity.dot(b, b) -
      lit(2.0) * Similarity.dot(a, b)) * 1000000).cast("long")

  /**
   * Per-subspace codebooks from `train`: (sub, code, cvec) with
   * code ∈ [0, ksub) = rank of the seed vector by ascending id.
   */
  def codebooks(train: DataFrame, dims: Int, m: Int, ksub: Int): DataFrame = {
    require(dims % m == 0, s"dims must divide into m subspaces: $dims/$m")
    val subDim = dims / m
    // code = rank of the seed by ascending id, via the distributed ranker —
    // the relation is only ksub rows, but row_number() over a global window
    // would still plan the single-partition WindowExec this library bans
    val seeds = graft.operators.Ranks.withGlobalRank(
        train.orderBy(col("id")).limit(ksub), "__rk", Seq(col("id")))
      .withColumn("code", (col("__rk") - 1).cast("long")).drop("__rk")
    seeds.select(col("code"), posexplode(array(
        (0 until m).map(s => subCol(col("vec"), s, subDim)): _*)))
      .toDF("code", "sub", "cvec")
  }

  /**
   * Encode each vector of `df` (id, vec): one row per (id, sub) with the
   * nearest codeword's code (ties toward the smaller code).
   */
  def encode(df: DataFrame, cb: DataFrame, dims: Int, m: Int): DataFrame = {
    val subDim = dims / m
    val subs = df.select(col("id"), posexplode(array(
        (0 until m).map(s => subCol(col("vec"), s, subDim)): _*)))
      .toDF("id", "sub", "svec")
    val d2 = d2Micro(col("svec"), col("cvec"))
    // packed-long argmin (hash-aggregable, map-side combined): distance in
    // the high bits (clamped — clamping cannot reorder, only saturate far
    // outliers equal), code in the low 20
    val packed = least(d2, lit((1L << 42) - 1)) * lit(1L << CodeBits) + col("code")
    subs.join(broadcast(cb), Seq("sub"))
      .select(col("id"), col("sub"), packed.as("pk"))
      .groupBy(col("id"), col("sub"))
      .agg(min(col("pk")).as("pk"))
      .select(col("id"), col("sub"),
        pmod(col("pk"), lit(1L << CodeBits)).as("code"))
  }

  /**
   * ADC top-k: for each query, the k candidates with the smallest summed
   * per-subspace distance to the query's subvectors (ties by candidate id).
   *
   * @param codes encoded candidates from [[encode]]
   * @return (query_id, rank, cand_id, adc_micro)
   */
  def adcTopK(queries: DataFrame, codes: DataFrame, cb: DataFrame,
              dims: Int, m: Int, k: Int): DataFrame = {
    val subDim = dims / m
    val qsubs = queries.select(col("id").as("query_id"), posexplode(array(
        (0 until m).map(s => subCol(col("vec"), s, subDim)): _*)))
      .toDF("query_id", "sub", "qsvec")
    // per-query distance table: |queries| · m · ksub rows — tiny; broadcast
    val table = qsubs.join(broadcast(cb), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        d2Micro(col("qsvec"), col("cvec")).as("d2"))
    val scored = codes.join(broadcast(table), Seq("sub", "code"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d2")).as("adc_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_micro"), col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("id").as("cand_id"), col("adc_micro"))
  }
}
