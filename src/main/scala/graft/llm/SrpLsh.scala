package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Signed-random-projection LSH (SRP / random-hyperplane hashing, Charikar
 * 2002) over embedding columns — the COSINE-family LSH that complements
 * the engine's other candidate generators (MinHash bands: Jaccard on
 * token sets; SimHash: cosine on term frequencies; IVF cells: learned
 * partition). Each vector gets an `nbits`-bit signature — bit h is the
 * sign of the dot product with pseudo-random hyperplane h — and the
 * signature is cut into bands: vectors sharing ANY band become candidate
 * pairs, then candidates are verified with the exact cosine. P(bit match)
 * = 1 - angle/pi, so banding tunes the usual recall/cost trade.
 *
 * Engine-reproducibility: hyperplane components are integers derived from
 * (h, j) by a multiplicative mix, and vectors are quantized to exact
 * integer micros before projection — every signature is pure 64-bit
 * integer arithmetic, bit-identical in any engine (the DuckDB oracle
 * re-derives signatures, bands, candidates, and verdicts from scratch).
 *
 * Scale shape (100 TB): signatures are a pure projection; candidate
 * generation is a bucketed equality join on (band index, band value) —
 * never all-pairs — through [[Dedup.bandCandidates]], which also applies
 * the oversized-bucket star guard (a degenerate corpus cannot produce an
 * O(k²) bucket self-join); only candidate pairs pay an exact dot product.
 * Band width must grow with corpus size: 8 bits per band gives 256 bucket
 * values per band, the production default (the old 16/4 demo shape made
 * 16-value bands whose candidate volume degenerated toward quadratic).
 */
object SrpLsh {

  /** Integer hyperplane component for (hyperplane h, 1-based dim j), in
    * [-500, 500]: a Knuth-style mix of the flat index. Bounded operands:
    * (h*dims + j) stays tiny, the product ~1e13 — no overflow. */
  private def weight(h: Column, j: Column, dims: Int): Column =
    pmod((h.cast("long") * lit(dims.toLong) + j.cast("long")) * lit(2654435761L)
      + lit(104729L), lit(1001L)) - lit(500L)

  /** Exact integer view of a float vector: per-component `round(x * 1e6)`
    * (float→double widening is exact, so this reproduces anywhere). */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000000).cast("long"))

  /** `nbits`-bit SRP signature of an ALREADY-MATERIALIZED quantized
    * vector column (see [[TextFunctions.shinglesFromTokens]]'s HOF note —
    * materialize [[quantize]] first so element access is O(1)). Bit h
    * (h=0 is the most significant) is `sign(sum_j q[j] * w(h, j)) >= 0`.
    * |sum| <= dims * 1e6 * 500 ~ 3e10 — integer-exact. Packing limit:
    * nbits <= 63 (use [[bandValues]] for wider signatures — it never
    * packs more than one band into a long, so it has no width limit and
    * its arithmetic cannot overflow engines with CHECKED 64-bit ints,
    * e.g. the DuckDB oracle). */
  def signature(qvec: Column, nbits: Int, dims: Int): Column = {
    require(nbits <= 63, s"signature packs into one signed long; nbits=$nbits")
    val bits = transform(sequence(lit(0), lit(nbits - 1)), h => {
      val s = aggregate(sequence(lit(1), lit(dims)), lit(0L),
        (acc, j) => acc + element_at(qvec, j) * weight(h, j, dims))
      when(s >= 0L, lit(1L)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc * lit(2L) + b)
  }

  /** Per-band SRP values, computed WITHOUT packing a full-width signature:
    * band i (of `bands`) covers hyperplanes [i*bpb, (i+1)*bpb) and packs
    * only its own bpb bits (first hyperplane = most significant), so every
    * value stays < 2^bpb no matter how wide the total signature — 64, 128,
    * 256 bits all cost the same bounded integer arithmetic in any engine.
    *
    * Evaluates through the native fused-loop expression
    * [[graft.functions.SrpBandValues]] (whole-stage codegen); the HOF
    * formulation it is spec-locked against lives in [[bandValuesHof]].
    * The hyperplane mix is parameterized by the vector length, which the
    * native expression derives from the array itself — so there is no
    * `dims` argument to get wrong (the HOF spec takes one and must be
    * passed the true length). */
  def bandValues(qvec: Column, nbits: Int, bands: Int): Column =
    org.apache.spark.sql.graftshim.Shims.column(
      graft.functions.SrpBandValues(
        org.apache.spark.sql.graftshim.Shims.expression(qvec), nbits, bands))

  /** Reference HOF formulation of [[bandValues]] — interpreted (a
    * CodegenFallback lambda chain, ~100× slower), kept as the executable
    * spec the native expression is locked against in LlmSpec. */
  private[llm] def bandValuesHof(qvec: Column, nbits: Int, bands: Int,
                                 dims: Int): Column = {
    require(nbits % bands == 0, s"bands must divide nbits: $nbits/$bands")
    val bpb = nbits / bands
    array((0 until bands).map { i =>
      val bits = transform(sequence(lit(i * bpb), lit((i + 1) * bpb - 1)), h => {
        val s = aggregate(sequence(lit(1), lit(dims)), lit(0L),
          (acc, j) => acc + element_at(qvec, j) * weight(h, j, dims))
        when(s >= 0L, lit(1L)).otherwise(lit(0L))
      })
      aggregate(bits, lit(0L), (acc, b) => acc * lit(2L) + b)
    }: _*)
  }

  /**
   * SRP near-duplicate pairs: band-bucketed candidate generation (with the
   * shared oversized-bucket star guard, [[Dedup.bandCandidates]]) + exact
   * cosine verification. Input needs (`id`, `vec`) columns; emits
   * (vec_a, vec_b, cos_micro) with vec_a < vec_b, cos >= thresholdMicro.
   *
   * Defaults are the production shape: 64 hyperplanes in 8 bands of 8 bits
   * — 256 bucket values per band keep candidate volume near-linear while
   * P(candidate | cos=0.90) = 1-(1-(1-0.144)^8)^8 ≈ 0.93. Buckets larger
   * than `maxBucket` degrade to star candidates (member × representative),
   * so a degenerate corpus (mass-identical vectors) costs O(k), not O(k²).
   *
   * Scale shape: the candidate join and its dedup shuffle carry ID PAIRS
   * only (16 bytes a row); vectors re-attach through two bucketed joins
   * against the signed base afterward — at production dims a vector-
   * carrying dedup would move ~30× the bytes through the shuffle for the
   * same pair set.
   *
   * @param cache persist the (id, vec, norm, bands) base — it feeds the
   *        banding AND both verification joins. Caller-owned lifetime:
   *        release it with [[srpPairsReleasable]]'s handle (preferred —
   *        it frees only this call's persist), or pass false.
   */
  def srpPairs(vectors: DataFrame, nbits: Int = 64,
               bands: Int = 8, thresholdMicro: Long = 900000L,
               maxBucket: Int = 4096, cache: Boolean = true): DataFrame =
    srpPairsReleasable(vectors, nbits, bands, thresholdMicro, maxBucket,
      cache)._1

  /** [[srpPairs]] plus a release handle that unpersists THIS call's cached
    * base (a no-op when `cache=false`) — so sweep-style callers can free
    * the MEMORY_AND_DISK plan after the pairs materialize without the
    * collateral eviction of a global `spark.catalog.clearCache()`. */
  def srpPairsReleasable(vectors: DataFrame, nbits: Int = 64,
               bands: Int = 8, thresholdMicro: Long = 900000L,
               maxBucket: Int = 4096, cache: Boolean = true)
      : (DataFrame, () => Unit) = {
    val base0 = vectors
      .select(col("id"), col("vec"))
      .withColumn("qvec", quantize(col("vec")))
      .withColumn("bvals", bandValues(col("qvec"), nbits, bands))
      .withColumn("vn", Similarity.norm(col("vec")))
      .select(col("id"), col("vec"), col("vn"), col("bvals"))
    val base = if (cache)
      base0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else base0
    val banded = base.select(col("id"),
      posexplode(col("bvals")).as(Seq("band", "bandval")))
    // bandCandidates dedups multi-band pairs and star-guards skewed buckets
    val cand = Dedup.bandCandidates(banded, maxBucket, extra = Nil)
    val pairs = cand
      .join(base.select(col("id").as("doc_a"), col("vec").as("va"), col("vn").as("na")), "doc_a")
      .join(base.select(col("id").as("doc_b"), col("vec").as("vb"), col("vn").as("nb")), "doc_b")
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"),
        round(Similarity.dot(col("va"), col("vb"))
          / (col("na") * col("nb")) * 1000000).cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= thresholdMicro)
    (pairs, () => if (cache) { base.unpersist(false); () })
  }
}
