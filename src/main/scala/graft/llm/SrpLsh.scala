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
 * never all-pairs; multi-band duplicates are suppressed by a
 * first-shared-band FILTER (no distinct shuffle); only candidate pairs
 * pay an exact dot product. Band width must grow with corpus size
 * (production: 64-256 bits, 8+ bits per band); the demo uses 16/4 so
 * sf-scale corpora produce gradable candidate volumes.
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
    * |sum| <= dims * 1e6 * 500 ~ 3e10 — integer-exact. */
  def signature(qvec: Column, nbits: Int, dims: Int): Column = {
    val bits = transform(sequence(lit(0), lit(nbits - 1)), h => {
      val s = aggregate(sequence(lit(1), lit(dims)), lit(0L),
        (acc, j) => acc + element_at(qvec, j) * weight(h, j, dims))
      when(s >= 0L, lit(1L)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (acc, b) => acc * lit(2L) + b)
  }

  /**
   * SRP near-duplicate pairs: band-bucketed candidate generation + exact
   * cosine verification. Input needs (`id`, `vec`) columns; emits
   * (vec_a, vec_b, cos_micro) with vec_a < vec_b, cos >= thresholdMicro.
   */
  def srpPairs(vectors: DataFrame, dims: Int, nbits: Int = 16,
               bands: Int = 4, thresholdMicro: Long = 900000L): DataFrame = {
    require(nbits % bands == 0, s"bands must divide nbits: $nbits/$bands")
    val bpb = nbits / bands
    val base = vectors
      .select(col("id"), col("vec"))
      .withColumn("qvec", quantize(col("vec")))
      .withColumn("sig", signature(col("qvec"), nbits, dims))
      // band-value array materialized once: band i = bits [i*bpb, (i+1)*bpb)
      .withColumn("bvals", array((0 until bands).map(i =>
        pmod(shiftrightunsigned(col("sig"), i * bpb), lit(1L << bpb))): _*))
      .withColumn("vn", Similarity.norm(col("vec")))
      .select(col("id"), col("vec"), col("vn"), col("bvals"))
    val exploded = base.select(col("id"), col("vec"), col("vn"), col("bvals"),
      posexplode(col("bvals")).as(Seq("band", "bv")))
    val cand = exploded.as("a").join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      // first-shared-band filter: keep the pair only in the LOWEST band the
      // two signatures share, so multi-band matches need no distinct
      // shuffle (slice of length band = all EARLIER bands; empty at band 0)
      .filter(!exists(
        zip_with(slice(col("a.bvals"), lit(1), col("a.band")),
          slice(col("b.bvals"), lit(1), col("b.band")), (x, y) => x === y),
        b => b))
    cand.select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        round(Similarity.dot(col("a.vec"), col("b.vec"))
          / (col("a.vn") * col("b.vn")) * 1000000).cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= thresholdMicro)
  }
}
