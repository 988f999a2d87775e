package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Hashed bag-of-words linear classifier — the fastText-style model shape
 * behind modern quality/domain filters (DCLM-class pipelines): each token
 * hashes into a fixed-width bucket space, the model is one weight per
 * bucket, a document's score is the weight sum over its token instances
 * plus a bias, and the verdict is a threshold on the score.
 *
 * Scoring is the data-plane operator — one projection, no shuffle,
 * O(tokens) per document, embarrassingly parallel at any corpus size.
 * Training happens offline; here the weight table is derived
 * deterministically from the bucket index by an integer mix, a stand-in
 * that keeps the whole path engine-reproducible. The operator contract is
 * the HASH → WEIGHT → SUM pipeline; swapping in trained weights is a
 * `typedLit` map or broadcast join with the identical plan shape.
 *
 * Everything is exact 64-bit integer arithmetic — no floats — so scores
 * are bit-identical across engines (the DuckDB oracle re-derives them).
 */
object Classifier {

  /** Bucket space size: the md5 16-bit prefix domain (same cross-engine
    * hash family as [[Sampling.bucket]] — reproducible in plain SQL). */
  val Buckets = 65536

  /** Token bucket in [0, Buckets): first four hex nibbles of md5(token). */
  def tokenBucket(tok: Column): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("long")

  /** Deterministic stand-in weight for a bucket, in [-32, 31]: a
    * Knuth-style multiplicative mix, then a signed 6-bit slice. The
    * product is bounded by 65535 * 2654435761 ~ 1.7e14 — no overflow. */
  def bucketWeight(b: Column): Column =
    pmod(b * lit(2654435761L) + lit(104729L), lit(64L)) - lit(32L)

  /** Document score over an ALREADY-MATERIALIZED token array: the sum of
    * bucket weights over token INSTANCES (a repeated token votes every
    * time, as in a true bag-of-words), plus `bias`. */
  def score(tokens: Column, bias: Long = 0L): Column =
    aggregate(tokens, lit(bias),
      (acc, t) => acc + bucketWeight(tokenBucket(t)))

  /** The filter verdict: keep documents scoring at or above `threshold`.
    * With the stand-in weights the expected per-token weight is -0.5, so
    * threshold 0 keeps roughly the upper half — a realistic operating
    * point for a quality gate. */
  def keep(score: Column, threshold: Long = 0L): Column = score >= threshold
}
