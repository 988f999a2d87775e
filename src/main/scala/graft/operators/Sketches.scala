package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as plain
 * DataFrame aggregation — approximate frequency estimation whose memory is
 * O(d·w) regardless of key cardinality. The companion to the HLL distinct
 * sketch (`q_agg_approx_distinct`): HLL answers "how many distinct", this
 * answers "how often does key x occur" without materializing the full
 * per-key count table.
 *
 * Scale shape (100 TB): building the sketch is one explode (d rows per
 * item) into a groupBy((row, bucket)) whose map-side combine caps every
 * partition's output at d·w rows — the shuffle is O(partitions · d · w),
 * independent of item count or key cardinality; the sketch itself (≤ d·w
 * rows) broadcasts anywhere. No driver-side state, no UDAF buffers.
 *
 * Guarantees (hash independence assumed): estimates never undercount;
 * P[overcount > k·N/w] ≤ (1/k)^d for the min over d independent rows
 * (Markov per row), so with d=5, k=10 a query overshoots its bound with
 * probability ~1e-5.
 */
object Sketches {

  /** Per-(row, key) bucket: xxhash64 over (key, row-index) mod w. */
  private def buckets(key: org.apache.spark.sql.Column, w: Int, d: Int) =
    array((0 until d).map { r =>
      struct(lit(r).as("r"), pmod(xxhash64(key, lit(r)), lit(w)).as("b"))
    }: _*)

  /** Build the d×w sketch: rows (r, b, cnt), absent cells = 0. */
  def countMin(items: DataFrame, keyCol: String, w: Int, d: Int): DataFrame = {
    require(w > 0 && d > 0, s"invalid sketch shape w=$w d=$d")
    items.select(explode(buckets(col(keyCol), w, d)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the same (w, d): cell-wise counter sum.
    * This linearity is what makes count-min fit partitioned and streaming
    * pipelines — shards sketch independently, the union merges exactly
    * (merged estimates equal the single-pass sketch's, cell for cell).
    * Columns are matched by NAME (a reordered projection cannot silently
    * misalign r/b/cnt). The (w, d) shape itself is not carried by the
    * DataFrame and CANNOT be validated here — merging sketches built with
    * different shapes silently produces garbage that may undercount; the
    * caller owns that invariant. */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    require(a.columns.sorted.sameElements(Array("b", "cnt", "r")) &&
      b.columns.sorted.sameElements(Array("b", "cnt", "r")),
      s"not count-min sketches: ${a.columns.mkString(",")} / ${b.columns.mkString(",")}")
    a.unionByName(b).groupBy(col("r"), col("b")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-query the sketch for each key in `keys`: est = min over the d
    * rows of the addressed cell (0 when a cell was never touched). */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
               w: Int, d: Int): DataFrame =
    keys.select(col(keyCol), explode(buckets(col(keyCol), w, d)).as("rb"))
      .select(col(keyCol), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
