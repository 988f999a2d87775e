package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact interpolated quantiles per group, bit-identical to Spark's
 * `percentile(valCol, p)` but computed with codegen-friendly relational
 * operators (guide §1.2 step 1 — fix the distributed algorithm, and §4 —
 * avoid non-codegen aggregates in the hot path).
 *
 * Why not `percentile`: it is an ImperativeAggregate that buffers a
 * value→count map PER GROUP PER CALL inside an ObjectHashAggregate —
 * every partial buffer is the group's whole value histogram, serialized
 * and merged across the exchange. On a 600 k-row group that is seconds of
 * single-threaded map building (measured: the q_agg_equidepth cuts job,
 * 2.6 s + 1.3 s at sf0.1); at 100 TB a high-cardinality value domain makes
 * the buffer itself a memory hazard. This formulation is three
 * whole-stage-codegen operators instead: an exact (group, value) count
 * (map-side combined — the shuffle carries one row per DISTINCT value,
 * not per input row), a cumulative-count window per group, and one final
 * hash aggregate; memory is bounded per task by the sort, which spills.
 *
 * Exactness contract (matches `Percentile.getPercentile` verbatim):
 * 0-based continuous rank `pos = (N−1)·p`; the rank-k value (0-based) is
 * the first distinct value whose 1-based cumulative count reaches k+1;
 * for fractional `pos` the result is the double
 * `(⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi` — the same IEEE expression tree
 * Spark's Percentile evaluates, so replacing one with the other can never
 * flip a rounded integer downstream. Grouped specs in QuantilesSpec lock
 * the two bit-equal on nulls, ties, singletons and fractional ranks.
 */
object Quantiles {

  /**
   * One row per group: `groupCol`, then one DOUBLE column per `(name, p)`
   * holding the exact interpolated p-quantile of `valCol` (nulls in
   * `valCol` ignored, like `percentile`). `valCol` must be numeric;
   * probabilities in [0, 1].
   */
  def exactGrouped(df: DataFrame, groupCol: String, valCol: String,
                   ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"probabilities must be in [0,1]: $ps")
    val g = col(groupCol)
    val v = col(valCol)
    // percentile ignores nulls; drop them before counting so N matches
    val cnts = df.filter(v.isNotNull)
      .groupBy(g, v).agg(count(lit(1)).as("__qc"))
    val wCum = Window.partitionBy(g).orderBy(v)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g)
    val cum = cnts
      .withColumn("__qcum", sum(col("__qc")).over(wCum))
      .withColumn("__qn", sum(col("__qc")).over(wAll))
    // rank-k lookups as conditional MINs (cum ascending with v): row-level
    // predicates may reference __qn — it is constant within the group
    def pos(n: Column, p: Double): Column = (n - 1).cast("double") * lit(p)
    val lookups: Seq[Column] = ps.flatMap { case (name, p) =>
      val posE = pos(col("__qn"), p)
      Seq(
        min(when(col("__qcum") >= floor(posE).cast("long") + 1, v))
          .as(s"__qlo_$name"),
        min(when(col("__qcum") >= ceil(posE).cast("long") + 1, v))
          .as(s"__qhi_$name"))
    }
    val agged = cum.groupBy(g)
      .agg(max(col("__qn")).as("__qn"), lookups: _*)
    val outs: Seq[Column] = ps.map { case (name, p) =>
      val posE = pos(col("__qn"), p)
      val lo = floor(posE)
      val hi = ceil(posE)
      val vLo = col(s"__qlo_$name").cast("double")
      val vHi = col(s"__qhi_$name").cast("double")
      when(lo === hi, vLo)
        .otherwise((hi - posE) * vLo + (posE - lo) * vHi)
        .as(name)
    }
    agged.select(g +: outs: _*)
  }
}
