package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Join variants beyond Spark's built-ins (§2.7 joins row: range and as-of),
 * composed from existing operators per the preference order — no custom
 * physical planning needed, and both shapes scale:
 *
 *  - [[asOf]]: one shuffle by key; a per-key ordered window carries the
 *    latest right row forward — never builds point×point pairs.
 *  - [[rangeBinned]]: interval join via bin bucketing — intervals explode
 *    to the bins they overlap, points join their single bin (equality
 *    join!), and the exact containment filter runs on the bucketed pairs.
 *    Pair volume is bounded by bin occupancy, not |L|×|R|; a plain
 *    inequality join would be a broadcast-nested-loop.
 */
object Joins {

  /**
   * As-of join: for every left row, the LATEST right row with the same key
   * and `rightTime <= leftTime` (ties on time resolved toward the largest
   * `rightOrder`). Right payload columns surface null when nothing precedes.
   *
   * @param rightPayload right columns to carry (renamed as given)
   * @param tolerance    when set, a match older than `tolerance` time units
   *                     (leftTime − rightTime > tolerance) is discarded —
   *                     the row surfaces with null payload, exactly like
   *                     "nothing precedes". The carry-forward window is
   *                     unchanged; staleness is a per-row post-filter, so
   *                     the one-shuffle shape is preserved.
   */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightPayload: Seq[(String, String)],
           rightOrder: String,
           tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    val payloadStruct = struct(
      (rightPayload.map { case (from, to) => col(from).as(to) } :+
        col(rightOrder).as("__ord") :+ col(rightTime).as("__mt")): _*)

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    // join semantics for NULLs: a NULL right time can never satisfy
    // `rightTime <= leftTime`, and NULL keys never equal anything — drop
    // such right rows up front (otherwise asc_nulls_first would sort a
    // NULL-time row before every real row and make it a bogus match)
    val r = right
      .filter(col(rightTime).isNotNull && col(key).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__r", payloadStruct)
      .select(col(key) +: l.columns.filter(c => c != key).map {
        case c @ ("__t" | "__side" | "__r") => col(c)
        case c => lit(null).cast(l.schema(c).dataType).as(c)
      }: _*)

    // right rows sort before left rows at equal time (<= semantics); among
    // right ties the largest __ord wins via last() over the running frame
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__r.__ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val fresh = tolerance match {
      case None => col("__match")
      case Some(tol) => when(
        col("__t") - col("__match.__mt") <= tol, col("__match"))
    }
    matched
      .withColumn("__match", fresh)
      .select(leftCols.map(col) ++
        rightPayload.map { case (_, to) => col(s"__match.$to").as(to) }: _*)
  }

  /**
   * Range (interval) join via bin bucketing: rows of `points` paired with
   * every row of `intervals` whose `[lo, hi]` contains the point.
   *
   * All three columns must be numeric on a shared scale (e.g. epoch days);
   * `binWidth` trades explode factor (≈ interval_span/binWidth per
   * interval) against bin occupancy.
   */
  def rangeBinned(points: DataFrame, intervals: DataFrame,
                  pointCol: String, loCol: String, hiCol: String,
                  binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin", explode(sequence(
      floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /**
   * Interval-overlap join via the same bin bucketing as [[rangeBinned]],
   * with BOTH sides carrying `[lo, hi]` intervals: pairs where
   * `lLo <= rHi AND rLo <= lHi` (closed-interval overlap). Each side
   * explodes to the bins it spans; the equality join on the bin replaces
   * the nested-loop inequality join; the exact overlap predicate runs on
   * bucketed pairs only. A pair sharing several bins is emitted ONCE — it
   * is kept only in the first bin both sides occupy (`max` of their start
   * bins), a filter instead of a distinct, so dedup costs no extra shuffle.
   *
   * Column names must be disjoint across the two inputs (standard join
   * hygiene); all four columns share one numeric scale.
   */
  def intervalOverlapBinned(left: DataFrame, right: DataFrame,
                            lLo: String, lHi: String, rLo: String, rHi: String,
                            binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin", explode(sequence(
      floor(col(lLo) / binWidth), floor(col(lHi) / binWidth))))
    val r = right.withColumn("__bin", explode(sequence(
      floor(col(rLo) / binWidth), floor(col(rHi) / binWidth))))
    l.join(r, Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") ===
        greatest(floor(col(lLo) / binWidth), floor(col(rLo) / binWidth)))
      .drop("__bin")
  }
}
