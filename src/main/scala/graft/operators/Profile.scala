package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality profiling — the Deequ/expectations-style single-pass column
 * profiler a pipeline runs before trusting a new drop of data: per column,
 * row count, null count, exact distinct count, and min/max.
 *
 * Scale shape (100 TB): ONE scan. Non-distinct aggregates combine map-side;
 * the exact distinct counts ride Spark's Expand-based multi-distinct
 * rewrite (row multiplication = number of profiled columns — the standard
 * engine shape for several COUNT(DISTINCT)s in one aggregate, and still one
 * pass over the files). Nothing is collected; the result is one row per
 * profiled column.
 */
object Profile {

  /**
   * Profile `fields` (name → column expression) in one aggregate pass.
   *
   * Column expressions must be STRING or exact-integer typed (pre-scale
   * doubles with `Q.cents`-style rounding) so the emitted `min_s`/`max_s`
   * strings are engine-independent — raw double rendering is not.
   *
   * Output: one row per field — `column, n_rows, n_null, n_distinct,
   * min_s, max_s` (min/max over non-null values, null when all-null).
   */
  def profile(df: DataFrame, fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "profile needs at least one field")
    val aggs = fields.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(count(lit(1)).as(s"__t$i"), count(c).as(s"__n$i"),
        countDistinct(c).as(s"__d$i"),
        min(c).cast("string").as(s"__mn$i"),
        max(c).cast("string").as(s"__mx$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("column"), col(s"__t$i").as("n_rows"),
        (col(s"__t$i") - col(s"__n$i")).as("n_null"),
        col(s"__d$i").as("n_distinct"),
        col(s"__mn$i").as("min_s"), col(s"__mx$i").as("max_s"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
