package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: resample irregular observations onto a fixed
 * grid and fill gaps by carrying the last observation forward — the
 * downsample/align step in front of any windowed model or dashboard.
 *
 * Timestamps are LONGS in the caller's unit (the events table is
 * TIMESTAMP(NANOS) read as nanos); bucketing is integer arithmetic
 * (`ts − ts mod step`) — no doubles anywhere near an epoch value, where a
 * double's 52-bit mantissa would already be lossy.
 *
 * Scale shape (100 TB): one groupBy (key, bucket) with map-side combine,
 * one tiny per-key span aggregate, the grid explode, and one key-partitioned
 * window for the fill — everything partitions by the series key; no global
 * state. Grid density is the caller's lever: rows-per-key after resampling
 * is span/step, so pick `step` for the resolution the consumer needs.
 */
object TimeSeries {

  /**
   * Per (key, bucket): the value of the LAST observation (greatest ts; ties
   * by `tieCol` then value — deterministic for any input). Buckets with no
   * observation take the previous bucket's value (`filled = true`). Grid =
   * every step from the key's first to last observed bucket, inclusive.
   *
   * @param step grid width in ts units (must be positive)
   * @return (key, bucket_ts, value, filled)
   */
  def resampleCarryForward(df: DataFrame, keyCol: String, tsCol: String,
                           valueCol: String, tieCol: String,
                           step: Long): DataFrame = {
    require(step > 0, s"step must be positive: $step")
    val obs = df
      .select(col(keyCol).as("key"),
        (col(tsCol) - pmod(col(tsCol), lit(step))).as("bucket_ts"),
        struct(col(tsCol), col(tieCol), col(valueCol).as("v")).as("o"))
      .groupBy(col("key"), col("bucket_ts"))
      .agg(max(col("o")).as("o"))
      .select(col("key"), col("bucket_ts"), col("o.v").as("obs_value"))
    val spine = obs.groupBy(col("key"))
      .agg(min(col("bucket_ts")).as("b0"), max(col("bucket_ts")).as("b1"))
      .select(col("key"),
        explode(sequence(col("b0"), col("b1"), lit(step))).as("bucket_ts"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq("key", "bucket_ts"), "left")
      .select(col("key"), col("bucket_ts"),
        last(col("obs_value"), ignoreNulls = true).over(w).as("value"),
        col("obs_value").isNull.as("filled"))
  }
}
