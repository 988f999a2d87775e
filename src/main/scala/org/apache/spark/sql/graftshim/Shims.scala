package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `classic.ExpressionUtils` is `private[sql]`,
  * so this one-file shim lives under the org.apache.spark.sql namespace —
  * the standard pattern for connector libraries that define native
  * Catalyst expressions. */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rewrap a micro-batch's physical rows as a plain (non-streaming)
    * DataFrame. A DSv1 `Sink.addBatch` receives a DataFrame whose logical
    * plan still contains the streaming source relation, so running new
    * actions on it trips the analyzer ("queries with streaming sources must
    * be executed with writeStream.start()"); sinks that re-process the
    * batch (Delta's does the same) take `queryExecution.toRdd` and rebuild
    * a batch DataFrame around it. `internalCreateDataFrame` is
    * `private[sql]`, hence this shim. */
  def asBatchDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      data: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(data.queryExecution.toRdd, data.schema)
}
