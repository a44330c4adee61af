package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]`, so the conversion lives in this sql-namespace shim
  * (same pattern as the graftmerge parser wrapper).
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Re-tag a batch frame as a streaming one — what a v1 streaming
    * `Source.getBatch` must return (MicroBatchExecution asserts
    * `isStreaming`). `internalCreateDataFrame` is `private[sql]`,
    * hence this shim.
    */
  def asStreamingFrame(
      spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd, df.schema, isStreaming = true)
}
