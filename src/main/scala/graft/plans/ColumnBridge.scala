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

  /** The session's stable unique id (`sessionUUID` is `private[sql]`,
    * hence this shim) — the collision-proof cache key a
    * `System.identityHashCode` can't provide (hash codes can repeat
    * after GC). None for non-classic session implementations.
    */
  def sessionUuid(spark: org.apache.spark.sql.SparkSession): Option[String] =
    spark match {
      case c: org.apache.spark.sql.classic.SparkSession => Some(c.sessionUUID)
      case _ => None
    }

  /** The inverse: materialize a v1 `Sink.addBatch` micro-batch frame
    * (tagged streaming, single-use execution) as a plain batch frame a
    * sink can write with the ordinary APIs — the same
    * `internalCreateDataFrame(toRdd)` move Spark's own foreachBatch
    * sink makes before handing the user their DataFrame.
    */
  def asBatchFrame(
      spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        df.queryExecution.toRdd.map(_.copy()), df.schema, isStreaming = false)
}
