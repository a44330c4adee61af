package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.SparkSession

/** Registers graft's SQL functions into a live session's function
  * registry. Lives under `org.apache.spark.sql` because the session's
  * `sessionState` is exposed on the classic implementation type only.
  */
object GraftFunctionRegistrar {
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
