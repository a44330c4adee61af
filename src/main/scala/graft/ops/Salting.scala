package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE's skew-join splitting does
  * not cover (hot-key AGGREGATIONS, and joins where one side must
  * replicate). The pattern: scatter hot keys across `salts` synthetic
  * sub-keys, do the heavy operation per sub-key, then combine.
  *
  * AQE (on by default) already splits skewed SHUFFLE JOIN partitions;
  * reach for these helpers when a single group key is hot enough that
  * one reducer would own it entirely.
  */
object Salting {

  /** Two-phase aggregation: phase 1 aggregates per (keys, salt) —
    * spreading a hot key over `salts` reducers — phase 2 combines the
    * partials per key. Supported ops are the self-combinable ones:
    * sum/count/min/max (count re-combines via sum).
    *
    * @param aggs output column name -> (op, input column)
    */
  def saltedAggregate(
      df: DataFrame, keys: Seq[String],
      aggs: Map[String, (String, String)], salts: Int = 32): DataFrame = {
    require(aggs.nonEmpty)
    val bad = aggs.values.map(_._1).filterNot(Set("sum", "count", "min", "max"))
    require(bad.isEmpty, s"non-combinable ops: $bad")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partials = aggs.toSeq.map(partialAgg)
    val finals = aggs.toSeq.map(finalAgg)
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  private def partialAgg(kv: (String, (String, String))): Column = {
    val (out, (op, in)) = kv
    (op match {
      case "sum" => sum(col(in))
      case "count" => count(if (in == "*") lit(1) else col(in))
      case "min" => min(col(in))
      case "max" => max(col(in))
    }).as(s"__p_$out")
  }

  private def finalAgg(kv: (String, (String, String))): Column = {
    val (out, (op, _)) = kv
    (op match {
      case "sum" | "count" => sum(col(s"__p_$out"))
      case "min" => min(col(s"__p_$out"))
      case "max" => max(col(s"__p_$out"))
    }).as(out)
  }

  /** Skewed equi-join: the (large, skewed) left side gets a
    * deterministic-per-row salt in [0, salts); the (smaller) right side
    * is replicated once per salt value; the join key becomes
    * (keys, salt), so a hot key's rows spread over `salts` tasks.
    * Inner and left-outer semantics are preserved.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      joinType: String = "inner", salts: Int = 8): DataFrame = {
    require(Set("inner", "left", "left_outer")(joinType),
      s"unsupported join type for salting: $joinType")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
