package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.{QualityScore, TextFunctions}

/** Token-budget-constrained corpus SELECTION — the last curation stage
  * of a training-data pipeline: "take the best documents from each
  * source until that source's token budget is spent". Composes with
  * [[Sampling.splitByHash]] / `mix_sources` / `pack_sequences` into the
  * full chain: score → select under budget → mix → split → pack.
  *
  * Execution shape for 100 TB: the quality score is a scan-local
  * codegen'd expression ([[QualityScore]]); the ranking + running token
  * sum is ONE window partitioned by `source` — hash-partitioned by
  * source, NO global sort, and per-source sorts are independent so 1000
  * executors sort 1000 sources in parallel. (Per-source data must fit a
  * task's spillable sort — true whenever sources are balanced; a
  * mega-source would call for the same salted two-phase top-k used
  * elsewhere, not a different algorithm.) Budgets resolve to driver-side
  * literals, so the same CASE chain interpolates into the oracle.
  */
object Curation {

  /** Per-source token budgets → one literal CASE column (driver-side
    * resolution, the [[Sampling.threshold]] rule: ONE source of truth
    * both engines interpolate).
    */
  private def budgetCol(sourceCol: Column, budgets: Seq[(String, Long)]): Column =
    budgets.foldLeft(lit(0L)) { case (els, (s, b)) =>
      when(sourceCol === s, lit(b)).otherwise(els)
    }

  /** CLUSTER-BALANCED downsampling: every cluster contributes exactly
    * the minority cluster's row count, chosen hash-deterministically —
    * the domain-balancing stage after semantic clustering
    * ([[graft.sim.KMeans]]): majority topics stop dominating the
    * training mix without RNG state or retry instability.
    *
    * Scale shape: the per-cluster counts are a k-row aggregate and the
    * global cap a broadcast single row; ranking is ONE window
    * partitioned by cluster (per-cluster sorts are independent — no
    * global sort, no single-partition window). Selection is integer
    * arithmetic on the shared 60-bit hash (rank ties broken by id), so
    * the kept set is deterministic, partitioning-independent and
    * SQL-replayable.
    */
  def balanceClusters(assign: DataFrame, idCol: String,
      clusterCol: String = "cluster_id"): DataFrame = {
    val counts = assign.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("__n"))
    val cap = counts.agg(min(col("__n")).as("__cap"))
    val w = Window.partitionBy(clusterCol)
      .orderBy(graft.dedup.Shingles.baseHash(col(idCol).cast("string")),
        col(idCol))
    assign
      .withColumn("__rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(cap))
      .filter(col("__rk") <= col("__cap"))
      .select(col(idCol), col(clusterCol))
  }

  /** Keep each source's highest-scoring documents while the running
    * token total stays within the source's budget. Ranking is total
    * (score desc, id asc) so the running sum — and therefore the cut —
    * is deterministic; the frame is explicit ROWS (not the default
    * RANGE) so peers never collapse.
    *
    * Returns (id, source, token_cnt, score_milli, sel_rank, cum_tokens)
    * for the selected rows.
    */
  def selectByTokenBudget(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      budgets: Seq[(String, Long)]): DataFrame = {
    // duplicate sources would diverge from the oracle: the when-chain
    // fold takes the LAST entry, SQL CASE takes the FIRST
    require(budgets.map(_._1).distinct.size == budgets.size,
      s"duplicate source in budgets: ${budgets.map(_._1)}")
    val scored = docs.select(
      col(idCol), col(sourceCol),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("token_cnt"),
      QualityScore.scoreMilli(col(textCol)).as("score_milli"))
    val w = Window.partitionBy(sourceCol)
      .orderBy(col("score_milli").desc, col(idCol))
    scored
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum("token_cnt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= budgetCol(col(sourceCol), budgets))
  }
}
