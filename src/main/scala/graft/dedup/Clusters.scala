package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step a
  * training-data pipeline runs AFTER pair detection ([[MinHashLSH]] /
  * [[SimHash]] / [[NgramJaccard]]): pairs only say "a ~ b"; dropping
  * duplicates needs the transitive closure so each group keeps exactly
  * one canonical document.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round every node takes the minimum label
  * among itself and its neighbors; fixpoint = every node carries the
  * minimum id of its component (converges in O(component diameter)
  * rounds — near-dup clusters are shallow, typically 2-3 rounds).
  *
  * Scale shape: the edge list is only the NEAR-DUP PAIRS — orders of
  * magnitude smaller than the corpus — and every round is one
  * edge-vs-label equi-join + a min-aggregate, all hash-partitioned on
  * node id. Each round materializes its labels (`localCheckpoint`), so
  * the plan never grows with the iteration count. For adversarial
  * graphs with long chains the standard upgrade is the large-star /
  * small-star algorithm (Kiveris et al., "Connected Components in
  * MapReduce and Beyond"), which converges in O(log n) rounds of the
  * same join shape.
  */
object Clusters {

  /** `(id, cluster_id)` for every node appearing in `pairs`;
    * `cluster_id` = min node id of the connected component.
    *
    * @param pairs undirected edges, two columns `aCol`/`bCol`
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String = "a", bCol: String = "b",
      maxIter: Int = 25): DataFrame = {
    // materialize the pair list FIRST: the caller usually hands us the
    // lazy output of a whole near-dup pipeline, and referencing it in
    // both union branches below would execute that pipeline twice
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .localCheckpoint()
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // min label among each node's neighbors
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("cluster_id").as("neighbor_min"))
      // convergence flag computed IN the propagation pass (a separate
      // old-vs-new join would cost a full extra shuffle per round)
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"),
            coalesce(col("neighbor_min"), col("cluster_id"))).as("cluster_id"),
          (col("neighbor_min").isNotNull &&
            col("neighbor_min") < col("cluster_id")).as("chg"))
        .localCheckpoint()
      converged = next.filter(col("chg")).limit(1).isEmpty
      labels = next.drop("chg")
      i += 1
    }
    labels
  }
}
