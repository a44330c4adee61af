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
    // one lazy min-label propagation step; extra columns pass through
    def step(ls: DataFrame): DataFrame = {
      val neighborMin = edges
        .join(ls.select(col("id").as("dst"), col("cluster_id")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("cluster_id").as("neighbor_min"))
      ls.join(neighborMin, Seq("id"), "left")
        .withColumn("cluster_id",
          least(col("cluster_id"),
            coalesce(col("neighbor_min"), col("cluster_id"))))
        .drop("neighbor_min")
    }
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // TWO lazy propagation steps per materialization: near-dup
      // components have tiny diameters, so halving the number of
      // checkpoint+convergence actions (each a fixed-latency job)
      // matters more than the occasional extra lazy join after
      // convergence. The original label rides along so the convergence
      // flag spans both steps without an old-vs-new join.
      val next = step(step(labels.withColumn("orig", col("cluster_id"))))
        .withColumn("chg", col("cluster_id") < col("orig"))
        .drop("orig")
        .localCheckpoint()
      converged = next.filter(col("chg")).limit(1).isEmpty
      labels = next.drop("chg")
      i += 1
    }
    labels
  }
}
