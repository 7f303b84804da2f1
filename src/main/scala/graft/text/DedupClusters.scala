package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph → dedup
  * clusters (beyond-reference; the step after MinHash/SimHash pair
  * generation in a real training-data dedup pipeline: each cluster
  * keeps one representative).
  *
  * Algorithm: iterative min-id label propagation (the DataFrame-only
  * core of the large-star/small-star technique): every node adopts the
  * smallest id among itself and its neighbors until a fixpoint. Each
  * iteration is one join + one aggregate (shuffles on node id);
  * iterations needed ≈ graph diameter, which for near-dup clusters is
  * tiny (dup groups are dense). A convergence check per iteration
  * (count of changed labels) stops early.
  *
  * Deterministic: the fixpoint (min reachable id per component) is
  * unique regardless of execution order.
  */
object DedupClusters {
  /** pairs: (id_a, id_b) undirected near-dup edges. Returns
    * (id, cluster_id) for every node that appears in a pair, where
    * cluster_id = min node id of its component. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("cluster_id", col("id"))
      .cache()

    // labels only ever decrease (min propagation), so the label sum is a
    // strictly-monotone convergence witness — one cheap aggregate per
    // iteration instead of a change-detection join. coalesce: an empty
    // graph (no near-dup pairs is a legitimate state) sums to NULL.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("cluster_id"), lit(0L))).head().getLong(0)

    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // each node's candidate label: min of its own and its neighbors'
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst")
                    .withColumnRenamed("cluster_id", "nl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("nl").as("min_neighbor"))
      val hop = labels.join(neighborLabels, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("cluster_id"),
                coalesce(col("min_neighbor"), col("cluster_id")))
            .as("cluster_id"))
        .cache()
      // pointer jumping: adopt the label of your label — turns O(diameter)
      // propagation into O(log diameter)
      val next = hop
        .join(hop.select(col("id").as("cluster_id"), col("cluster_id").as("ll")),
              Seq("cluster_id"), "left_outer")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("ll"), col("cluster_id")))
            .as("cluster_id"))
      // localCheckpoint truncates the LOGICAL plan — without it each
      // iteration's plan nests the previous one's and Catalyst analysis
      // time grows exponentially (cache only truncates execution
      // lineage). On a multi-node cluster use checkpoint(dir) instead.
      val mat = next.localCheckpoint(true)
      val s = labelSum(mat)
      hop.unpersist()
      labels.unpersist()
      labels = mat
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Full dedup: near-dup pairs → components → survivors = one
    * representative (min id) per cluster + all unpaired docs. */
  def survivors(allIds: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    val dropped = comps.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    allIds.select(col(idCol)).join(dropped, Seq(idCol), "left_anti")
  }
}
