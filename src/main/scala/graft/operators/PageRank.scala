package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank by synchronous power iteration — the canonical
  * iterative-graph workload a training-data pipeline runs over link /
  * co-occurrence / interaction graphs (page importance for crawl
  * prioritization, node weights for sampling curricula).
  *
  * Shape per iteration (the textbook distributed formulation):
  * one shuffle-join of the degree-annotated edge list with the current
  * rank vector on `src`, then one `groupBy(dst)` sum — O(E) shuffled
  * bytes per iteration, no driver-side state beyond the two scalars
  * (node count, dangling mass). The edge list is degree-annotated ONCE
  * and `localCheckpoint`ed so the 5-iteration loop re-reads a
  * materialized narrow table instead of re-running the
  * distinct+groupBy lineage every pass (the Lloyd-iteration lesson:
  * without truncation every iteration replays the whole history).
  * Rank vectors are checkpointed per iteration for the same reason —
  * each is O(V) narrow rows.
  *
  * Dangling nodes (out-degree 0) have their rank mass redistributed
  * uniformly, the standard correction; on symmetric (undirected)
  * graphs the dangling set is empty and the correction term is an
  * exact IEEE no-op (`c + 0.0 == c`), which keeps results bit-aligned
  * with oracle engines that skip the term.
  *
  * Determinism: per-node contribution sums are order-dependent in the
  * last ulp (as with every distributed double sum) — callers that
  * hash-compare results across engines must round through
  * [[graft.functions.CrossEngine.roundHalfUp]]; 5 iterations keep the
  * drift ≥7 orders of magnitude below a 1e-6 rounding step on scaled
  * (×V) ranks.
  */
object PageRank {
  /** @param edges directed edge list with `src`/`dst` columns (any
    *              integral type; duplicates collapse). For an
    *              undirected graph, pass both directions.
    * @return one row per node: (node: Long, r: Double) after `iters`
    *         iterations of r' = (1-d)/V + d·(Σ_in r/deg + dangling/V).
    */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges
      .select(col("src").cast("long").as("src"),
              col("dst").cast("long").as("dst"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // degree-annotated edges: the loop's only big operand, built once
    val withDeg = e.join(deg, "src").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val base = (1.0 - damping) / n
    val outDeg = deg.withColumnRenamed("src", "node")

    var rank = nodes.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(rank.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg(sum(col("r") / col("deg")).as("c"))
        .withColumnRenamed("dst", "node")
      // rank mass parked on out-degree-0 nodes, redistributed uniformly
      val dangling = rank.join(outDeg, Seq("node"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dang"))
      rank = nodes
        .join(contrib, Seq("node"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(base) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dang") / n)).as("r"))
        .localCheckpoint()
    }
    rank
  }
}
