package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.)
  * made deterministic: each node adopts the most frequent label among
  * its neighbors, ties broken by SMALLEST label. The per-node argmax
  * is window-free — `max(struct(count, −label))` in one aggregate — so
  * no per-node sort ever happens; each iteration is one join keyed on
  * the neighbor plus two hash-shuffles on node id, localCheckpointed
  * (the Lloyd rule: without truncation every iteration's consumer
  * re-executes the whole lineage). Candidate (node, label) pairs per
  * iteration are bounded by the edge count.
  *
  * Convergence: synchronous deterministic LPA reaches a FIXED POINT —
  * once no label changes, every later iteration recomputes the same
  * assignment — so `earlyExit` stops the loop the first time a
  * zero-change iteration is observed, with output IDENTICAL to running
  * the remaining iterations. The check is one O(V) join over two
  * checkpointed label vectors per iteration. At 100 TB this is the
  * difference between paying full graph passes a converged run no
  * longer needs and an unconverged run silently under-iterating:
  * callers pick `maxIters` generously and let the fixed point cut it.
  * Fixed-iteration mode (`earlyExit = false`) is kept for oracle
  * parity with unrolled-CTE replays.
  */
object LabelPropagation {

  /** @param edges directed edge list with `src`/`dst`; pass both
    *              directions for an undirected graph.
    * @return one row per node: (node, label). */
  def run(edges: DataFrame, iters: Int,
          earlyExit: Boolean = false): DataFrame =
    runWithStats(edges, iters, earlyExit)._1

  /** [[run]] plus the number of iterations actually executed. */
  def runWithStats(edges: DataFrame, maxIters: Int,
                   earlyExit: Boolean): (DataFrame, Int) = {
    require(maxIters >= 1, "maxIters must be >= 1")
    // materialize the edge table before the loop (PageRank's rule,
    // applied to this operator's own input): a caller-supplied DERIVED
    // edge list (join/aggregate lineage) would otherwise re-execute
    // its full construction once per iteration — the Lloyd-rule
    // failure the doc below warns about for the label vector, but for
    // the edges
    val edgesM = edges.select(col("src"), col("dst")).localCheckpoint()
    // node set = src ∪ dst (PageRank's convention): seeding from src
    // alone drops sink-only nodes, and an update step that only kept
    // nodes WITH in-neighbors would shrink the vector every iteration
    // on a directed input — nodes silently vanishing from the output
    // despite the one-row-per-node contract. (On undirected inputs —
    // both directions present — the two formulations are identical.)
    var labels = edgesM.select(col("src").as("node"))
      .union(edgesM.select(col("dst").as("node"))).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var prevCheckpoint: Option[org.apache.spark.sql.DataFrame] = None
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val freq = edgesM
        .join(labels.select(col("node").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // smallest-label tie-break WITHOUT negation: -label overflows at
      // Long.MinValue (wraps to itself under ANSI-off, throws under
      // ANSI-on — the hazard TopKPairs.ordering documents). Flip the
      // BITS instead: x -> ~x = -x-1 is a total order reversal with no
      // overflow, and ~~x round-trips exactly.
      val adopted = freq.groupBy("node")
        .agg(max(struct(col("cnt"),
                        bitwise_not(col("label")).as("nl"))).as("m"))
        .select(col("node"), bitwise_not(col("m.nl")).as("adopted"))
      // left join: a node with no in-neighbors keeps its current label
      // eager localCheckpoint, then RELEASE the superseded vector (see
      // Checkpoints.release: plain unpersist can't free checkpoint
      // blocks, and leaking one O(V) vector per iteration starved
      // execution memory in the 2 GB heap rehearsal). Materialization
      // happens before the release — this plan reads the previous
      // vector, whose lineage is already truncated.
      val next = labels.select(col("node"), col("label").as("prev0"))
        .join(adopted, Seq("node"), "left_outer")
        .select(col("node"),
                coalesce(col("adopted"), col("prev0")).as("label"))
        .localCheckpoint()
      it += 1
      if (earlyExit && it < maxIters) {
        // fixed point reached: label vector unchanged => every later
        // iteration is a no-op; isEmpty short-circuits at the first
        // changed row
        converged = next
          .join(labels.withColumnRenamed("label", "prev"), Seq("node"))
          .filter(col("label") =!= col("prev"))
          .isEmpty
      }
      prevCheckpoint.foreach(Checkpoints.release)
      prevCheckpoint = Some(next)
      labels = next
    }
    // the final vector stays persisted (it is the result); every
    // intermediate iteration's blocks are released
    (labels, it)
  }
}
