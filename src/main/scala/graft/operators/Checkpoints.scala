package graft.operators

import org.apache.spark.sql.DataFrame

/** Release the blocks a `DataFrame.localCheckpoint()` pinned.
  *
  * localCheckpoint persists its RDD[InternalRow] directly in the block
  * manager; `DataFrame.unpersist()` only releases frames registered
  * through `persist()`, so an iterative loop that re-checkpoints every
  * round leaks one O(V) vector per iteration — on a memory-tight
  * executor the pinned storage squeezes execution below the
  * hash-aggregate minimum (surfaced as AGGREGATE_OUT_OF_MEMORY by the
  * 2 GB heap rehearsal at sf1). The alternative — `.rdd.persist` +
  * `createDataFrame` (DedupClusters' shape) — releases cleanly but
  * pays an InternalRow↔Row conversion on both sides of the cache and
  * drops LogicalRDD's partitioning metadata; measured ~20-30 % on the
  * PageRank/LabelPropagation loops. This keeps localCheckpoint's
  * compact UnsafeRow blocks and layout, and frees them by unpersisting
  * the RDD the checkpointed plan's LogicalRDD node carries.
  *
  * Only call on vectors that are truly superseded: a released
  * checkpoint cannot be recomputed (its lineage was truncated), so any
  * later read of the released frame fails. */
object Checkpoints {
  def release(checkpointed: DataFrame): Unit =
    checkpointed.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))
}
