package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Lifecycle helpers for the blocks a `DataFrame.localCheckpoint()`
  * pins in the block manager.
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
  */
object Checkpoints {
  /** Release a superseded checkpoint's blocks. Only call on frames
    * that are truly superseded: a released checkpoint cannot be
    * recomputed (its lineage was truncated), so any later read of the
    * released frame fails. */
  def release(checkpointed: DataFrame): Unit =
    rddOf(checkpointed).foreach(_.unpersist(blocking = false))

  /** Total cached footprint (memory + disk) of a materialized
    * checkpoint, from the block manager's live stats; 0 if unknown. */
  def cachedBytes(checkpointed: DataFrame): Long =
    rddOf(checkpointed).flatMap { rdd =>
      checkpointed.sparkSession.sparkContext.getRDDStorageInfo
        .find(_.id == rdd.id).map(i => i.memSize + i.diskSize)
    }.getOrElse(0L)

  /** Re-layout a just-materialized checkpoint whose cached blocks
    * average fatter than `targetBytes`, preserving the hash layout on
    * `keys`; the superseded fat copy is released. No-op (returns the
    * input frame, no job) when blocks are already bounded — so the
    * extra O(rows) exchange is paid ONLY in the pathological case.
    *
    * Why block size matters and partition COUNT alone doesn't: a task
    * reading a cached block read-LOCKS it for the task's lifetime
    * (locked blocks are unevictable), so a stage with partitions ==
    * cores pins the ENTIRE checkpoint in storage memory at once while
    * its own aggregation is trying to grow — the 2 GB sf1 rehearsal
    * died exactly there (8 × ~105 MB edge blocks all locked,
    * AGGREGATE_OUT_OF_MEMORY in the reader's partial aggregate).
    * Bounding block size restores the partitions ≫ concurrent-tasks
    * shape a real cluster always has: the locked set is at most
    * cores × targetBytes, independent of data scale, and everything
    * else stays evictable to disk under execution pressure. On ample
    * heaps the stat check is driver-side and free. */
  def boundBlocks(checkpointed: DataFrame, keys: Seq[Column],
                  targetBytes: Long = 32L << 20): DataFrame = {
    val bytes = cachedBytes(checkpointed)
    val parts = rddOf(checkpointed).map(_.getNumPartitions).getOrElse(1)
    if (bytes <= targetBytes * math.max(parts, 1)) checkpointed
    else {
      val wider = (bytes / targetBytes + 1).toInt
      val re = checkpointed.repartition(wider, keys: _*).localCheckpoint()
      release(checkpointed)
      re
    }
  }

  /** Partition count that keeps a table of `bytes` at `targetBytes`
    * blocks, floored at the session's shuffle parallelism — for
    * sizing a SECOND layout of a checkpoint whose footprint is
    * already measured (avoids materialize-then-widen double work). */
  def boundedParts(df: DataFrame, bytes: Long,
                   targetBytes: Long = 32L << 20): Int =
    math.max(df.sparkSession.sessionState.conf.numShufflePartitions,
             (bytes / targetBytes + 1).toInt)

  private def rddOf(df: DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }
}
