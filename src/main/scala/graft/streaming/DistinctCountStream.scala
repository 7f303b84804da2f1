package graft.streaming

import graft.functions.Kmv
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

import scala.collection.mutable

/** Streaming distinct-count estimation: a per-group K-minimum-values
  * sketch living in [[GroupState]] (beyond-reference; the streaming
  * twin of the oracle-checked `q_kmv_replay` mechanism, built like
  * [[HeavyHittersStream]] — same sketch rules as the batch side,
  * bounded state, Update-mode emission).
  *
  * Each micro-batch offers its items' 32-bit md5 hashes to the
  * group's ≤k-element minimum set through the SAME
  * [[Kmv.offer]]/[[Kmv.estimate]] rules the batch replay encodes in
  * SQL. Offers are order-independent (only values below the current
  * k-th minimum enter, and that bound never increases), so the state
  * after any prefix of the stream equals the batch sketch over the
  * same rows — micro-batch boundaries, shuffles, and replays cannot
  * change the answer, which is what the parity spec pins.
  *
  * State per key is ≤ k longs plus a row counter — bounded regardless
  * of stream length or item cardinality (k=256 ⇒ ~2 KB), and
  * checkpointed incrementally by the state store. At 100 TB the same
  * shape holds: distinct-count state never grows with the distinct
  * cardinality itself, which is exactly why a sketch replaces
  * `approx_count_distinct` in a stream (Spark's HLL aggregate cannot
  * run incrementally across micro-batches without full-outer state).
  */
object DistinctCountStream {
  final case class In(group: String, item: String)
  /** `k` records the sketch size the state was built under. The 0
    * default is defensive only — a checkpoint written by the PRE-k
    * two-field KmvState cannot be restored by this code at all
    * (flatMapGroupsWithState's state-schema compatibility check
    * rejects the field-count change at query start), so upgrading
    * across that schema change requires a fresh checkpoint; there is
    * no silent-compat path. What IS supported across restarts is a
    * configured-k change under THIS schema — see the clamp below. */
  final case class KmvState(hashes: Seq[Long], n: Long, k: Int = 0)
  final case class Out(group: String, rows_seen: Long, k_used: Int,
                       hk: Long, estimate: Long)

  /** `items` needs `group` and `item` string columns. */
  def distinctCounts(items: DataFrame, k: Int): Dataset[Out] = {
    require(k >= 2, s"KMV stream needs k >= 2, got $k")
    import items.sparkSession.implicits._
    val typed = items.select(col("group").cast("string").as("group"),
                             col("item").cast("string").as("item")).as[In]

    def update(group: String, rows: Iterator[In],
               state: GroupState[KmvState]): Iterator[Out] = {
      val prior = state.getOption.getOrElse(KmvState(Nil, 0L, k))
      // k changes across restarts are one-directional: a checkpoint
      // written under a LARGER k restores an oversized set, and keeping
      // the k smallest IS the k-sized KMV sketch of the same prefix —
      // downsizing a minimum-values sketch is lossless. But a k
      // INCREASE is NOT: mid-range hashes the old sketch already
      // discarded are gone, so the set would refill with larger values,
      // h_k would land too high, and the estimate would be silently
      // biased (also breaking batch parity). So the effective k is
      // clamped to min(stored k, configured k) and persisted — once
      // shrunk, a group's sketch never grows back.
      val effK = if (prior.k > 0) math.min(prior.k, k) else k
      val set = (mutable.TreeSet.empty[Long] ++ prior.hashes).take(effK)
      var n = prior.n
      rows.foreach { r =>
        n += 1 // EVERY row counts; only non-null items hash
        if (r.item != null) { Kmv.offer(set, Kmv.hash32(r.item), effK); () }
      }
      state.update(KmvState(set.toSeq, n, effK))
      val hk = if (set.isEmpty) 0L else set.max
      Iterator.single(
        Out(group, n, set.size, hk, Kmv.estimate(set.size, effK, hk)))
    }

    typed.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }
}
