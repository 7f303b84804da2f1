package graft.streaming

import graft.functions.MisraGries
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable

/** Streaming heavy hitters: a per-group Misra-Gries sketch living in
  * [[GroupState]] (beyond-reference; the streaming twin of
  * `q_heavy_hitters`). Each micro-batch folds its rows into the
  * group's ≤k-counter state through the SAME
  * [[MisraGries.offer]]/[[MisraGries.mergeInto]] rules as the batch
  * aggregate — a sequential MG pass is exactly a stream, so the
  * deterministic guarantee carries over unchanged: after n total rows,
  * every item with true frequency > n/(k+1) is tracked, and no count
  * overcounts (undercount ≤ n/(k+1)).
  *
  * State per key is ≤ k (string, long) counters plus one row counter —
  * bounded regardless of stream length or item cardinality, and
  * checkpointed incrementally by the state store. Emission (Update
  * mode) is the refreshed candidate list for each group that saw data
  * in the batch: (item, floor count, rows-so-far), ordered stably by
  * (-count, item) with rank attached, so a downstream exact recount —
  * the batch query's phase 2 — can subscribe to just the candidates.
  */
object HeavyHittersStream {
  final case class In(group: String, item: String)
  final case class HHState(counts: Map[String, Long], n: Long)
  final case class Out(group: String, item: String, min_count: Long,
                       rows_seen: Long, rank: Int)

  /** `items` needs `group` and `item` string columns. */
  def topItems(items: DataFrame, k: Int): Dataset[Out] = {
    require(k >= 1, s"heavy-hitters stream needs k >= 1, got $k")
    import items.sparkSession.implicits._
    val typed = items.select(col("group").cast("string").as("group"),
                             col("item").cast("string").as("item")).as[In]

    def update(group: String, rows: Iterator[In],
               state: GroupState[HHState]): Iterator[Out] = {
      val buf = mutable.HashMap.empty[String, Long]
      val prior = state.getOption.getOrElse(HHState(Map.empty, 0L))
      prior.counts.foreach { case (i, c) => buf.update(i, c) }
      var n = prior.n
      // micro-batch iterator order is deterministic per batch plan;
      // MG's guarantee holds for ANY order, so emitted candidate sets
      // are a valid superset under every scheduling
      rows.foreach { r =>
        if (r.item != null) { MisraGries.offer(buf, r.item, k); n += 1 }
      }
      state.update(HHState(buf.toMap, n))
      val nFinal = n
      buf.toArray.sortBy { case (item, c) => (-c, item) }
        .iterator.zipWithIndex.map { case ((item, c), idx) =>
          Out(group, item, c, nFinal, idx + 1)
        }
    }

    typed.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }
}
