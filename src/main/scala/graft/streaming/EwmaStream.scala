package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA: the incremental twin of `q_ewma` (per-key,
  * per-month half-life smoothing with exact 2^(J−d) integer weights —
  * the same order-independent fixed-point arithmetic, so a streamed
  * result equals the batch query on the same rows).
  *
  * State per key is the last 2J+1 months of fixed-point totals —
  * bounded regardless of stream length: a month needs the J months
  * before it, and the oldest month a late row may still UPDATE
  * (max−J, the UPDATE horizon) needs J more, hence the PRUNE horizon
  * max−2J. The two horizons are distinct on purpose: a row is
  * classified late once mi < max−J — accepting it any deeper would
  * re-emit an EWMA whose [mi−J, mi] lookback is partly pruned,
  * silently diverging from the batch `q_ewma` this module claims to
  * equal. Late rows are dropped and counted in the emitted
  * `late_dropped` diagnostic rather than skewing a frozen window (the
  * state-store analogue of a watermark bound).
  *
  * Emission (Update mode): every OBSERVED month whose smoothed value
  * changed this batch — the updated months and the ≤J observed months
  * after each (decay reaches forward), recomputed from state.
  * Unobserved months emit nothing, matching the batch query's join
  * semantics. Downstream upserts by (key, mi), exactly like the batch
  * table.
  *
  * Caveat shared with every event-time watermark (Spark's included):
  * the horizon ratchets FORWARD on the max observed month, so one
  * corrupt far-future mi (a bad year parse) permanently classifies
  * the key's real months as late. Garbage-in protection belongs
  * upstream — validate mi to the feed's plausible range before this
  * operator, exactly as you would before withWatermark.
  */
// Serializable: the state-update closure calls smoothAt, an object
// method, so the module reference rides inside the serialized lambda.
object EwmaStream extends Serializable {
  final case class In(key: Long, mi: Long, cents: Long)
  final case class EwmaState(months: Map[Long, Long], lateDropped: Long)
  final case class Out(key: Long, mi: Long, ewma: Double, late_dropped: Long)

  val J = 10

  /** EWMA at month `t` over observed months within J, the q_ewma
    * formula: Σ cents·2^(J−d) / Σ 2^(J−d), d = t − mi ∈ [0, J]. */
  private def smoothAt(months: Map[Long, Long], t: Long): Double = {
    var num = 0L
    var den = 0L
    months.foreach { case (mi, cents) =>
      val d = t - mi
      if (d >= 0 && d <= J) {
        val w = 1L << (J - d).toInt
        num += cents * w
        den += w
      }
    }
    num.toDouble / (den * 10000.0)
  }

  /** `rows` needs long `key`, `mi` (year*12+month) and fixed-point
    * `cents` columns. */
  def smoothed(rows: DataFrame): Dataset[Out] = {
    import rows.sparkSession.implicits._
    val typed = rows.select(col("key").cast("long").as("key"),
                            col("mi").cast("long").as("mi"),
                            col("cents").cast("long").as("cents")).as[In]

    def update(key: Long, it: Iterator[In],
               state: GroupState[EwmaState]): Iterator[Out] = {
      val prior = state.getOption.getOrElse(EwmaState(Map.empty, 0L))
      var months = prior.months
      var late = prior.lateDropped
      // the horizon uses the max INCLUDING this batch, so a forward
      // jump inside one batch classifies that batch's older rows as
      // late (counted) instead of silently pruning them after merge
      val batch = it.toArray
      val maxMi = (batch.iterator.map(_.mi) ++ months.keysIterator)
        .foldLeft(Long.MinValue)(math.max)
      val updateHorizon = maxMi - J      // oldest month a row may update
      val pruneHorizon = maxMi - 2L * J  // lookback support for the above
      val touched = scala.collection.mutable.Set.empty[Long]
      batch.foreach { r =>
        if (r.mi < updateHorizon) late += 1
        else {
          months = months.updated(r.mi, months.getOrElse(r.mi, 0L) + r.cents)
          touched += r.mi
        }
      }
      months = months.filter { case (mi, _) => mi >= pruneHorizon }
      state.update(EwmaState(months, late))
      // emit every month whose window contains a touched month
      val affected0 = touched.flatMap(t => (t to t + J))
        .filter(months.contains)
      // an ALL-late batch must still surface its counter: without
      // this, late_dropped grows invisibly in state until some future
      // on-time row happens to emit — exactly the batches where data
      // is being discarded would be the ones monitoring can't see.
      // Re-emitting the latest observed month is an upsert no-op for
      // the ewma value and refreshes only the diagnostic.
      val affected =
        if (affected0.isEmpty && late > prior.lateDropped && months.nonEmpty)
          Set(months.keysIterator.max)
        else affected0
      val lateFinal = late
      affected.toArray.sorted.iterator.map { mi =>
        Out(key, mi, smoothAt(months, mi), lateFinal)
      }
    }

    typed.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }
}
