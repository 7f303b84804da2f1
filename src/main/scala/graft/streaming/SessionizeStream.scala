package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (beyond-reference; SURVEY §7.6 —
  * KeyValueGroupedDataset custom state).
  *
  * The batch twin is q_sessionize (lag + running sum). Streaming can't
  * window backwards, so sessions live in per-user [[GroupState]]: an
  * event within `gapSeconds` of the open session extends it; a later
  * event closes it and emits the finished session. Processing-time
  * timeout flushes idle users' sessions.
  *
  * State per key is one [[SessionState]] (four longs) — at 100 TB /
  * millions of users this is megabytes per executor, bounded regardless
  * of stream length, and checkpointed incrementally by the state store.
  */
object SessionizeStream {
  final case class SessionEvent(user_id: Long, event_id: Long, sec: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class SessionOut(user_id: Long, start_sec: Long, end_sec: Long,
                              n_events: Long)

  /** `idleFlush`: when true, processing-time timeouts close idle
    * users' sessions eventually — at the cost of the engine scheduling
    * continuous timeout batches (never use with processAllAvailable in
    * tests: the stream never settles). When false, a session closes
    * only when a later out-of-gap event arrives. */
  def sessionize(events: DataFrame, gapSeconds: Long,
                 idleFlush: Boolean = false): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val typed = events
      .select(col("user_id"), col("event_id"),
              col("ts").cast("long").as("sec"))
      .as[SessionEvent]

    def update(userId: Long, evs: Iterator[SessionEvent],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(s =>
          SessionOut(userId, s.start, s.end, s.n)).iterator
        state.remove()
        return out
      }
      val sorted = evs.toSeq.sortBy(e => (e.sec, e.event_id))
      val closed = Seq.newBuilder[SessionOut]
      var cur = state.getOption
      // Cross-batch ordering is explicit, not assumed: an event can
      // predate the open session (late arrival in a later microbatch).
      //   - within [start−gap, end+gap]: belongs to the session; start
      //     LOWERS for a gap-adjacent earlier event, matching the batch
      //     twin's sorted view (the old `e.sec - s.end <= gap` test was
      //     true for EVERY past event — a sec=20 straggler silently
      //     inflated a sec=1000 session without moving its start);
      //   - beyond end+gap: close and open, the normal path;
      //   - more than gap BEFORE start: an earlier session this stream
      //     can no longer reconstruct (its neighbors were already
      //     emitted) — emitted immediately as a singleton session, so
      //     row accounting survives (Σ n_events matches the batch
      //     twin) even though deep-late session BOUNDARIES cannot.
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.sec > s.end + gapSeconds =>
            closed += SessionOut(userId, s.start, s.end, s.n)
            cur = Some(SessionState(e.sec, e.sec, 1))
          case Some(s) if e.sec >= s.start - gapSeconds =>
            cur = Some(SessionState(s.start.min(e.sec), s.end.max(e.sec),
                                    s.n + 1))
          case Some(_) => // deep-late straggler
            closed += SessionOut(userId, e.sec, e.sec, 1)
          case None =>
            cur = Some(SessionState(e.sec, e.sec, 1))
        }
      }
      cur.foreach(state.update)
      if (idleFlush) state.setTimeoutDuration(gapSeconds * 1000)
      closed.result().iterator
    }

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleFlush) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(update)
  }
}
