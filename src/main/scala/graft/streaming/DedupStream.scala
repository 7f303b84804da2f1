package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication (beyond-reference; the ingest-side twin of
  * the batch dedup family in graft.text / graft.operators.Dedup).
  *
  * A training-data ingest stream re-delivers records (at-least-once
  * sources, backfills, crawler retries); deduping AT INGEST keeps every
  * downstream table append-only instead of forcing periodic rewrite
  * jobs.
  *
  * Two built-in shapes, chosen by delivery-delay contract:
  *   - [[exactOnceWithinWatermark]] — Spark's
  *     dropDuplicatesWithinWatermark: duplicates arrive within the
  *     watermark delay of the first copy; state per key is dropped once
  *     the watermark passes, so state size is O(keys per watermark
  *     window), independent of stream length. This is the 100 TB-safe
  *     default.
  *   - [[exactOnceUnbounded]] — plain dropDuplicates on the key:
  *     duplicates may arrive arbitrarily late, state grows with
  *     distinct keys forever. Correct, but only viable when the key
  *     space is bounded (e.g. one day's re-crawl); kept to document the
  *     trade-off explicitly.
  */
object DedupStream {
  /** Event-time-bounded exact-once: `tsCol` must be an event-time
    * column; duplicates later than `delay` after the first copy may
    * pass through (they are then caught by the batch dedup layer). */
  def exactOnceWithinWatermark(events: DataFrame, tsCol: String,
                               delay: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Unbounded-state exact-once (see class doc for when NOT to use). */
  def exactOnceUnbounded(events: DataFrame, keys: Seq[String]): DataFrame =
    events.dropDuplicates(keys)
}
