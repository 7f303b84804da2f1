package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Streaming joins (beyond-reference; completes the Structured
  * Streaming surface next to the windowed rollup, stateful
  * sessionizer, and watermark dedup).
  *
  * Two shapes with very different state profiles:
  *   - [[enrich]] — stream-static: the static dimension is re-read per
  *     micro-batch and (when small) broadcast; NO streaming state at
  *     all. The right tool for dimension lookups; at 100 TB the dim
  *     should be a broadcast-sized projection of the real table.
  *   - [[intervalJoin]] — stream-stream inner join bounded by an
  *     event-time interval: both sides are watermarked and the range
  *     condition lets Spark expire buffered rows once the watermark
  *     passes `window`, so state is O(rate × window), independent of
  *     stream length. An unbounded stream-stream equi-join without the
  *     time bound would buffer both streams forever — never ship that.
  */
object StreamJoins {
  /** Micro-batch dimension enrichment; `dim` is a static frame. */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(dim, keys)

  /** Inner join of two streams on `key`, keeping (l, r) pairs where
    * `r.tsR ∈ [l.tsL, l.tsL + window]`. Both sides must carry distinct
    * column names; `delay` is the watermark for both. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   rightKey: String, tsL: String, tsR: String,
                   window: String, delay: String): DataFrame =
    left.withWatermark(tsL, delay)
      .join(right.withWatermark(tsR, delay),
        expr(s"$key = $rightKey AND $tsR >= $tsL AND " +
             s"$tsR <= $tsL + INTERVAL $window"))

  /** LEFT OUTER variant of [[intervalJoin]]: matched pairs emit as the
    * inner join does; an UNMATCHED left row emits with null right
    * columns only once the watermark passes the end of its match
    * interval — before that, a matching right row could still arrive,
    * so outer results are inherently watermark-delayed (the documented
    * Structured Streaming contract, not a bug). State stays
    * O(rate × window) exactly like the inner form: the time bound is
    * what lets both sides' buffers expire. The join shape for "orders
    * that never got a payment within the hour" alerting. */
  def leftOuterIntervalJoin(left: DataFrame, right: DataFrame, key: String,
                            rightKey: String, tsL: String, tsR: String,
                            window: String, delay: String): DataFrame =
    left.withWatermark(tsL, delay)
      .join(right.withWatermark(tsR, delay),
        expr(s"$key = $rightKey AND $tsR >= $tsL AND " +
             s"$tsR <= $tsL + INTERVAL $window"),
        "leftOuter")
}
