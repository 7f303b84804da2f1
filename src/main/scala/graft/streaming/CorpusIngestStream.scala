package graft.streaming

import graft.text.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingest (beyond-reference): the stream-side front
  * door of the batch curation funnel ([[graft.etl.CorpusPipeline]]).
  *
  * Per microbatch the stage
  *   1. gates on the same per-row quality rules as the batch pipeline's
  *      stage 1 (pure codegen'd projections — stateless, streaming-safe),
  *   2. fingerprints the normalized text, and
  *   3. drops re-deliveries via watermark-bounded dedup state keyed on
  *      the fingerprint — state is O(docs per watermark window),
  *      independent of stream length, the 100 TB-safe shape.
  *
  * Near-dup LSH, cluster election, and stratified sampling stay batch
  * jobs BY DESIGN: they need corpus-global joins; the stream's job is
  * to land clean, exact-deduped rows for them to consume. Late
  * duplicates beyond the watermark pass through and are caught by the
  * batch exact-dedup layer — the same at-least-once handoff contract
  * the reference's scheduled MERGE provides.
  */
object CorpusIngestStream {
  /** `docs` needs (doc_id, text, `tsCol`); emits gated rows + their
    * `fp` fingerprint and `n_words`. The gate applies BOTH batch
    * stage-1 rules — min words and max punctuation ratio (over text
    * length) — so the stream never admits a row the batch funnel's
    * quality stage would reject. */
  def ingest(docs: DataFrame, tsCol: String = "ts", delay: String = "1 hour",
             minWords: Int = 30, maxPunctRatio: Double = 0.2): DataFrame = {
    // metrics come from the SHARED stage-1 definition
    // (CorpusPipeline.textMetrics) so this front door cannot drift
    // from the batch funnel again — it once counted capitals as
    // punctuation and dropped title-case docs the batch admits. The
    // denominator is length(text) because the raw feed carries no
    // n_chars column; for well-formed inputs they are the same value.
    val gated = graft.etl.CorpusPipeline
      .textMetrics(docs, length(col("text")))
      .filter(col("n_words") >= minWords &&
              col("punct_ratio") <= maxPunctRatio)
      .withColumn("fp", TF.fingerprint(col("text")))
      .drop("__w", "__lc")
    DedupStream.exactOnceWithinWatermark(gated, tsCol, delay, Seq("fp"))
  }

  /** foreachBatch sink closing the loop: each microbatch lands in the
    * curated table through
    * [[graft.etl.CorpusPipeline.curateIncremental]] — the stream
    * becomes an incrementally-curated corpus with cross-batch exact
    * AND near dedup. The dedup "state" is the table's own fp/sig
    * columns, not streaming state: corpus-lifetime memory with zero
    * state-store growth, and microbatch REPLAY after a crash admits
    * nothing (every fingerprint is already stored) — exactly-once
    * landing from an at-least-once stream without relying on the
    * checkpoint's dedup window.
    *
    * `docs` must carry (doc_id, text, lang, source, n_chars); pair
    * with [[ingest]] upstream when the raw feed needs the quality gate
    * and watermark dedup first. */
  def curateSink(docs: DataFrame, table: graft.tables.LakehouseTable,
                 checkpoint: String, minWords: Int = 30,
                 maxPunctRatio: Double = 0.2, maxTopBigramShare: Double = 0.1,
                 jaccardThreshold: Double = 0.9, perLangCap: Int = 1000,
                 availableNow: Boolean = false,
                 k: Int = 64, bands: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // k/bands MUST be pass-through: a curated table bootstrapped with a
    // non-default minhash size rejects mismatched-k batches
    // (CorpusPipeline's storedK check), and a sink pinned to k=64 would
    // turn that into a poison pill — the microbatch fails, the
    // checkpoint replays it, and the error's "rerun with k=<stored>"
    // advice would be impossible to follow from this API
    val w = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.CorpusPipeline.curateIncremental(
          batch, table, minWords, maxPunctRatio, maxTopBigramShare,
          jaccardThreshold, perLangCap, k, bands)
        ()
      }
    // AvailableNow snapshots offsets at START and then terminates —
    // right for scheduled drain-the-backlog runs, wrong for a live
    // feed (data arriving after start would never process)
    (if (availableNow)
       w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else w)
      .start()
  }
}
