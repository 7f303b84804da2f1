package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._

import org.apache.spark.sql.Row

/** Structured Streaming ingest (beyond-reference; SURVEY.md §2.9/§7.6).
  *
  * The reference models "near real-time" as scheduled batch + MERGE
  * (Step Functions → Glue, stepfunctions/delta-lake.json:5-18). The
  * streaming-native equivalent: readStream over the landing directory →
  * watermarked hourly aggregation (late data bounded at 2h) →
  * foreachBatch upsert into the serving table, which keeps the
  * reference's idempotent at-least-once contract (Upsert is a pure
  * update-wins merge keyed on the window).
  *
  * State design for scale: the only stateful operator is the windowed
  * aggregation; the watermark bounds state to (2h + window) per key
  * group, so state size is O(active windows × event types), independent
  * of stream length.
  */
object EventsPipeline {
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked hourly rollup of a (possibly streaming) events frame.
    * Works identically on a batch frame — the batch twin is
    * q_events_hourly.
    *
    * Degenerate keys are normalized, not passed through: a null/empty
    * event_type would flow into the serving table as a group key, and
    * the maintained sinks' serving/summary tables are PARTITIONED by
    * event_type, whose partition-scoped upsert rejects null/empty
    * partition values — the failed microbatch would then replay from
    * the checkpoint forever (a poison pill that halts the stream).
    * Such rows land in a sentinel group instead: counted, never
    * dropped, never wedging. Rows with a null event TIME have no
    * window to roll into (and a watermarked stream would drop them
    * anyway) — filtered, keeping batch and streaming twins identical. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .withColumn("event_type",
        coalesce(nullif(col("event_type"), lit("")), lit("__unknown__")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** File-source stream over a landing dir of parquet events. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventSchema).parquet(dir)

  /** AvailableNow snapshots source offsets at START and terminates —
    * right for scheduled drain-the-backlog runs (and the spec
    * harness), wrong for a live feed: events arriving after start
    * would silently never process and the serving table would go
    * stale with no error. Every sink below takes `availableNow` so a
    * live deployment can run continuous (the default micro-batch
    * trigger), same as [[CorpusIngestStream.curateSink]]. */
  private def trig(availableNow: Boolean): Trigger =
    if (availableNow) Trigger.AvailableNow()
    else Trigger.ProcessingTime(0L)

  /** writeStream with a foreachBatch update-wins upsert into
    * `targetPath` (parquet), keyed on (window_start, event_type) —
    * the streaming MERGE the reference approximates with Glue batch.
    * The sink IS the lakehouse table op: [[LakehouseTable.upsert]]'s
    * tombstone swap means readers never observe a no-table window (the
    * earlier hand-rolled delete-then-rename here had exactly that gap)
    * and the write parallelism follows the data instead of coalesce(1). */
  def upsertSink(rollup: DataFrame, targetPath: String,
                 checkpoint: String,
                 availableNow: Boolean = true): DataStreamWriter[Row] =
    rollup.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(trig(availableNow))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.tables.LakehouseTable(batch.sparkSession, targetPath,
            Seq("window_start", "event_type"))
          .upsert(batch)
      }

  /** [[upsertSink]] plus streaming MV maintenance: after each
    * microbatch's upsert, the registered event-type-grain summary of
    * the serving table is refreshed for exactly the event types the
    * batch touched and re-registered — the streaming twin of EtlMain's
    * register-after-rebuild. Sequence per batch:
    *   1. upsert (whose mutator hook auto-invalidates the registration
    *      — a mid-batch covered query falls back to the source scan,
    *      fresh and bit-correct, never a stale summary);
    *   2. [[graft.plans.MaterializedAgg.refresh]] scoped to the
    *      batch's distinct event types — a bounded-domain collect
    *      (event types, not windows) — which re-registers.
    * BOTH tables are partitioned by `event_type`: the summary because
    * refresh's partition-swap contract requires it, and the SERVING
    * table so refresh's source slice is a partition-pruned read of the
    * touched event types' dirs — unpartitioned, that slice would be a
    * full serving-table scan every microbatch. Per-batch refresh cost
    * is therefore O(affected source partitions) — all windows of the
    * touched event types, not just the batch's rows — plus the
    * summary's partition swap. Covered aggregates over the SERVING
    * table — totals per event type across all windows — then read the
    * summary: KBs instead of the window-grain table. */
  def maintainedUpsertSink(rollup: DataFrame, targetPath: String,
                           summaryPath: String,
                           checkpoint: String,
                           availableNow: Boolean = true): DataStreamWriter[Row] =
    rollup.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(trig(availableNow))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val serving = graft.tables.LakehouseTable(spark, targetPath,
          Seq("window_start", "event_type"), Seq("event_type"))
        serving.upsert(batch)
        val touched = batch.select("event_type").distinct()
          .collect().map(_.getString(0)).toSeq
        val summary = graft.tables.LakehouseTable(spark, summaryPath,
          Seq("event_type"), Seq("event_type"))
        graft.plans.MaterializedAgg.refresh(serving, summary,
          Seq("event_type"), Seq("n_events", "total_value"), touched)
      }

  /** [[maintainedUpsertSink]]'s JOIN-summary twin: the maintained
    * aggregate joins the serving table to a DIMENSION (event-type
    * metadata at `dimPath`, keyed `event_type` = `etype`) before
    * grouping — the streaming version of a gold star rollup. Each
    * microbatch upserts the serving table, then
    * [[graft.plans.MaterializedAgg.refreshJoin]] rebuilds ONLY the
    * touched event types' summary partitions (pruned serving slice ⋈
    * broadcast-size dim) and re-registers, so covered join-aggregates
    * keep reading KBs. Same crash-window contract as the plain sink:
    * upsert's auto-invalidation means a died-before-refresh batch
    * leaves covered queries on the (fresh, correct) source join until
    * the next refresh. The dim is the caller's to keep immutable
    * during the stream — a dim change invalidates every summary row
    * regardless of partition, so it requires a full rebuild, which
    * refreshJoin cannot (and refuses to) express incrementally. */
  def maintainedJoinSink(rollup: DataFrame, targetPath: String,
                         dimPath: String, summaryPath: String,
                         checkpoint: String,
                         availableNow: Boolean = true): DataStreamWriter[Row] =
    rollup.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(trig(availableNow))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val serving = graft.tables.LakehouseTable(spark, targetPath,
          Seq("window_start", "event_type"), Seq("event_type"))
        serving.upsert(batch)
        val touched = batch.select("event_type").distinct()
          .collect().map(_.getString(0)).toSeq
        val summary = graft.tables.LakehouseTable(spark, summaryPath,
          Seq("event_type"), Seq("event_type"))
        graft.plans.MaterializedAgg.refreshJoin(serving, dimPath,
          "event_type", "etype", summary,
          Seq("event_type", "category"), Seq("n_events", "total_value"),
          touched)
      }
}
