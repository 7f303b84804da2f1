package graft.streaming

import graft.similarity.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming approximate-nearest-neighbor lookup (beyond-reference):
  * each microbatch of incoming embeddings is answered against a STATIC
  * prepared corpus with the same sign-bit-LSH buckets + exact-cosine
  * rerank as the batch [[Similarity.lshTopK]] — per microbatch the
  * plan is identical to the batch one, so batch/stream parity is by
  * construction, and there is NO streaming state: hyperplanes are
  * hash-derived (no model to distribute), buckets are computed by a
  * stateless codegen'd expression on the stream side, and the corpus
  * side is a static DataFrame the planner treats as a stream-static
  * join input.
  *
  * The per-query top-k needs a rank over each query's candidates,
  * which append-mode streaming cannot express directly — foreachBatch
  * runs the finished batch operator per microbatch instead (the same
  * pattern as [[CorpusIngestStream.curateSink]]), handing each result
  * to `sink` (write to a table, upsert, alert...).
  */
object AnnStream {
  /** `stream` needs (`idCol`, `vecCol` array<float>); `corpus` is a
    * [[Similarity.prepare]]d static frame.
    *
    * CONTRACT: lshTopK broadcasts the query side, so each MICROBATCH
    * must stay broadcast-small (the same precondition as the batch
    * operator) — bound it with the source's rate limit
    * (maxOffsetsPerTrigger / maxFilesPerTrigger) when draining a
    * backlog. The corpus bucket table is computed ONCE here and
    * persisted together with the prepared corpus; without that, every
    * microbatch would re-scan and re-hash the full static corpus just
    * to answer a handful of queries. */
  def lshTopKSink(stream: DataFrame, corpus: DataFrame,
                  idCol: String, vecCol: String,
                  k: Int, nbits: Int, bands: Int, checkpoint: String,
                  sink: DataFrame => Unit,
                  excludeSelf: Boolean = false): StreamingQuery = {
    val corpusP = corpus
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = Similarity.lshBuckets(corpusP, nbits, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val queries = Similarity.prepare(batch, idCol, vecCol)
        // excludeSelf defaults FALSE here, opposite of the batch
        // operator: stream queries and the static corpus live in
        // UNRELATED id spaces, so the self-search id filter would
        // silently censor a true nearest neighbor whenever a stream id
        // happens to collide with a corpus id. Pass true only when the
        // stream actually replays corpus rows (self-search semantics).
        sink(Similarity.lshTopKWith(queries, corpusP, buckets, k, nbits,
                                    bands, graft.functions.CrossEngine.rnd6,
                                    excludeSelf = excludeSelf))
        ()
      }
      .start()
    // The cached corpus/bucket blocks are owned by THIS query: release
    // them when it terminates, else each sink restart stacks another
    // cached copy of the same corpus for the session lifetime.
    val spark = corpus.sparkSession
    val cleanup = new java.util.concurrent.atomic.AtomicBoolean(false)
    def release(): Unit = if (cleanup.compareAndSet(false, true)) {
      corpusP.unpersist(); buckets.unpersist(); ()
    }
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == query.id) { release(); spark.streams.removeListener(this) }
    }
    spark.streams.addListener(listener)
    // A query that failed between start() and addListener never posts
    // to this listener — the isActive check closes that window.
    if (!query.isActive) { release(); spark.streams.removeListener(listener) }
    query
  }
}
