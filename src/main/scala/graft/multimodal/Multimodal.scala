package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-reference; SURVEY.md §7.6).
  *
  * Media assets are opaque `binary` payloads plus a typed metadata
  * struct; everything Spark-side (schema, partitioning, batch shape)
  * is real, while the actual media decode is STUBBED behind
  * [[DecodedFeatures]] with a deterministic fake — the image/audio
  * libraries are not in this container. Swapping in a real decoder
  * means replacing only `decodeStub`'s body; the mapPartitions batch
  * contract (iterator-of-rows per partition, no driver involvement,
  * arbitrary native calls allowed) is exactly what a JNI/FFmpeg/libvips
  * integration needs at scale.
  */
object Multimodal {
  val MetaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("byte_len", LongType),
    StructField("source", StringType)))

  /** Wrap a text table as a multimodal asset table: payload = utf-8
    * bytes, metadata struct alongside. Real pipelines ingest the bytes
    * from object storage the same way (binaryFile source). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text").as("kind"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
        col("source").as("source")).as("meta"))

  final case class DecodedFeatures(
    asset_id: Long, kind: String, byte_len: Long,
    checksum: Long, feature: Array[Float])

  /** STUB decoder: stands in for image/audio decode + feature
    * extraction. Deterministic fake: rolling-polynomial checksum over
    * the payload and an 8-dim byte-histogram "embedding". Batch shape
    * (mapPartitions over serialized rows) mirrors a real native-decoder
    * integration. */
  def decodeStub(assets: DataFrame): Dataset[DecodedFeatures] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload", "meta.kind", "meta.byte_len")
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions(_.map { case (id, payload, kind, len) =>
        var checksum = 0L
        val hist = new Array[Float](8)
        var i = 0
        while (i < payload.length) {
          checksum = checksum * 31 + (payload(i) & 0xff)
          hist((payload(i) & 0xff) % 8) += 1f
          i += 1
        }
        DecodedFeatures(id, kind, len, checksum, hist)
      })
  }

  final case class Frame(
    asset_id: Long, frame_idx: Int, pts_ms: Long, frame_bytes: Array[Byte])

  /** STUB frame sampler: the 1→N shape of video processing — each
    * asset explodes into every `everyNth`-th fixed-size "frame" of its
    * payload (a real decoder would emit decoded keyframes; 40 ms/frame
    * ≈ 25 fps presentation timestamps). flatMap-over-partitions is the
    * contract a demuxer integration needs: per-asset fan-out decided
    * executor-side, no driver round-trip, output row count unknown at
    * plan time. Trailing bytes after the last whole frame are dropped
    * (payloads shorter than one frame yield a single short frame). */
  def frameSampleStub(assets: DataFrame, everyNth: Int = 2,
                      frameBytes: Int = 256): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nFrames = math.max(1, payload.length / frameBytes)
        (0 until nFrames by everyNth).iterator.map { f =>
          val start = f * frameBytes
          val end = math.min(payload.length, start + frameBytes)
          Frame(id, f, f * 40L,
                java.util.Arrays.copyOfRange(payload, start, end))
        }
      }
  }

  /** STUB resizer: the 1→1 payload-transform shape of image
    * processing — deterministically subsamples every `factor`-th byte
    * (a real implementation calls libvips/ImageIO here) and rewrites
    * the metadata struct for the new byte length. */
  def resizeStub(assets: DataFrame, factor: Int = 4): DataFrame = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload", "meta.kind", "meta.source")
      .as[(Long, Array[Byte], String, String)]
      .mapPartitions(_.map { case (id, p, kind, src) =>
        // empty payload → empty output (math.max(1, …) here would index
        // p(0) on a zero-length array); sub-factor payloads keep byte 0
        val n = if (p.isEmpty) 0 else math.max(1, p.length / factor)
        val out = Array.tabulate(n)(i => p(i * factor))
        (id, out, kind, src)
      })
      .toDF("asset_id", "payload", "kind", "source")
      .select(col("asset_id"), col("payload"),
        struct(col("kind"),
               octet_length(col("payload")).cast("long").as("byte_len"),
               col("source")).as("meta"))
  }
}
