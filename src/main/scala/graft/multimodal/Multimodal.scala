package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-reference; SURVEY.md §7.6).
  *
  * Media assets are opaque `binary` payloads plus a typed metadata
  * struct. The IMAGE decode path is real: [[decodeImages]] runs
  * `javax.imageio` (pure JDK — PNG/BMP/GIF/JPEG readers ship with the
  * JVM, no external jar) inside a mapPartitions batch, emitting
  * width/height/per-channel pixel sums from actual decoded pixels;
  * bytes no installed reader accepts degrade to a labeled `err` row
  * carrying the deterministic byte-level fallback stats. The
  * mapPartitions contract (iterator-of-rows per partition, no driver
  * involvement, arbitrary native calls allowed) is exactly what a
  * JNI/FFmpeg/libvips integration needs at scale — audio/video
  * decoders would slot into the same shape ([[frameSampleStub]] keeps
  * that 1→N contract pinned with a deterministic stand-in, as those
  * codecs are NOT in the JDK).
  */
object Multimodal {
  /** ImageIO's default stream cache spills every read/write through a
    * temp FILE on executor disk — per-image I/O in the hot path, with
    * identical output without it. `setUseCache` is a JVM-global
    * static, so flip it exactly once per executor JVM (lazy val =
    * synchronized once-only init) instead of from per-row code. */
  private lazy val imageIoInMemory: Unit =
    javax.imageio.ImageIO.setUseCache(false)

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

  /** One decoded-image row: real pixel statistics when a JDK reader
    * decoded the payload, a labeled error + deterministic byte-level
    * fallback (rolling checksum, the old stub's formula) when none
    * did. Pixel sums are per-channel over sRGB values — the cheap
    * whole-image statistic a curation pipeline filters on (black
    * frames, blown-out scans) before any model runs. */
  final case class DecodedImage(
    asset_id: Long, width: Option[Int], height: Option[Int],
    sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long],
    err: Option[String], fallback_checksum: Option[Long])

  /** Deterministic synthetic PNG: a real codec round-trip fixture.
    * Pixel (x, y) carries channels from a closed-form formula of
    * (x, y, id), so the DECODED sums are replayable in SQL while the
    * bytes themselves went through the actual PNG encoder — the
    * decode below exercises a genuine codec, not a fake. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 7 + y * 13 + id) % 256).toInt
        val g = ((x * 3 + y * 11 + 2 * id) % 256).toInt
        val b = ((x * 5 + y + 3 * id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    imageIoInMemory
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Asset table mixing REAL PNG payloads (synthetic formula images,
    * sized by doc_id) with undecodable text payloads (every 10th doc)
    * — the mixed-modality batch a real ingest sees. */
  def pngAssets(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, text, src) =>
        if (id % 10 == 0)
          (id, text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
           "text", src)
        else
          (id, syntheticPng(id, (4 + id % 5).toInt, (3 + id % 4).toInt),
           "image/png", src)
      })
      .toDF("asset_id", "payload", "kind", "source")
      .select(col("asset_id"), col("payload"),
        struct(col("kind"),
               octet_length(col("payload")).cast("long").as("byte_len"),
               col("source")).as("meta"))
  }

  /** REAL image decode via `javax.imageio` (pure JDK, executor-side,
    * zero driver involvement): each payload is offered to the
    * installed readers; a decodable image yields exact width/height
    * and per-channel sRGB pixel sums, anything else yields a labeled
    * `err` row with the deterministic byte-level fallback. Batch
    * shape: mapPartitions — one reader loop per partition iterator,
    * the same contract a native decoder integration uses. PNG is
    * lossless RGB, so sums over a codec round-trip equal the source
    * formula's — which is what lets q_multimodal_decode hash-match a
    * SQL oracle while exercising the real codec. */
  def decodeImages(assets: DataFrame): Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        imageIoInMemory // once per task, not per row
        it.map { case (id, payload) =>
        def fallback(reason: String): DecodedImage = {
          var checksum = 0L
          var i = 0
          while (i < payload.length) {
            checksum = checksum * 31 + (payload(i) & 0xff)
            i += 1
          }
          DecodedImage(id, None, None, None, None, None,
                       Some(reason), Some(checksum))
        }
        // NULL payload checked up front: ByteArrayInputStream(null)
        // throws NPE, and the catch's fallback() would then NPE a
        // second time on payload.length OUTSIDE any try — failing the
        // task instead of degrading to the contractual err row
        if (payload == null)
          DecodedImage(id, None, None, None, None, None,
                       Some("null_payload"), Some(0L))
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          if (img == null) fallback("not_decodable")
          else {
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            DecodedImage(id, Some(img.getWidth), Some(img.getHeight),
                         Some(sr), Some(sg), Some(sb), None, None)
          }
        } catch {
          case e: Exception =>
            fallback(s"decode_error:${e.getClass.getSimpleName}")
        }
        }
      }
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
    // fail at the call: everyNth=0 would throw Range's "step cannot
    // be 0" executor-side, and a NEGATIVE step would silently emit no
    // frames for any asset
    require(everyNth > 0, s"everyNth must be > 0, got $everyNth")
    require(frameBytes > 0, s"frameBytes must be > 0, got $frameBytes")
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
    require(factor > 0, s"factor must be > 0, got $factor") // /0 otherwise
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
